"""Training CLI — drop-in equivalent of the reference's ``train.py``
(flags and defaults per train.py:419-487), plus a ``--model`` flag backed by
the registry instead of the reference's edit-the-source model selection
(train.py:505-523), and TPU-specific extras (--dtype, --devices,
--profile-dir).

Host/device split per epoch: ONE jitted program runs all ``steps`` training
steps (sampling included), one jitted program runs validation; the host only
does scheduling, early stopping, checkpointing and PNG artifacts.
"""

from __future__ import annotations

import argparse
import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data.loading import (
    display_dataset_info,
    load_preprocessed_data,
    visualize_samples,
)
from jcfszxc_unet_tpu.data.sampler import build_grid_sample_map, build_train_sample_map
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.parallel.mesh import make_mesh, put_replicated
from jcfszxc_unet_tpu.train import checkpoint as ckpt
from jcfszxc_unet_tpu.train.optim import (
    ReduceLROnPlateau,
    get_current_lr,
    make_optimizer,
    set_current_lr,
)
from jcfszxc_unet_tpu.train.state import create_train_state
from jcfszxc_unet_tpu.train.trainer import (
    build_val_patches,
    make_epoch_fn,
    make_precise_bn_fn,
    make_val_fn,
)
from jcfszxc_unet_tpu.utils.profiling import Throughput
from jcfszxc_unet_tpu.utils.seed import set_seed
from jcfszxc_unet_tpu.utils.vis import save_triptych


def bn_saturation_signature(dice_history, mean_prob=None,
                            peak=0.3, floor=0.05):
    """True when the val-dice trajectory just entered the eval-logit
    saturation signature: the current epoch's dice collapsed to ~0 after
    some earlier epoch exceeded ``peak``.

    This is the 0.76<->0.0 flapping measured on SegNet/MultiResUNet at
    production learning rates (experiments_record.md round 3): train-mode
    learning is fine, but the BN *running* statistics lag the activation
    drift, so the eval-mode forward saturates to one class (mean sigmoid
    output pinned near 0 or 1) — reproduced with the reference's own torch
    modules (scripts/torch_bn_lag.py).  ``mean_prob`` (the val set's mean
    sigmoid output), when given, confirms the mechanism and is included in
    the hint the caller logs.  Fires on the collapse TRANSITION only
    (current epoch <= floor, previous epoch above), so the warning does
    not repeat every flat epoch.
    """
    if len(dice_history) < 2 or dice_history[-1] > floor:
        return False
    if not all(math.isfinite(d) for d in dice_history):
        return False  # NaN dices are the NaN-guard's domain, not BN lag
    if dice_history[-2] <= floor:
        return False  # already collapsed — warned at the transition
    if max(dice_history[:-1]) < peak:
        return False  # never learned: not the saturation signature
    if mean_prob is not None and 0.05 < mean_prob < 0.95:
        return False  # eval outputs are not saturated — different failure
    return True


def train_model(
    model,
    model_name: str,
    model_kwargs: dict,
    input_data: str = "./data/train_eye_dataset.h5",
    steps: int = 100,
    batch_size: int = 32,
    learning_rate: float = 1e-6,
    val_percent: float = 0.1,
    patch_size: int = 128,
    weight_decay: float = 1e-8,
    momentum: float = 0.999,
    seed: int = 42,
    early_stopping_patience: int = 20,
    save_path: str = "best_model.ckpt",
    compute_dtype=jnp.bfloat16,
    mesh=None,
    max_epochs: int | None = None,
    visualize: bool = True,
    profile_dir: str | None = None,
    init_variables=None,
    remat: bool = False,
    latest_path: str | None = None,
    resume_from: str | None = None,
    async_checkpoints: bool = True,
    precise_bn: int = 0,
    augment: bool = False,
    metrics_file: str | None = None,
):
    """Run the reference training protocol end-to-end; returns best dice.

    Mirrors train.py:47-416: shuffled val split, vessel-guided random
    128^2 patches, ½BCE+½Dice, RMSprop+plateau schedule, early stopping on
    val dice, best-checkpoint-on-improvement.
    """
    key = set_seed(seed)
    dataset = load_preprocessed_data(input_data)
    display_dataset_info(dataset)
    if visualize:
        visualize_samples(dataset, num_samples=3)

    n_samples = len(dataset["images"])
    n_val = int(n_samples * val_percent)
    indices = np.arange(n_samples)
    np.random.shuffle(indices)  # same host-RNG protocol as train.py:79
    val_idx, train_idx = indices[:n_val], indices[n_val:]

    images = np.asarray(dataset["images"], np.float32)
    masks = np.asarray(dataset["masks"], np.float32)
    labels = np.asarray(dataset["labels"], np.float32)[..., None]

    half_patch = patch_size // 2
    train_map = build_train_sample_map(masks[train_idx], half_patch)
    n, h, w = masks[val_idx].shape if n_val else (0, *masks.shape[1:])
    val_map = build_grid_sample_map(n, h, w, half_patch)

    logging.info(
        f"Starting training:\n"
        f"  Batch size:      {batch_size}\n"
        f"  Learning rate:   {learning_rate}\n"
        f"  Training size:   {len(train_idx)}\n"
        f"  Validation size: {n_val}\n"
        f"  Patch size:      {patch_size}\n"
        f"  Steps/epoch:     {steps}\n"
        f"  Devices:         {1 if mesh is None else mesh.size}\n"
        f"  Compute dtype:   {jnp.dtype(compute_dtype).name}"
    )

    # HBM-resident pools (replicated across the mesh; batches get sharded).
    train_images = put_replicated(jnp.asarray(images[train_idx]), mesh)
    train_labels = put_replicated(jnp.asarray(labels[train_idx]), mesh)
    train_map_dev = put_replicated(jnp.asarray(train_map), mesh)
    val_imgs, val_labs = build_val_patches(
        images[val_idx], labels[val_idx], val_map, patch_size
    )
    val_imgs = put_replicated(val_imgs, mesh)
    val_labs = put_replicated(val_labs, mesh)

    n_classes = model.n_classes
    tx = make_optimizer(learning_rate, weight_decay, momentum)
    state = create_train_state(
        model, tx, key, jnp.zeros((1, patch_size, patch_size, images.shape[-1]),
                                  compute_dtype),
    )
    if init_variables is not None:  # --load resume path
        state = state.replace(
            params=jax.tree.map(jnp.asarray, init_variables["params"]),
            batch_stats=jax.tree.map(
                jnp.asarray, init_variables.get("batch_stats", {})
            ),
        )
    state = state.replace(
        params=put_replicated(state.params, mesh),
        batch_stats=put_replicated(state.batch_stats, mesh),
        opt_state=put_replicated(state.opt_state, mesh),
    )

    epoch_fn = make_epoch_fn(
        model, tx, n_classes=n_classes, batch_size=batch_size,
        patch_size=patch_size, steps=steps, compute_dtype=compute_dtype,
        mesh=mesh, remat=remat, augment=augment,
    )
    val_fn = make_val_fn(model, patch_size=patch_size,
                         compute_dtype=compute_dtype, mesh=mesh)
    precise_bn_fn = make_precise_bn_fn(
        model, batch_size=batch_size, patch_size=patch_size,
        k_batches=precise_bn, compute_dtype=compute_dtype, mesh=mesh,
    ) if precise_bn else None
    scheduler = ReduceLROnPlateau(factor=0.7, patience=5, threshold=0.01, cooldown=2)

    best_dice = 0.0
    patience_counter = 0
    epoch = 0
    dice_history = []  # feeds the BN-saturation guardrail

    # Exact resume: restore optimizer/scheduler/progress saved by
    # --latest-path (beyond the reference's params-only --load resume,
    # which restarts the schedule, train.py:500-503).
    if resume_from:
        extra = ckpt.load_extra(resume_from)
        if extra and "opt_state" in extra:
            from flax import serialization as _ser

            state = state.replace(
                opt_state=_ser.from_state_dict(state.opt_state, extra["opt_state"])
            )
            prog = extra.get("progress", {})
            epoch = int(prog.get("epoch", 0))
            best_dice = float(prog.get("best_dice", 0.0))
            patience_counter = int(prog.get("patience_counter", 0))
            scheduler.best = float(prog.get("scheduler_best", float("-inf")))
            scheduler.num_bad_epochs = int(prog.get("scheduler_bad", 0))
            scheduler.cooldown_counter = int(prog.get("scheduler_cooldown", 0))
            logging.info(
                f"Resumed full training state from {resume_from} "
                f"(epoch {epoch}, best dice {best_dice:.4f})"
            )

    data_key = jax.random.fold_in(key, 0xDA7A)
    throughput = Throughput()  # steady-state patches/sec, compile excluded

    # Checkpoint writes (the 124 MB device→host fetch per improving epoch)
    # overlap with the next epoch's compute instead of blocking it.
    # The train step donates its state buffers, so the async path first
    # takes a one-dispatch on-device snapshot (HBM→HBM, sub-ms) — without
    # it the next epoch's donation deletes the buffers mid-fetch.  All of
    # an epoch's writes (best + --latest-path) go out as ONE submission
    # over ONE snapshot: a second submit in the same epoch would block on
    # the first write and defeat the overlap, and waiting BEFORE
    # snapshotting bounds extra HBM retention to a single state copy.
    writer = ckpt.AsyncCheckpointWriter() if async_checkpoints else None
    snapshot = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    epoch_saves = []  # (path, extra) jobs accumulated within one epoch

    def save_ckpt(path, model_name, model_kwargs, params, stats, extra=None):
        if writer is not None:
            # The queued job is written by flush_epoch_saves from a snapshot
            # of `state` taken at end of epoch — valid only because callers
            # always pass the live state's trees and nothing rebinds them
            # between queue and flush.  Guard that invariant explicitly.
            if params is not state.params or stats is not state.batch_stats:
                raise ValueError(
                    "async save_ckpt requires the live state.params/"
                    "state.batch_stats (flush re-reads state at epoch end)")
            epoch_saves.append((path, extra))
        else:
            ckpt.save_model(path, model_name, model_kwargs, params, stats,
                            extra=extra)

    def flush_epoch_saves():
        if writer is None or not epoch_saves:
            return
        jobs, epoch_saves[:] = list(epoch_saves), []
        writer.wait()  # before snapshotting: bounds HBM to one extra copy
        params, stats = snapshot((state.params, state.batch_stats))
        jobs = [
            (path,
             dict(extra, opt_state=snapshot(extra["opt_state"]))
             if extra is not None and "opt_state" in extra else extra)
            for path, extra in jobs
        ]

        def write_all(jobs=jobs, params=params, stats=stats):
            for path, extra in jobs:
                ckpt.save_model(path, model_name, model_kwargs,
                                params, stats, extra=extra)

        writer.submit(write_all)

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    try:
        while True:
            epoch += 1
            if max_epochs is not None and epoch > max_epochs:
                break
            data_key, epoch_key = jax.random.split(data_key)
            state, train_metrics = epoch_fn(
                state, train_images, train_labels, train_map_dev, epoch_key
            )
            if precise_bn_fn is not None:
                # Recalibrate BN running stats before validation/checkpoint
                # (additive --precise-bn; see make_precise_bn_fn).
                data_key, pb_key = jax.random.split(data_key)
                state = state.replace(batch_stats=precise_bn_fn(
                    state.params, state.batch_stats,
                    train_images, train_labels, train_map_dev, pb_key,
                ))
            metrics, probs = val_fn(state.params, state.batch_stats, val_imgs, val_labs)
            # single host sync point per epoch
            epoch_loss = float(train_metrics["epoch_loss"])
            skipped = int(train_metrics["skipped"])
            dice = float(metrics["dice"])
            dice_avg = float(metrics["dice_avg"])
            pps = throughput.tick(steps * batch_size)

            dice_history.append(dice)
            mean_prob = float(probs.mean()) if val_imgs.shape[0] else None
            if bn_saturation_signature(dice_history, mean_prob):
                logging.warning(
                    f"Validation Dice collapsed to {dice:.3f} after "
                    f"reaching {max(dice_history[:-1]):.3f} with the val "
                    "set's mean sigmoid output at "
                    f"{'n/a' if mean_prob is None else f'{mean_prob:.3f}'}"
                    " — the "
                    "signature of BN running-statistics lag (eval-mode "
                    "logit saturation; the train-mode forward is still "
                    "learning)."
                    + ("" if precise_bn else
                       "  Re-run with --precise-bn 8 to recalibrate the "
                       "running stats each epoch.")
                )

            lr = get_current_lr(state.opt_state)
            new_lr = scheduler.step(dice, lr)
            if new_lr != lr:
                state = state.replace(opt_state=set_current_lr(state.opt_state, new_lr))
                logging.info(f"Plateau scheduler: lr {lr:.2e} -> {new_lr:.2e}")

            if dice > best_dice:
                best_dice = dice
                patience_counter = 0
                save_ckpt(save_path, model_name, model_kwargs,
                          state.params, state.batch_stats)
            else:
                patience_counter += 1
                print(
                    f"Dice score did not improve. Patience: "
                    f"{patience_counter}/{early_stopping_patience}"
                )
                if patience_counter >= early_stopping_patience:
                    print(
                        f"Early stopping triggered after {epoch} epochs. "
                        f"Best dice score: {best_dice:.4f}"
                    )
                    break

            print(
                f"Epoch {epoch} - "
                f"LR: {new_lr:.2e} - "
                f"Loss: {epoch_loss / steps:.4g} - "
                f"Dice: {dice:.4g} - "
                f"Avg Dice: {dice_avg:.4g} - "
                f"Best Dice: {best_dice:.4g}"
                + ((f" - {pps:.1f} patches/s" if pps < 10 else
                    f" - {pps:.0f} patches/s") if pps else "")
                + (f" - skipped {skipped} NaN steps" if skipped else "")
            )

            if latest_path:
                from flax import serialization as _ser

                save_ckpt(
                    latest_path, model_name, model_kwargs,
                    state.params, state.batch_stats,
                    extra={
                        "opt_state": _ser.to_state_dict(state.opt_state),
                        "progress": {
                            "epoch": epoch,
                            "best_dice": best_dice,
                            "patience_counter": patience_counter,
                            "scheduler_best": scheduler.best,
                            "scheduler_bad": scheduler.num_bad_epochs,
                            "scheduler_cooldown": scheduler.cooldown_counter,
                        },
                    },
                )

            if metrics_file:
                # one JSON object per epoch — machine-readable mirror of
                # the stdout line for production monitoring (additive)
                import json as _json

                with open(metrics_file, "a") as f:
                    f.write(_json.dumps({
                        "epoch": epoch, "lr": new_lr,
                        "loss": epoch_loss / steps, "dice": dice,
                        "dice_avg": dice_avg, "best_dice": best_dice,
                        "patches_per_sec": pps, "skipped_steps": skipped,
                    }) + "\n")

            if visualize and val_imgs.shape[0] > 0:
                sample_num = min(100, val_imgs.shape[0] - 1)
                save_triptych(
                    np.asarray(val_imgs[sample_num], np.float32),
                    np.asarray(probs[sample_num, ..., 0]),
                    np.asarray(val_labs[sample_num, ..., 0]),
                    f"visualizations/{epoch:03d}_{sample_num:03d}.png",
                )

            flush_epoch_saves()  # one snapshot + one submission per epoch

    finally:
        if profile_dir:
            jax.profiler.stop_trace()
        if writer is not None:
            flush_epoch_saves()  # jobs queued by a breaking epoch
            writer.close()  # surfaces write errors; checkpoints on disk
    return best_dice


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a UNet-family model on DRIVE patches (TPU-native)"
    )
    parser.add_argument("--data-file", "-d", type=str,
                        default="./data/train_eye_dataset.h5",
                        help="Path to the h5 dataset")
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B",
                        type=int, default=32, help="Batch size")
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float,
                        default=1e-6, help="Learning rate", dest="lr")
    parser.add_argument("--load", "-f", type=str, default=False,
                        help="Load model from a checkpoint file")
    parser.add_argument("--validation", "-v", dest="val", type=float,
                        default=10.0,
                        help="Percent of the data used as validation (0-100)")
    parser.add_argument("--patch-size", "-p", dest="patch_size", type=int,
                        default=128, help="Size of training patches")
    parser.add_argument("--steps", "-s", type=int, default=100,
                        help="Number of steps per epoch")
    parser.add_argument("--seed", type=int, default=42, help="Random seed")
    parser.add_argument("--early-stopping-patience", "-esp",
                        dest="early_stopping_patience", type=int, default=20,
                        help="Epochs with no improvement before stopping")
    # Additions over the reference CLI:
    parser.add_argument("--model", "-m", type=str, default="UNet.UNet",
                        help="Registry model name (e.g. UNet.UNet, "
                             "BCDUNet.BCDU_net_D3)")
    parser.add_argument("--save-path", type=str, default="best_model.ckpt",
                        help="Best-checkpoint output path")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="Compute dtype (params stay float32)")
    parser.add_argument("--devices", type=int, default=0,
                        help="Data-parallel device count (0 = all)")
    parser.add_argument("--max-epochs", type=int, default=0,
                        help="Optional epoch cap (0 = until early stopping)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Write a jax.profiler trace here")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize activations in the backward pass "
                             "(larger batches/patches at extra FLOPs)")
    parser.add_argument("--metrics-file", type=str, default=None,
                        help="Append one JSON object per epoch here "
                             "(machine-readable mirror of the epoch line)")
    parser.add_argument("--augment", action="store_true",
                        help="Per-sample random flips/90-degree rotations on "
                             "training patches (on-device; additive — the "
                             "reference trains un-augmented)")
    parser.add_argument("--s2d", action="store_true",
                        help="Run the narrow-channel full-res blocks in "
                             "space-to-depth space (exact same math, 4x "
                             "better TPU lane fill; MultiResUNet/NestedUNet/"
                             "FRUNet only).  Recorded in the checkpoint so "
                             "evaluate.py reconstructs it")
    parser.add_argument("--logit-head", action="store_true",
                        help="Train through the pre-activation head of the "
                             "five reference-defect models (BARUNet/"
                             "BIARUNet/TransFuseNet/BCDU_net_D1/D3), whose "
                             "stock forward ends in a constant softmax or "
                             "a double-squashed sigmoid and therefore "
                             "cannot learn.  Additive, off by default "
                             "(= exact reference behavior); identical "
                             "parameter tree, recorded in the checkpoint "
                             "so evaluate.py reconstructs it")
    parser.add_argument("--latest-path", type=str, default=None,
                        help="Also save the FULL training state (optimizer + "
                             "scheduler + progress) here every epoch")
    parser.add_argument("--resume", type=str, default=None,
                        help="Exact-resume from a --latest-path checkpoint "
                             "(implies loading its params too)")
    parser.add_argument("--precise-bn", type=int, default=0, metavar="K",
                        help="Additive (off by default, not in the "
                             "reference): after each epoch, re-estimate BN "
                             "running statistics as the mean of pure batch "
                             "statistics over K fresh training batches. "
                             "Fixes the eval-mode logit saturation that BN "
                             "EMA lag causes on some models (SegNet, "
                             "MultiResUNet) at learning rates >> the "
                             "reference's 1e-6")
    parser.add_argument("--sync-checkpoints", action="store_true",
                        help="Block training on each checkpoint write. "
                             "Default (async) overlaps writes with the next "
                             "epoch, so a hard kill (SIGKILL/OOM) can lose "
                             "up to the last epoch's queued best/latest "
                             "writes; pass this flag for strict durability")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    logging.info(f"Using devices: {jax.devices()}")

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    if enable_persistent_compile_cache():
        logging.info("Persistent XLA compile cache enabled")

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    init_variables = None
    if args.resume and not args.load:
        args.load = args.resume  # --resume implies loading params from it
    if args.load:
        # framework checkpoint OR reference whole-module .pth (train.py:500-503)
        model, init_variables, cfg = ckpt.load_model_any(
            args.load, dtype=compute_dtype, patch_size=args.patch_size)
        model_name, model_kwargs = cfg["model_name"], cfg["model_kwargs"]
        logging.info(f"Model loaded from {args.load}")
    else:
        model_name = args.model
        model_kwargs = {}
        if model_name.startswith("BCDUNet."):
            model_kwargs["N"] = args.patch_size  # train.py:518-519 contract
        model = create_model(model_name, dtype=compute_dtype, **model_kwargs)
    if args.logit_head and not model_kwargs.get("logit_head"):
        # Like --s2d: a forward-behavior kwarg over an identical parameter
        # tree, so it composes with --load/--resume checkpoints and is
        # recorded in model_kwargs for evaluate.py.
        from jcfszxc_unet_tpu.models import logit_head_capable

        if model_name not in logit_head_capable():
            raise SystemExit(
                f"--logit-head is not supported by {model_name} (its "
                "forward already returns logits); supported: "
                + ", ".join(logit_head_capable()))
        model_kwargs["logit_head"] = True
        model = create_model(
            model_name, dtype=compute_dtype,
            **{k: v for k, v in model_kwargs.items() if k != "dtype"})
    if args.s2d and not model_kwargs.get("s2d"):
        # execution-mode kwarg, not architecture: the parameter tree is
        # identical, so it composes with --load/--resume checkpoints; it
        # is recorded in model_kwargs so evaluate.py reconstructs it.
        from jcfszxc_unet_tpu.models import s2d_capable

        if model_name not in s2d_capable():
            raise SystemExit(
                f"--s2d is not supported by {model_name}; supported: "
                + ", ".join(s2d_capable()))
        model_kwargs["s2d"] = True
        # .pth-loaded kwargs may already carry 'dtype'; dtype is passed
        # explicitly, so strip it from the spread
        model = create_model(
            model_name, dtype=compute_dtype,
            **{k: v for k, v in model_kwargs.items() if k != "dtype"})

    logging.info(
        f"Network:\n\t{model.n_channels} input channels\n"
        f"\t{model.n_classes} output channels (classes)\n"
    )
    os.makedirs("visualizations", exist_ok=True)
    train_model(
        model=model,
        model_name=model_name,
        model_kwargs=model_kwargs,
        input_data=args.data_file,
        steps=args.steps,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        val_percent=args.val / 100,
        patch_size=args.patch_size,
        seed=args.seed,
        early_stopping_patience=args.early_stopping_patience,
        save_path=args.save_path,
        compute_dtype=compute_dtype,
        mesh=mesh,
        max_epochs=args.max_epochs or None,
        profile_dir=args.profile_dir,
        init_variables=init_variables,
        remat=args.remat,
        latest_path=args.latest_path,
        resume_from=args.resume,
        async_checkpoints=not args.sync_checkpoints,
        precise_bn=args.precise_bn,
        augment=args.augment,
        metrics_file=args.metrics_file,
    )


if __name__ == "__main__":
    main()
