"""Evaluation CLI — drop-in equivalent of the reference's ``evaluate.py``
(flags/defaults per evaluate.py:349-404): grid-tiled inference over the test
split, count-averaged stitching, FOV masking, per-image Dice (plus AUC,
additive per BASELINE.md) and PNG artifacts to demo/ and the output dir.

The patch grid + stitch runs entirely on device (eval/tiling.py); only the
final per-image maps come back to the host for PNG writing.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data.loading import (
    display_dataset_info,
    load_preprocessed_data,
    visualize_samples,
)
from jcfszxc_unet_tpu.eval.metrics import (
    binary_dice,
    classification_metrics,
    roc_auc,
)
from jcfszxc_unet_tpu.eval.tiling import (
    dihedral_tta,
    sliding_window_predict,
    tiled_predict,
)
from jcfszxc_unet_tpu.train import checkpoint as ckpt
from jcfszxc_unet_tpu.utils.seed import set_seed
from jcfszxc_unet_tpu.utils.vis import save_error_panel, save_grayscale, save_triptych


def eval_model(
    model,
    variables,
    output_dir: str,
    input_data: str = "./data/test_eye_dataset.h5",
    seed: int = 42,
    patch_size: int = 256,
    inference_batch_size: int = 32,
    compute_dtype=jnp.float32,
    visualize: bool = True,
    compute_auc: bool = True,
    mesh=None,
    error_panels: bool = False,
    sliding_window: bool = False,
    overlap: float = 0.5,
    num_images=None,
    image_indices=None,
    spatial: bool = False,
    full_metrics: bool = False,
    tta: bool = False,
    threshold: float = 0.5,
    threshold_sweep: bool = False,
    metrics_json: str | None = None,
):
    """Tiled evaluation; returns (mean_dice, per_image_dice, mean_auc).

    Protocol per reference eval_model (evaluate.py:164-346): grid centers at
    stride half_patch, sigmoid on raw outputs, count-averaged stitch, FOV
    mask multiply, binarize > 0.5, per-image dice, mean printed.

    ``sliding_window=True`` switches to the reference's (defined-but-unused)
    ``predict_full_image`` protocol (evaluate.py:28-96): top-left-anchored
    windows at stride patch*(1-overlap), optional image subset via
    ``num_images``/``image_indices`` — the flags the reference parses but
    never wires (evaluate.py:349-404).
    """
    set_seed(seed)
    dataset = load_preprocessed_data(input_data)
    display_dataset_info(dataset)
    if visualize:
        visualize_samples(dataset, num_samples=3)

    images_np = np.asarray(dataset["images"], np.float32)
    masks = np.asarray(dataset["masks"], np.float32)
    labels = np.asarray(dataset["labels"], np.float32)

    if sliding_window:
        if image_indices:
            sel = list(image_indices)
        elif num_images:
            sel = list(range(min(int(num_images), images_np.shape[0])))
        else:
            sel = list(range(images_np.shape[0]))
        images_np = images_np[sel]
        masks = masks[sel]
        labels = labels[sel]
        dataset = dict(dataset)
        dataset["images"] = images_np

    images = jnp.asarray(images_np)
    n_test = images.shape[0]

    def forward(batch):
        out = model.apply(variables, batch.astype(compute_dtype), train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    if tta:
        if spatial:
            raise ValueError("--tta needs square patches; it composes with "
                             "the tiled/sliding protocols, not --spatial")
        forward = dihedral_tta(forward)

    if spatial:
        # Whole-image spatially-partitioned forward (SURVEY §2.5 item 3):
        # the H axis is sharded over the mesh, GSPMD inserts the halo
        # exchanges — no patch grid, no stitching.  Every model in the
        # zoo is size-polymorphic here (incl. BCDUNet: the reference
        # pins its ctor N, BCDUNet.py:15, but our ConvLSTM2D derives all
        # spatial dims from the input — tests/test_parallel.py
        # ::test_spatial_bcdu_convlstm).
        from jcfszxc_unet_tpu.parallel.mesh import make_mesh
        from jcfszxc_unet_tpu.parallel.spatial import make_spatial_forward

        smesh = mesh if mesh is not None else make_mesh(1)
        fwd_sp = make_spatial_forward(
            model, variables, smesh, divisor=32, compute_dtype=compute_dtype)
        pred_maps = jnp.concatenate([
            fwd_sp(images[i:i + inference_batch_size])
            for i in range(0, n_test, inference_batch_size)
        ])
    elif sliding_window:
        pred_maps = jnp.stack([
            sliding_window_predict(forward, images[i], patch_size,
                                   overlap=overlap,
                                   batch_size=inference_batch_size)
            for i in range(n_test)
        ])
    else:
        pred_maps = tiled_predict(forward, images, patch_size,
                                  inference_batch_size, mesh=mesh)
    pred_maps = pred_maps * jnp.asarray(masks)  # FOV mask (evaluate.py:309)

    aucs = []
    if compute_auc:
        auc_fn = jax.jit(roc_auc)
        for i in range(n_test):
            aucs.append(float(auc_fn(pred_maps[i], jnp.asarray(labels[i]),
                                     jnp.asarray(masks[i]))))

    pred_np = np.asarray(pred_maps)
    dice_fn = jax.jit(binary_dice)
    cls_fn = jax.jit(classification_metrics)
    dice_scores = []
    cls_rows = []
    for i in range(n_test):
        pred_img = pred_np[i]
        if visualize:
            save_grayscale(pred_img, f"demo/prediction_{i}.png")
            save_grayscale(labels[i], f"demo/label_{i}.png")
            save_triptych(
                np.asarray(dataset["images"][i], np.float32),
                pred_img,
                labels[i],
                f"{output_dir}/prediction_{i}.png",
            )
            if error_panels:
                # TP/FP/FN color-coded panel (the API the reference defines
                # in visualize_predictions, evaluate.py:99-161)
                save_error_panel(
                    np.asarray(dataset["images"][i], np.float32),
                    labels[i], pred_img,
                    f"{output_dir}/errors_{i}.png",
                )
        binary = (pred_img > threshold).astype(np.float32)
        dice_scores.append(float(dice_fn(jnp.asarray(binary), jnp.asarray(labels[i]))))
        if full_metrics:
            cls_rows.append([float(v) for v in cls_fn(
                jnp.asarray(binary), jnp.asarray(labels[i]),
                jnp.asarray(masks[i]))])

    sweep_rows = None
    if threshold_sweep:
        # Diagnostic: mean Dice across binarization cuts, reusing the
        # probability maps already on the host (re-binarization is free
        # next to inference).  Motivated by the --augment A/B: a model
        # can be well-ordered (high AUC) but mis-calibrated, in which
        # case the fixed 0.5 cut under-reports it by 0.05+ Dice
        # (experiments_record.md, threshold-sweep section).  Run this on
        # a VALIDATION split and pass the winning cut as --threshold.
        labels_j = [jnp.asarray(labels[i]) for i in range(n_test)]
        print("Threshold sweep (mean Dice):")
        rows = []
        for th in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99):
            d = float(np.mean([
                float(dice_fn(jnp.asarray(
                    (pred_np[i] > th).astype(np.float32)), labels_j[i]))
                for i in range(n_test)]))
            rows.append((th, d))
        best_th, best_d = max(rows, key=lambda r: r[1])
        for th, d in rows:
            mark = "  <- best" if th == best_th else ""
            print(f"  threshold {th:.2f}: Dice {d:.4f}{mark}")
        sweep_rows = {"rows": rows, "best_threshold": best_th,
                      "best_dice": best_d}

    mean_dice = float(np.mean(dice_scores)) if dice_scores else 0.0
    print(f"Average Dice Score: {mean_dice:.4f}")
    if aucs:
        print(f"Average AUC: {float(np.mean(aucs)):.4f}")
    if cls_rows:
        acc, se, sp = np.mean(np.asarray(cls_rows), axis=0)
        print(f"Average Accuracy: {acc:.4f}")
        print(f"Average Sensitivity: {se:.4f}")
        print(f"Average Specificity: {sp:.4f}")
    if metrics_json:
        # machine-readable mirror of the stdout metrics (additive; the
        # evaluate-side companion of train.py --metrics-file)
        import json as _json

        rec = {
            "mean_dice": mean_dice,
            "per_image_dice": [float(d) for d in dice_scores],
            "threshold": threshold,
            "n_images": int(n_test),
        }
        if aucs:
            rec["mean_auc"] = float(np.mean(aucs))
            rec["per_image_auc"] = [float(a) for a in aucs]
        if cls_rows:
            rec["accuracy"], rec["sensitivity"], rec["specificity"] = (
                float(v) for v in np.mean(np.asarray(cls_rows), axis=0))
        if sweep_rows is not None:
            rec["threshold_sweep"] = sweep_rows
        with open(metrics_json, "w") as f:
            f.write(_json.dumps(rec) + "\n")
    return mean_dice, dice_scores, (float(np.mean(aucs)) if aucs else None)


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Predict on full images using the trained model"
    )
    parser.add_argument("--model", "-m", type=str, default="best_model.ckpt",
                        help="Path to the model checkpoint")
    parser.add_argument("--data-file", "-d", type=str,
                        default="./data/test_eye_dataset.h5",
                        help="Path to the h5 dataset")
    parser.add_argument("--output-dir", "-o", type=str, default="./predictions",
                        help="Directory to save predictions")
    parser.add_argument("--batch-size", "-b", type=int, default=4,
                        help="Batch size for prediction")
    parser.add_argument("--patch-size", "-p", type=int, default=512,
                        help="Size of patches for prediction")
    parser.add_argument("--spatial", action="store_true",
                        help="Whole-image spatially-partitioned forward over "
                             "the device mesh (no tiling/stitching; H axis "
                             "sharded, halo exchanges over ICI)")
    parser.add_argument("--s2d", action="store_true",
                        help="Run the narrow-channel full-res blocks in "
                             "space-to-depth space (exact same math; "
                             "MultiResUNet/NestedUNet/FRUNet only).  Any "
                             "checkpoint of a supporting model can opt in — "
                             "the parameter tree is unchanged")
    parser.add_argument("--sliding-window", action="store_true",
                        help="Use the sliding-window predictor "
                             "(predict_full_image protocol) driven by "
                             "--overlap/--num-images/--image-indices")
    parser.add_argument("--overlap", type=float, default=0.5,
                        help="Overlap between patches (0-1; sliding-window "
                             "predictor only)")
    parser.add_argument("--num-images", "-n", type=int, default=5,
                        help="Number of images to process (sliding-window "
                             "predictor only)")
    parser.add_argument("--image-indices", "-i", type=str, default=None,
                        help="Comma-separated image indices (sliding-window "
                             "predictor only)")
    parser.add_argument("--inference-batch-size", type=int, default=32,
                        help="Batch size for inference")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"], help="Compute dtype")
    parser.add_argument("--devices", type=int, default=0,
                        help="Shard the tile axis over this many devices "
                             "(0 = all)")
    parser.add_argument("--error-panels", action="store_true",
                        help="Also write TP/FP/FN color-coded panels")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="Binarization threshold for Dice and "
                             "--full-metrics (reference uses 0.5)")
    parser.add_argument("--tta", action="store_true",
                        help="Dihedral-8 test-time augmentation: average "
                             "probabilities over all flips/rotations of "
                             "each patch (8x compute; tiled/sliding only)")
    parser.add_argument("--full-metrics", action="store_true",
                        help="Also report FOV accuracy/sensitivity/"
                             "specificity (DRIVE-literature companions "
                             "to Dice/AUC)")
    parser.add_argument("--metrics-json", type=str, default=None,
                        help="Write the final metrics (mean + per-image "
                             "Dice/AUC, --full-metrics companions) as one "
                             "JSON object to this path")
    parser.add_argument("--threshold-sweep", action="store_true",
                        help="Also print mean Dice across binarization "
                             "cuts (0.3-0.99) from the same probability "
                             "maps — run on a validation split to pick "
                             "--threshold for mis-calibrated models "
                             "(e.g. trained with --augment)")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    if args.spatial and args.sliding_window:
        raise SystemExit(
            "--spatial and --sliding-window select different evaluation "
            "protocols; pass at most one")
    if args.spatial and args.tta:
        raise SystemExit(
            "--tta needs square patches; combine it with the tiled or "
            "--sliding-window protocols, not --spatial")
    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs("demo", exist_ok=True)
    logging.info(f"Using devices: {jax.devices()}")

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    logging.info(f"Loading model from {args.model}")
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # Accepts framework checkpoints AND reference whole-module .pth files
    # (evaluate.py:421's torch.load contract).
    model, variables, config = ckpt.load_model_any(
        args.model, dtype=compute_dtype, patch_size=args.patch_size)
    if args.s2d and not getattr(model, "s2d", False):
        # Execution mode, not architecture: the parameter tree is
        # identical, so any checkpoint of a supporting model can opt in
        # at eval time (checkpoints trained with --s2d already carry it).
        from jcfszxc_unet_tpu.models import create_model, s2d_capable

        if config["model_name"] not in s2d_capable():
            raise SystemExit(
                f"--s2d is not supported by {config['model_name']}; "
                "supported: " + ", ".join(s2d_capable()))
        # .pth-loaded kwargs may already carry 'dtype'; dtype is passed
        # explicitly, so strip it from the spread
        kw = {k: v for k, v in config["model_kwargs"].items()
              if k != "dtype"}
        model = create_model(config["model_name"], dtype=compute_dtype,
                             **{**kw, "s2d": True})
    from jcfszxc_unet_tpu.parallel.mesh import make_mesh

    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    eval_model(
        model=model,
        variables=variables,
        input_data=args.data_file,
        inference_batch_size=args.inference_batch_size,
        output_dir=args.output_dir,
        patch_size=args.patch_size,
        compute_dtype=compute_dtype,
        mesh=mesh,
        error_panels=args.error_panels,
        sliding_window=args.sliding_window,
        overlap=args.overlap,
        num_images=args.num_images if args.sliding_window else None,
        image_indices=(
            [int(s) for s in args.image_indices.split(",")]
            if (args.sliding_window and args.image_indices) else None),
        spatial=args.spatial,
        full_metrics=args.full_metrics,
        tta=args.tta,
        threshold=args.threshold,
        threshold_sweep=args.threshold_sweep,
        metrics_json=args.metrics_json,
    )


if __name__ == "__main__":
    main()
