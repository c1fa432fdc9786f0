"""Fractal-optimization training variant — the TPU-native re-expression of
the reference's experimental ``train-demo.py`` (783 LoC): multi-scale
"fractal" patch sampling, a trainable input-enhancement CNN, and a
box-counting fractal-dimension loss.

Mechanism differences (same behavior):
  * ``fractal_sampling`` (reference train-demo.py:56-190) becomes three
    static-shape on-device gathers (one per scale level) + ``jax.image``
    resizes, jit-able inside the train step; the level candidate maps
    (mask>0.7 / top-decile gradient magnitude / mask>0.3, lines 98-108)
    are precomputed host-side once.
  * ``box_dimension`` (train-demo.py:252-315) was a per-sample numpy
    double loop forcing a device->host sync every step; here it is a
    fully vectorized jnp computation (per-box occupancy via reshape-max,
    closed-form log-log regression) that runs batched on device.

Reference quirks preserved:
  * the fractal trainer reads ``masks`` (the FOV masks) as its training
    targets — vessel ``labels`` are never loaded (train-demo.py:492,
    513-514); it literally learns to segment the field of view;
  * FractalLoss dice is the *global* formulation 1 - 2Σpt/(Σp+Σt+1e-8)
    (train-demo.py:325-327), not utils.dice_score's per-sample one;
  * validation runs on whole images, samples min(200, V) of them, and
    uses masks as ground truth (train-demo.py:562-587);
  * checkpoints: best_model (whole model) + best_fractal_model bundle
    with model/extractor/optimizer state (train-demo.py:597-604).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from jcfszxc_unet_tpu.data.sampler import extract_patches
from jcfszxc_unet_tpu.train.losses import bce_with_logits, dice_coeff
from jcfszxc_unet_tpu.ops.layers import Conv2d


# ========================= fractal feature extractor ======================


class FractalFeatureExtractor(nn.Module):
    """Input-enhancement CNN (reference train-demo.py:194-235): a 3x3->1x1
    "fractal" branch plus dilated 3x3 convs at rates 1/2/4/8, fused by a
    1x1 conv, residual to the input."""

    in_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        f = Conv2d(self.in_channels, 16, 3, padding=1, dtype=dt, name="fractal_conv1")(x)
        f = nn.relu(f)
        f = Conv2d(16, 1, 1, dtype=dt, name="fractal_conv2")(f)
        feats = []
        for scale in (1, 2, 4, 8):
            c = Conv2d(self.in_channels, 16, 3, dilation=scale, padding=scale,
                       dtype=dt, name=f"ms_conv_d{scale}")(x)
            feats.append(nn.relu(c))
        concat = jnp.concatenate(feats + [f], axis=-1)
        fused = Conv2d(16 * 4 + 1, self.in_channels, 1, dtype=dt,
                       name="fusion_conv")(concat)
        return fused + x


# ========================= box-counting fractal dimension =================


def box_dimension(mask2d: jnp.ndarray, max_scales: int = 4) -> jnp.ndarray:
    """Box-counting fractal-dimension estimate of a 2D map, vectorized.

    Reference semantics (train-demo.py:252-315): binarize at 0.5; for box
    sizes 2^1..2^max_scales count occupied boxes; fit log(count)+1e-10 vs
    log(box_size) by least squares; dimension = -slope; 0.0 for an empty
    mask.  The reference's python double loop over boxes becomes a
    pad + reshape + max reduction per scale.
    """
    binary = (mask2d > 0.5).astype(jnp.float32)
    h, w = binary.shape
    counts = []
    sizes = []
    for s in range(1, max_scales + 1):
        b = 2 ** s
        hp = -(-h // b) * b
        wp = -(-w // b) * b
        padded = jnp.pad(binary, ((0, hp - h), (0, wp - w)))
        occ = padded.reshape(hp // b, b, wp // b, b).max(axis=(1, 3))
        counts.append(jnp.sum(occ))
        sizes.append(float(b))
    log_counts = jnp.log(jnp.stack(counts) + 1e-10)
    log_sizes = jnp.log(jnp.asarray(sizes))
    n = float(max_scales)
    sx, sy = jnp.sum(log_sizes), jnp.sum(log_counts)
    sxy = jnp.sum(log_sizes * log_counts)
    sxx = jnp.sum(log_sizes * log_sizes)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    dim = -slope
    return jnp.where(jnp.sum(binary) == 0, 0.0, dim)


def fractal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    alpha: float = 0.3,
    beta: float = 0.3,
    gamma: float = 0.4,
    fractal_sample_size: int = 4,
) -> jnp.ndarray:
    """FractalLoss (reference train-demo.py:239-347, instantiated with
    alpha=0.3 beta=0.3 gamma=0.4 at line 488): alpha*BCE + beta*globalDice
    + gamma*mean |boxdim(target_i) - boxdim(pred_i)| over ``sample_size``
    randomly chosen batch elements.  NHWC (B, P, P, 1)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)

    bce = bce_with_logits(logits, target)
    dice = 1.0 - 2.0 * jnp.sum(probs * target) / (jnp.sum(probs + target) + 1e-8)

    b = logits.shape[0]
    k = min(fractal_sample_size, b)
    idx = jax.random.permutation(key, b)[:k]
    bd = jax.vmap(box_dimension)
    td = bd(jnp.squeeze(target[idx], -1))
    pd = bd(jnp.squeeze(probs[idx], -1))
    frac = jnp.mean(jnp.abs(td - pd))
    return alpha * bce + beta * dice + gamma * frac


# ========================= fractal self-supervised loss ===================


def _sobel_gradients(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel |Sobel| gradients with reflect padding (reference
    train-demo.py:371-389).  NHWC."""
    gx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    gy = jnp.asarray([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    def conv(k):
        kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    return jnp.abs(conv(gx)), jnp.abs(conv(gy))


def fractal_self_supervised_loss(pred_large, pred_small, original_image=None):
    """Self-similarity consistency + Sobel branch-structure consistency
    (reference train-demo.py:350-402; defined there but never invoked —
    provided for API completeness)."""
    consistency = jnp.mean((pred_large - pred_small) ** 2)
    lgx, lgy = _sobel_gradients(pred_large)
    sgx, sgy = _sobel_gradients(pred_small)
    branch = jnp.mean(((lgx + lgy) - (sgx + sgy)) ** 2)
    return consistency + 0.5 * branch


# ========================= fractal multi-scale sampling ===================


def build_fractal_sample_maps(masks: np.ndarray, patch_size: int,
                              fractal_levels: int = 3):
    """Precompute per-level candidate center maps + level patch sizes and
    sample counts for a given batch size split (reference
    train-demo.py:77-137).

    masks: (N, H, W).  Level selectors: 0 -> mask>0.7 (main vessels);
    1 -> top-decile |gradient| of the mask (branch points); 2+ -> mask>0.3.
    Falls back to mask>0.1 when a level has no valid in-bounds centers.
    Returns (patch_sizes, maps) where maps[i] is an int32 (K_i, 3) array.

    DELIBERATE DIVERGENCE from the *executed* reference: train-demo.py
    passes masks as (N, 1, H, W), so its ``np.where(masks_data > 0.7)``
    at levels 0 and 2 returns FOUR index arrays whose ``[1]`` is the
    all-zero channel axis — the in-bounds filter (half_patch > 0) then
    discards every candidate and those levels silently contribute nothing
    (train-demo.py:100, 108, 111-124; pinned by
    tests/test_fractal.py::TestExecutedReferenceSampling).  Only level 1
    (which ``.squeeze()``s first, line 103) ever produces patches, and the
    batch is topped up with random duplicates of them.  We implement the
    documented three-level intent with correct axes; the live level-1 path
    is pinned patch-exact against the executed reference.  The reference
    also swaps H/W in its bounds checks (sample_map[1] vs ``width``,
    line 111-116) — harmless on square inputs, another symptom of the
    same axis confusion, not reproduced.
    """
    n, h, w = masks.shape
    scale_factors = [1 / (1.5 ** i) for i in range(fractal_levels)]
    patch_sizes = [max(int(patch_size * sf), 16) for sf in scale_factors]

    grad_x = np.abs(np.gradient(masks, axis=1))
    grad_y = np.abs(np.gradient(masks, axis=2))
    grad_mag = grad_x + grad_y

    maps = []
    for level, ps in enumerate(patch_sizes):
        half = ps // 2
        if level == 0:
            cand = masks > 0.7
        elif level == 1:
            cand = grad_mag > np.percentile(grad_mag, 90)
        else:
            cand = masks > 0.3

        def in_bounds(sel):
            ii, xx, yy = np.nonzero(sel)
            ok = ((xx >= half) & (xx < h - half) & (yy >= half) & (yy < w - half))
            return np.stack([ii[ok], xx[ok], yy[ok]], -1).astype(np.int32)

        m = in_bounds(cand)
        if len(m) == 0:
            m = in_bounds(masks > 0.1)
        if len(m) == 0:  # degenerate dataset: any interior pixel
            m = in_bounds(np.ones_like(masks, bool))
        maps.append(m)
    return patch_sizes, maps


def level_sample_counts(batch_size: int, fractal_levels: int = 3):
    """Power-law split (train-demo.py:86-89): level i gets B*(1/2)^i, the
    remainder added to level 0."""
    dist = [int(batch_size * (0.5 ** i)) for i in range(fractal_levels)]
    dist[0] += batch_size - sum(dist)
    return dist


def fractal_sample_batch(
    key: jax.Array,
    images: jnp.ndarray,
    targets: jnp.ndarray,
    level_maps: Sequence[jnp.ndarray],
    patch_sizes: Sequence[int],
    counts: Sequence[int],
    out_patch: int,
):
    """Draw one fractal multi-scale batch fully on device.

    For each level: uniform random centers from its candidate map, a
    static-shape patch gather at the level's native size, then an
    align-corners linear (images) / nearest (targets) resize to
    ``out_patch`` — numerically IDENTICAL grids to the reference's
    scipy.zoom order=1/order=0 calls (train-demo.py:163-174; pinned by
    tests/test_fractal.py against the executed reference).
    """
    imgs_out, tgts_out = [], []
    keys = jax.random.split(key, len(level_maps))
    for lk, lmap, ps, cnt in zip(keys, level_maps, patch_sizes, counts):
        if cnt <= 0:
            continue
        idx = jax.random.randint(lk, (cnt,), 0, lmap.shape[0])
        centers = jnp.take(lmap, idx, axis=0)
        # The reference slices [center-half, center+half) on both axes
        # (train-demo.py:152-161), so an ODD level patch size extracts an
        # EVEN 2*(ps//2) window which is then zoomed — mirror that.
        ps = 2 * (ps // 2)
        ip = extract_patches(images, centers, ps)
        tp = extract_patches(targets, centers, ps)
        if ps != out_patch:
            from jcfszxc_unet_tpu.ops.layers import (
                resize_linear_align_corners,
                resize_nearest_align_corners,
            )

            ip = resize_linear_align_corners(ip, out_patch, out_patch)
            tp = resize_nearest_align_corners(tp, out_patch, out_patch)
        imgs_out.append(ip)
        tgts_out.append(tp)
    return jnp.concatenate(imgs_out, axis=0), jnp.concatenate(tgts_out, axis=0)


# ========================= training engine ================================


def train_with_fractal_optimization(
    model,
    model_name: str,
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
    compute_dtype=jnp.float32,
    max_epochs: Optional[int] = None,
    visualize: bool = True,
    save_path: str = "best_model.ckpt",
    bundle_path: str = "best_fractal_model.ckpt",
):
    """Reference train-demo.py:405-665 protocol; returns best dice."""
    from jcfszxc_unet_tpu.data.loading import (
        display_dataset_info,
        load_preprocessed_data,
        visualize_samples,
    )
    from jcfszxc_unet_tpu.train import checkpoint as ckpt
    from jcfszxc_unet_tpu.train.optim import (
        ReduceLROnPlateau,
        get_current_lr,
        make_optimizer,
        set_current_lr,
    )
    from jcfszxc_unet_tpu.utils.seed import set_seed
    from jcfszxc_unet_tpu.utils.vis import save_triptych

    key = set_seed(seed)
    dataset = load_preprocessed_data(input_data)
    display_dataset_info(dataset)
    if visualize:
        visualize_samples(dataset, num_samples=3)

    n_samples = len(dataset["images"])
    n_val = int(n_samples * val_percent)
    indices = np.arange(n_samples)
    np.random.shuffle(indices)
    val_idx, train_idx = indices[:n_val], indices[n_val:]

    images = np.asarray(dataset["images"], np.float32)
    # Quirk preserved: the fractal trainer targets the FOV *masks*
    # (train-demo.py:492, 513-514) — vessel labels are never read.
    masks = np.asarray(dataset["masks"], np.float32)

    train_images = jnp.asarray(images[train_idx])
    train_masks = jnp.asarray(masks[train_idx])[..., None]
    val_images_np = images[val_idx]
    val_masks_np = masks[val_idx][..., None]

    patch_sizes, maps_np = build_fractal_sample_maps(
        masks[train_idx], patch_size
    )
    counts = level_sample_counts(batch_size)
    level_maps = [jnp.asarray(m) for m in maps_np]

    extractor = FractalFeatureExtractor(model.n_channels, dtype=compute_dtype)
    tx = make_optimizer(learning_rate, weight_decay, momentum)

    sample_patch = jnp.zeros((1, patch_size, patch_size, images.shape[-1]),
                             compute_dtype)
    minit = model.init({"params": key}, sample_patch, train=False)
    einit = extractor.init({"params": jax.random.fold_in(key, 1)}, sample_patch)
    params = {"model": minit["params"], "extractor": einit["params"]}
    batch_stats = minit.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def epoch_fn(params, batch_stats, opt_state, key):
        def one_step(carry, k):
            params, batch_stats, opt_state, total = carry
            k_sample, k_frac, k_drop = jax.random.split(k, 3)
            imgs, tgts = fractal_sample_batch(
                k_sample, train_images, train_masks, level_maps,
                patch_sizes, counts, patch_size,
            )
            imgs = imgs.astype(compute_dtype)

            def loss_fn(params):
                enhanced = extractor.apply({"params": params["extractor"]}, imgs)
                out, mut = model.apply(
                    {"params": params["model"], "batch_stats": batch_stats},
                    enhanced, train=True, mutable=["batch_stats"],
                    rngs={"dropout": k_drop},
                )
                loss = fractal_loss(out, tgts, k_frac)
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            ok = jnp.isfinite(loss)
            keep = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(ok, x, y), a, b
            )
            return (
                keep(new_params, params), new_bs, keep(new_opt, opt_state),
                total + jnp.where(ok, loss, 0.0),
            ), None

        keys = jax.random.split(key, steps)
        (params, batch_stats, opt_state, total), _ = jax.lax.scan(
            one_step, (params, batch_stats, opt_state, jnp.zeros(())), keys
        )
        return params, batch_stats, opt_state, total

    @jax.jit
    def val_fn(params, batch_stats, val_images, val_masks):
        enhanced = extractor.apply(
            {"params": params["extractor"]}, val_images.astype(compute_dtype)
        )
        out = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            enhanced, train=False,
        )
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        binary = (probs > 0.5).astype(jnp.float32)
        # (V,H,W,1) -> (V,H,W): same per-sample reduction as the reference's
        # NCHW (V,1,H,W) dice with C=1 (train-demo.py:585-587).
        dice = dice_coeff(jnp.squeeze(binary, -1), jnp.squeeze(val_masks, -1),
                          reduce_batch_first=False)
        return dice, probs

    scheduler = ReduceLROnPlateau(factor=0.7, patience=5, threshold=0.01, cooldown=2)
    best_dice = 0.0
    patience_counter = 0
    epoch = 0
    data_key = jax.random.fold_in(key, 0xF4AC)

    logging.info(
        f"Starting training with fractal optimization:\n"
        f"  Batch size:    {batch_size} (levels {counts} at patches {patch_sizes})\n"
        f"  Learning rate: {learning_rate}\n"
        f"  Training size: {len(train_idx)}  Validation size: {n_val}"
    )

    while True:
        epoch += 1
        if max_epochs is not None and epoch > max_epochs:
            break
        data_key, k = jax.random.split(data_key)
        params, batch_stats, opt_state, total = epoch_fn(
            params, batch_stats, opt_state, k
        )
        # validation on (up to 200) whole images, FOV masks as truth
        n_val_samples = min(len(val_images_np), 200)
        if n_val_samples:
            vidx = np.random.choice(
                len(val_images_np), n_val_samples, replace=False)
            vi = jnp.asarray(val_images_np[vidx])
            vm = jnp.asarray(val_masks_np[vidx])
            dice, probs = val_fn(params, batch_stats, vi, vm)
            dice = float(dice)
        else:
            # Empty validation split: report 0 like the train CLI's guard
            # (the reference train-demo would crash on an empty np.stack).
            dice, probs = 0.0, None
        epoch_loss = float(total)

        lr = get_current_lr(opt_state)
        new_lr = scheduler.step(dice, lr)
        if new_lr != lr:
            opt_state = set_current_lr(opt_state, new_lr)

        if dice > best_dice:
            best_dice = dice
            patience_counter = 0
            ckpt.save_model(save_path, model_name, {}, params["model"], batch_stats)
            # Bundle = model + extractor + optimizer state, the analogue of
            # the reference's best_fractal_model.pth (train-demo.py:600-604).
            from flax import serialization as _ser

            ckpt.save_model(
                bundle_path, model_name, {}, params["model"], batch_stats,
                extra={
                    "extractor_params": params["extractor"],
                    "opt_state": _ser.to_state_dict(opt_state),
                },
            )
            print(f"New best dice score: {best_dice:.4f} - Saved model checkpoint")
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
            f"Epoch {epoch} - LR: {new_lr:.2e} - Loss: {epoch_loss / steps:.4g} - "
            f"Dice: {dice:.4g} - Best Dice: {best_dice:.4g}"
        )

        if visualize and epoch % 5 == 0 and n_val_samples:
            sample_num = np.random.randint(0, n_val_samples)
            save_triptych(
                np.asarray(vi[sample_num], np.float32),
                np.asarray(probs[sample_num, ..., 0]),
                np.asarray(vm[sample_num, ..., 0]),
                f"visualizations/fractal_{epoch:03d}_{sample_num:03d}.png",
            )
    return best_dice
