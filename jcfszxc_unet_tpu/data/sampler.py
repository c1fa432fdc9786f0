"""On-device, HBM-resident patch sampling.

The reference's hot-loop bottleneck is a host-side python loop slicing numpy
patches every step (train.py:201-241) followed by an H2D copy (244-253).
Here the whole dataset (20 DRIVE images ≈ 25 MB) lives in HBM and patch
extraction is a ``lax.fori_loop`` of dynamic slices *inside the jitted train
step* — zero host work, zero transfers in steady state.  This is where the
>=10x throughput target is won (SURVEY.md §7 "Host-free input pipeline").

Semantics mirrored:
  * train sample map = coordinates of mask!=0 pixels whose centers are
    >= half_patch from every border (reference train.py:138-152);
  * val/test grid map = meshgrid of centers at stride half_patch, clipped
    to the valid interior (reference train.py:159-184, evaluate.py:200-213);
  * a patch at center (x, y) spans [x-half, x+half) x [y-half, y+half).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_train_sample_map(masks: np.ndarray, half_patch: int) -> np.ndarray:
    """Filtered (img_idx, x, y) centers of in-bounds FOV pixels.

    masks: (N, H, W) float array (nonzero == inside field of view).
    Returns int32 array of shape (num_valid, 3).
    Reference: train.py:138-152.
    """
    n, h, w = masks.shape
    ii, xx, yy = np.nonzero(masks != 0)
    valid = (
        (xx >= half_patch)
        & (xx < h - half_patch)
        & (yy >= half_patch)
        & (yy < w - half_patch)
    )
    return np.stack(
        [ii[valid], xx[valid], yy[valid]], axis=-1
    ).astype(np.int32)


def build_grid_sample_map(n_images: int, h: int, w: int, half_patch: int) -> np.ndarray:
    """Deterministic half-overlapping grid of patch centers.

    Centers at arange(half, dim, half) clipped to [half, dim-half].
    Returns int32 (num_patches, 3) of (img_idx, x, y).
    Reference: train.py:159-184 / evaluate.py:200-213.
    """
    xs = np.clip(np.arange(half_patch, h, half_patch), half_patch, h - half_patch)
    ys = np.clip(np.arange(half_patch, w, half_patch), half_patch, w - half_patch)
    ii, xx, yy = np.meshgrid(np.arange(n_images), xs, ys, indexing="ij")
    return np.stack([ii, xx, yy], axis=-1).reshape(-1, 3).astype(np.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def extract_patches(pool: jnp.ndarray, centers: jnp.ndarray, patch_size: int):
    """Extract patches from an HBM-resident pool (N, H, W, C).

    centers: int32 (B, 3) of (img_idx, x_center, y_center).
    Returns (B, patch, patch, C).  All on-device.

    Formulation: a ``fori_loop`` of dynamic_slice → dynamic_update_slice
    pairs, NOT a vmapped dynamic_slice.  The vmap form lowers to an XLA
    gather, which is catastrophic on TPU at DRIVE pool sizes — MEASURED
    0.98 ms vs 242 ms for a 128-patch batch from an 18×584×565×3 pool
    (scripts/tpu_sampler_forms.py; same lesson as the stitch, where the
    loop form beat scatter 280×).  Each loop step is one fat contiguous
    HBM copy.  No gradient flows through this (it reads data, not
    params), so the sequential loop costs nothing in the backward.
    """
    half = patch_size // 2
    b = centers.shape[0]
    out = jnp.zeros((b, patch_size, patch_size, pool.shape[-1]), pool.dtype)

    def body(k, out):
        i, x, y = centers[k, 0], centers[k, 1], centers[k, 2]
        patch = jax.lax.dynamic_slice(
            pool, (i, x - half, y - half, 0),
            (1, patch_size, patch_size, pool.shape[-1]))
        return jax.lax.dynamic_update_slice(out, patch, (k, 0, 0, 0))

    return jax.lax.fori_loop(0, b, body, out)


def sample_centers(key: jax.Array, sample_map: jnp.ndarray, batch_size: int):
    """Uniformly sample batch_size rows of the (num_valid, 3) sample map —
    the on-device equivalent of reference train.py:201-209."""
    idx = jax.random.randint(key, (batch_size,), 0, sample_map.shape[0])
    return jnp.take(sample_map, idx, axis=0)


def sample_batch(
    key: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    sample_map: jnp.ndarray,
    batch_size: int,
    patch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One training batch: random vessel-guided centers -> patch gather.

    images: (N, H, W, C); labels: (N, H, W, 1).
    Returns (imgs (B,P,P,C), labs (B,P,P,1)).  Designed to be called inside
    the jitted train step with a per-step PRNG key.
    """
    centers = sample_centers(key, sample_map, batch_size)
    imgs = extract_patches(images, centers, patch_size)
    labs = extract_patches(labels, centers, patch_size)
    return imgs, labs


def augment_batch(
    key: jax.Array, imgs: jnp.ndarray, labs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample random dihedral-8 augmentation (flips + 90-degree
    rotations) applied identically to image and label patches.

    Additive capability: the reference trains un-augmented, but flips/
    rotations are the standard DRIVE accuracy lever and vessel masks are
    orientation-free.  TPU-idiomatic formulation: every d8 element is
    (optional transpose) o (optional H flip) o (optional V flip), so three
    per-sample boolean selects over the whole batch — no gathers, no
    data-dependent control flow, fully fused by XLA inside the jitted
    train step.  Requires square patches (they always are here).
    """
    bits = jax.random.bernoulli(key, 0.5, (3, imgs.shape[0]))

    def apply(x):
        t = bits[0][:, None, None, None]
        h = bits[1][:, None, None, None]
        v = bits[2][:, None, None, None]
        x = jnp.where(t, jnp.swapaxes(x, 1, 2), x)
        x = jnp.where(h, x[:, :, ::-1], x)
        x = jnp.where(v, x[:, ::-1], x)
        return x

    return apply(imgs), apply(labs)
