"""On-device tiled inference: patch grid -> batched forward -> scatter-add
stitch -> count-average.

The reference does this with host loops and per-minibatch D2H copies
(evaluate.py:225-307).  Here the grid patches are gathered on device
(data/sampler.extract_patches), the forward runs in fixed-size chunks under
one jit, and the stitch is an on-device ``fori_loop`` of
dynamic_slice/dynamic_update_slice adds — count-averaging exactly like
evaluate.py:291-307.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data.sampler import build_grid_sample_map, extract_patches


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def stitch_patches(
    probs: jnp.ndarray,
    centers: jnp.ndarray,
    n_images: int,
    image_h: int,
    image_w: int,
):
    """Scatter-add (B, P, P) probabilities into (N, H, W) canvases and
    count-average overlaps (reference evaluate.py:291-307).

    Sequential fori_loop of dynamic-slice adds.  MEASURED on the v5e chip
    at DRIVE eval scale (20 images, 80 patches of 512^2): this form takes
    **1.66 ms** while the "fully parallel" flat-scatter/segment-sum form
    (:func:`stitch_patches_scatter`) takes **466 ms** — a TPU scatter with
    21M duplicate indices serializes badly, while 80 dependent
    dynamic-update-slices are each one fat contiguous HBM op.  The scatter
    variant is kept below as the mesh-shardable formulation: it is pinned
    equivalent AND executed with its patch axis actually sharded over the
    8-device test mesh (tests/test_tiling.py
    test_scatter_variant_executes_sharded_on_mesh).
    """
    patch = probs.shape[1]
    half = patch // 2
    canvas = jnp.zeros((n_images, image_h, image_w), jnp.float32)
    counts = jnp.zeros((n_images, image_h, image_w), jnp.float32)

    def body(k, carry):
        canvas, counts = carry
        c = centers[k]
        start = (c[0], c[1] - half, c[2] - half)
        cur = jax.lax.dynamic_slice(canvas, start, (1, patch, patch))
        canvas = jax.lax.dynamic_update_slice(
            canvas, cur + probs[k][None].astype(jnp.float32), start
        )
        cnt = jax.lax.dynamic_slice(counts, start, (1, patch, patch))
        counts = jax.lax.dynamic_update_slice(counts, cnt + 1.0, start)
        return canvas, counts

    canvas, counts = jax.lax.fori_loop(
        0, probs.shape[0], body, (canvas, counts))
    return jnp.where(counts > 0, canvas / jnp.maximum(counts, 1.0), 0.0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def stitch_patches_scatter(
    probs: jnp.ndarray,
    centers: jnp.ndarray,
    n_images: int,
    image_h: int,
    image_w: int,
):
    """One flat scatter-add over all B*P*P pixels — the segment-sum
    formulation (SURVEY.md §2.5 item 2).  280x slower than
    :func:`stitch_patches` on the v5e (see its docstring); kept as the
    formulation that shards over a mesh — pinned equivalent and run with
    the patch axis 8-way sharded (GSPMD per-shard scatter + canvas
    all-reduce) by tests/test_tiling.py."""
    b, patch, _ = probs.shape
    half = patch // 2
    ii = jnp.arange(patch, dtype=jnp.int32)
    rows = centers[:, 1, None] - half + ii[None, :]          # (B, P)
    cols = centers[:, 2, None] - half + ii[None, :]          # (B, P)
    flat = (
        centers[:, 0, None, None] * (image_h * image_w)
        + rows[:, :, None] * image_w
        + cols[:, None, :]
    ).reshape(-1)                                            # (B*P*P,)
    vals = probs.astype(jnp.float32).reshape(-1)
    size = n_images * image_h * image_w
    canvas = jnp.zeros((size,), jnp.float32).at[flat].add(
        vals, mode="drop", unique_indices=False)
    counts = jnp.zeros((size,), jnp.float32).at[flat].add(
        1.0, mode="drop", unique_indices=False)
    canvas = canvas.reshape(n_images, image_h, image_w)
    counts = counts.reshape(n_images, image_h, image_w)
    return jnp.where(counts > 0, canvas / jnp.maximum(counts, 1.0), 0.0)


def tiled_predict(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    patch_size: int,
    inference_batch_size: int = 32,
    mesh=None,
):
    """Full-image prediction by grid tiling + stitching.

    ``forward`` maps (B, P, P, C) -> (B, P, P, 1) *probabilities* (sigmoid
    applied by the caller, matching evaluate.py:282's unconditional sigmoid).
    Returns (N, H, W) stitched probability maps.

    With a ``mesh``, each forward chunk's patch axis is sharded over the
    ``data`` axis — the patch-grid-parallel inference of SURVEY.md §2.5
    (tiles ride ICI-parallel; the stitch stays replicated).
    """
    n, h, w, _ = images.shape
    if patch_size > h or patch_size > w:
        raise ValueError(
            f"patch_size {patch_size} exceeds the image size {h}x{w}; "
            f"pass a smaller --patch-size (the 512 default assumes "
            f"584x565 DRIVE images)")
    grid = build_grid_sample_map(n, h, w, patch_size // 2)
    centers = jnp.asarray(grid)
    patches = extract_patches(images, centers, patch_size)

    # Chunked forward with a fixed chunk size (pad the tail) so one compiled
    # program serves every chunk.
    total = patches.shape[0]
    bs = min(inference_batch_size, total)
    if mesh is not None:
        bs = max(bs // mesh.size, 1) * mesh.size  # divisible per-shard chunks
    n_chunks = -(-total // bs)
    if n_chunks * bs != total:
        # pad the tail by wrapping (extra rows are sliced off after)
        idx = jnp.arange(n_chunks * bs) % total
        patches = jnp.take(patches, idx, axis=0)
    chunks = patches.reshape(n_chunks, bs, *patches.shape[1:])

    def fwd(chunk):
        if mesh is not None:
            from jcfszxc_unet_tpu.parallel.mesh import shard_batch

            chunk = shard_batch(chunk, mesh)
        return forward(chunk)

    probs = jax.lax.map(fwd, chunks)
    probs = probs.reshape(n_chunks * bs, *probs.shape[2:])[:total]
    probs = jnp.squeeze(probs, axis=-1)
    return stitch_patches(probs, centers, n, h, w)


def sliding_window_predict(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    patch_size: int = 256,
    overlap: float = 0.5,
    batch_size: int = 4,
):
    """Single-image sliding-window predictor with configurable overlap —
    the API equivalent of the reference's (unused) ``predict_full_image``
    (evaluate.py:28-96): top-left-anchored windows at stride
    patch*(1-overlap), count-averaged; uncovered border pixels stay 0.
    """
    h, w, _ = image.shape
    if patch_size > h or patch_size > w:
        raise ValueError(
            f"patch_size {patch_size} exceeds the image size {h}x{w}; "
            f"pass a smaller patch size (the reference protocol would "
            f"silently produce an empty window grid here)")
    step = int(patch_size * (1 - overlap))
    ys = list(range(0, h - patch_size + 1, step))
    xs = list(range(0, w - patch_size + 1, step))
    half = patch_size // 2
    centers = np.array(
        [(0, y + half, x + half) for y in ys for x in xs], dtype=np.int32
    )
    centers = jnp.asarray(centers)
    patches = extract_patches(image[None], centers, patch_size)
    total = patches.shape[0]
    bs = min(batch_size, total)
    n_chunks = -(-total // bs)
    pad = n_chunks * bs - total
    if pad:
        patches = jnp.concatenate([patches, patches[:pad]], axis=0)
    chunks = patches.reshape(n_chunks, bs, *patches.shape[1:])
    probs = jax.lax.map(forward, chunks)
    probs = probs.reshape(n_chunks * bs, *probs.shape[2:])[:total]
    probs = jnp.squeeze(probs, axis=-1)
    return stitch_patches(probs, centers, 1, h, w)[0]


def dihedral_tta(forward: Callable) -> Callable:
    """Wrap a square-patch forward with dihedral-8 test-time augmentation:
    run all 8 flip/rotation variants, invert each output back, average the
    probabilities.  Additive accuracy lever (the reference has no TTA),
    the eval-side companion of ``train.py --augment``; 8x the compute.

    ``forward``: (B, P, P, C) -> (B, P, P, 1) with square P.  The 8
    variants unroll into one XLA program — no host round-trips.
    """

    def fwd(batch):
        acc = None
        for t in (False, True):
            xb = jnp.swapaxes(batch, 1, 2) if t else batch
            for h in (False, True):
                for v in (False, True):
                    x = xb[:, :, ::-1] if h else xb
                    x = x[:, ::-1] if v else x
                    y = forward(x)
                    # invert T = V o H o Tr: apply V, H, Tr in reverse
                    y = y[:, ::-1] if v else y
                    y = y[:, :, ::-1] if h else y
                    y = jnp.swapaxes(y, 1, 2) if t else y
                    acc = y if acc is None else acc + y
        return acc / 8.0

    return fwd
