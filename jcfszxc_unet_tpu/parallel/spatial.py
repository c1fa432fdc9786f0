"""Whole-image spatial partitioning (SP) over the device mesh — SURVEY.md
§2.5 item 3 (the optional stretch goal; the reference has no analogue).

Instead of decomposing a full DRIVE image into patches, the image's ROW
axis is sharded across the mesh and the model runs on the whole image at
once: GSPMD partitions every convolution spatially and inserts the halo
exchanges (collective-permutes of boundary rows) over ICI automatically.
This is the TPU-native expression of "the image is too big for one chip":
no stitching, no overlap bookkeeping — one forward, sharded.

Height is padded up to a multiple of the mesh size (and of ``divisor``,
the model's total downsampling factor) with zeros, then cropped — padding
rows are FOV-masked away downstream exactly like the reference's border
handling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def pad_to_multiple(x, axis: int, multiple: int):
    """Zero-pad ``axis`` up to the next multiple; returns (padded, orig)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads), size


def make_spatial_forward(model, variables, mesh, *, divisor: int = 32,
                         compute_dtype=jnp.float32, apply_sigmoid=True):
    """Build a jitted whole-image forward with the H axis sharded over the
    mesh's ``data`` axis.

    ``divisor``: the model's total spatial downsampling factor (32 covers
    every model in the zoo); H is padded to lcm-like multiple of
    mesh.size * divisor so every shard and every pooling level stays
    even.  Returns fn(images (N,H,W,C)) -> (N,H,W) probabilities.
    """
    in_sharding = NamedSharding(mesh, P(None, "data", None, None))

    @jax.jit
    def forward(images):
        n, h, w, c = images.shape
        x, orig_h = pad_to_multiple(images, 1, mesh.size * divisor)
        x, orig_w = pad_to_multiple(x, 2, divisor)
        x = jax.lax.with_sharding_constraint(
            x.astype(compute_dtype), in_sharding)
        out = model.apply(variables, x, train=False)
        out = out.astype(jnp.float32)
        if apply_sigmoid:
            out = jax.nn.sigmoid(out)
        out = jax.lax.with_sharding_constraint(out, in_sharding)
        return out[:, :orig_h, :orig_w, 0]

    return forward
