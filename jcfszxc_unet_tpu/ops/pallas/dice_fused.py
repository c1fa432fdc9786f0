"""Fused masked dice-statistics reduction as a Pallas TPU kernel.

One pass over a batch of probability/target maps produces the three
per-sample sums the dice family needs (intersection, pred-sum, target-sum)
with the clamp applied in-register — a single VMEM-resident VPU sweep
instead of three separate XLA reductions.  Used by the on-device metrics
path; the XLA fallback defines semantics and tests pin parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def dice_sums_xla(probs, target):
    """Per-sample (2*sum(p*t), sum(p), sum(t)) with p clamped to [0,1] —
    the building blocks of reference utils/dice_score.py:24-29.
    probs/target: (B, H, W)."""
    p = jnp.clip(probs.astype(jnp.float32), 0.0, 1.0)
    t = target.astype(jnp.float32)
    inter = 2.0 * jnp.sum(p * t, axis=(-1, -2))
    ps = jnp.sum(p, axis=(-1, -2))
    ts = jnp.sum(t, axis=(-1, -2))
    return inter, ps, ts


def _kernel(p_ref, t_ref, inter_ref, ps_ref, ts_ref):
    p = jnp.clip(p_ref[0].astype(jnp.float32), 0.0, 1.0)
    t = t_ref[0].astype(jnp.float32)
    inter_ref[0, 0] = 2.0 * jnp.sum(p * t)
    ps_ref[0, 0] = jnp.sum(p)
    ts_ref[0, 0] = jnp.sum(t)


def dice_sums_pallas(probs, target, interpret: bool = False):
    """Pallas implementation: grid over batch, one fused reduction sweep."""
    b, h, w = probs.shape
    out = jax.ShapeDtypeStruct((b, 1), jnp.float32)
    inter, ps, ts = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (i, 0)),
        ],
        out_shape=[out, out, out],
        interpret=interpret,
    )(probs, target)
    return inter[:, 0], ps[:, 0], ts[:, 0]


def dice_coeff_hard(probs, target, use_pallas: bool = False,
                    interpret: bool = False):
    """Mean per-sample dice of (B, H, W) maps using the fused sums —
    numerically identical to train/losses.dice_coeff with
    reduce_batch_first=False on 3D inputs."""
    f = dice_sums_pallas if use_pallas else dice_sums_xla
    if use_pallas:
        inter, ps, ts = f(probs, target, interpret=interpret)
    else:
        inter, ps, ts = f(probs, target)
    eps = 1e-5
    sets_sum = ps + ts
    sets_sum = jnp.where(sets_sum < eps, inter, sets_sum)
    return jnp.mean((inter + eps) / (sets_sum + eps))
