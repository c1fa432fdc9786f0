"""Space-to-depth execution space for narrow-channel full-resolution blocks.

Round-3 prefix attribution (experiments_record.md, scripts/
tpu_train_prefix_profile.py + tpu_mres_block_iso.py) proved the training
slow tail's binding resource is NOT the MXU: it is HBM/VPU traffic
amplification on lane-padded tensors.  A (B, 128, 128, 8) bf16 activation
is 32 MB logically but 512 MB physically once the 8 channels pad to the
(8, 128) tile's 128 lanes, and every BN/concat/shortcut pass over it
(77% of a Multiresblock's fwd+bwd cost) pays the 16x.

The classic TPU answer — the conv space-to-depth transform used for
ResNet stems in public MLPerf TPU submissions — reshapes once into
(B, H/2, W/2, 4C) space where the SAME math runs with 4x better lane
fill, and reshapes back once at the end of the narrow trunk:

  * stride-1 odd-k convs have an EXACT s2d-space equivalent: a conv with
    kernel built from the original weights (``s2d_kernel``); 4x the
    logical FLOPs, but these stages run at 6-25% lane-padding ceilings,
    so MXU time is ~flat while every elementwise/BN/concat pass moves
    4x less physical data;
  * BN statistics per ORIGINAL channel are a reshaped reduce
    (``bn_stats``), scale/shift vectors tile 4x (``expand_vector``);
  * channel concat is NATIVE in the c-major phase layout used here
    (s2d channel index = c*4 + p): concatenating two s2d tensors IS the
    s2d of the concatenation;
  * 2x2/stride-2 max pooling is a phase-max that simultaneously exits
    s2d space (``maxpool_exit``).

This module is the measured-decision candidate for the
MultiResUNet/NestedUNet slow tail (6.8%/8.7% training MFU, both
dominated >=67% by narrow full-res stages); scripts/tpu_s2d_block_probe.py
carries the hardware verdict.  Exact parity with the plain formulation is
pinned by tests/test_s2d.py.

Layout convention (c-major): s2d channel index = c * 4 + p where
p = a * 2 + b, (a, b) = (row, col) phase of the 2x2 block.  Chosen over
p-major because concat along channels then needs no permutation.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), c-major phase layout.

    H and W must be even (the DRIVE training patches are 128^2; callers
    at odd sizes must pad first).
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even H, W; got {h}x{w}")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)              # (B, h, w, C, a, b)
    return x.reshape(b, h // 2, w // 2, c * 4)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    if c4 % 4:
        raise ValueError(f"channel dim {c4} is not a multiple of 4")
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)              # (B, h, a, w, b, C)
    return x.reshape(b, h * 2, w * 2, c)


@functools.lru_cache(maxsize=None)
def _selector(k: int, dilation: int = 1):
    """Static 0/1 tensor S[K, L, q, p, u, v] wiring original tap (u, v)
    into s2d tap (K, L) for output phase q and input phase p.

    Derivation: y[2i+a, 2j+b] = sum_{u,v} w[u, v] * x[2i+a+u', 2j+b+v']
    (u' = (u - r)*dilation the signed offset); the source pixel
    2i+a+u' sits at s2d row i + floor((a+u')/2), phase (a+u') mod 2 —
    each (a, u) pair maps to exactly one (delta, c).  Dilation 2 keeps
    tap offsets even, so it collapses to a dilation-1 s2d conv with
    phase-preserving taps (FeatureFuse's dilated branch).
    """
    if k % 2 == 0:
        raise ValueError(f"s2d_kernel supports odd kernel sizes, got {k}")
    r = k // 2
    big_r = (r * dilation + 1) // 2
    kk = 2 * big_r + 1
    sel = np.zeros((kk, kk, 4, 4, k, k), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            q = a * 2 + b
            for u in range(k):
                au = a + (u - r) * dilation
                di, c = au >> 1, au & 1
                for v in range(k):
                    bv = b + (v - r) * dilation
                    dj, d = bv >> 1, bv & 1
                    sel[di + big_r, dj + big_r, q, c * 2 + d, u, v] = 1.0
    return sel


def s2d_kernel(w: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """HWIO kernel (k, k, Ci, Co), odd k, stride 1 -> the exact
    s2d-space equivalent (k', k', 4Ci, 4Co) for a SAME dilation-1 s2d
    conv.  3x3 (dil 1 or 2) and 5x5 map to 3x3; 1x1 maps to 1x1."""
    k = w.shape[0]
    if w.shape[1] != k:
        raise ValueError(f"square kernels only, got {w.shape[:2]}")
    sel = jnp.asarray(_selector(k, dilation), w.dtype)
    ws = jnp.einsum("KLqpuv,uvio->KLipoq", sel, w)
    kk = sel.shape[0]
    return ws.reshape(kk, kk, w.shape[2] * 4, w.shape[3] * 4)


def expand_vector(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (C,) -> s2d per-channel vector (4C,), c-major."""
    return jnp.repeat(v, 4)


def conv_s2d(x: jnp.ndarray, w_s2d: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 conv in s2d space (kernel from :func:`s2d_kernel`)."""
    return jax.lax.conv_general_dilated(
        x, w_s2d, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bn_stats(x_s2d: jnp.ndarray, stat_dtype=jnp.float32):
    """Per-ORIGINAL-channel batch mean/var of an s2d tensor.

    One fused traversal (E[x^2] - E[x]^2, clamped), matching the
    production default ``ops.layers.TRAIN_BN_ONE_PASS_STATS``.
    """
    b, h, w, c4 = x_s2d.shape
    xf = x_s2d.astype(stat_dtype).reshape(b, h, w, c4 // 4, 4)
    mean = xf.mean(axis=(0, 1, 2, 4))
    mean_sq = (xf * xf).mean(axis=(0, 1, 2, 4))
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    return mean, var


def upsample_bilinear_s2d(x: jnp.ndarray, align_corners: bool = True,
                          from_s2d: bool = False) -> jnp.ndarray:
    """2x bilinear upsample emitted directly in s2d form.

    ``from_s2d=False``: x is an ORIGINAL-space (B, h, w, C) tensor; the
    result is the s2d form (B, h, w, 4C) of the (2h, 2w) upsample.
    ``from_s2d=True``: x is ITSELF an s2d tensor (B, h, w, 4C)
    representing a (2h, 2w) original; the result is the s2d form
    (B, 2h, 2w, 4C) of the (4h, 4w) upsample — neither the unpacked
    input nor the unpacked output is ever materialized.

    Same math as ops.layers.upsample_bilinear (the constant-resize-matrix
    einsum form) with the matrices split by row parity.  Beyond
    layers.BILINEAR_MATMUL_MAX_IN the dense matrices cost O(in_size)
    MACs/pixel, so this falls back to the gather-form upsample plus an
    explicit pack (same whole-image guard as the plain path).
    """
    from jcfszxc_unet_tpu.ops.layers import (
        BILINEAR_MATMUL_MAX_IN,
        _linear_resize_matrix,
        upsample_bilinear,
    )

    in_hw = max(x.shape[1], x.shape[2]) * (2 if from_s2d else 1)
    if in_hw > BILINEAR_MATMUL_MAX_IN:
        full = upsample_bilinear(
            depth_to_space(x) if from_s2d else x, 2, align_corners)
        return space_to_depth(full)
    if from_s2d:
        b, h, w, c4 = x.shape
        c = c4 // 4
        ih, iw = 2 * h, 2 * w
        rh = jnp.asarray(
            _linear_resize_matrix(ih, 2 * ih, align_corners), x.dtype)
        rw = jnp.asarray(
            _linear_resize_matrix(iw, 2 * iw, align_corners), x.dtype)
        # out-phase x in-phase blocks: R[a::2, c::2], each (ih, h)
        rh2 = jnp.stack([jnp.stack([rh[a::2, p::2] for p in (0, 1)])
                         for a in (0, 1)])            # (2, 2, ih, h)
        rw2 = jnp.stack([jnp.stack([rw[b_ % 2::2][:, p::2]
                                    for p in (0, 1)])
                         for b_ in (0, 1)])           # (2, 2, iw, w)
        x6 = x.reshape(b, h, w, c, 2, 2)              # phases (row, col)
        y = jnp.einsum("aciu,bdjv,nuvkcd->nijkab", rh2, rw2, x6)
        return y.reshape(b, ih, iw, c * 4)
    b, h, w, c = x.shape
    rh = jnp.asarray(_linear_resize_matrix(h, 2 * h, align_corners), x.dtype)
    rw = jnp.asarray(_linear_resize_matrix(w, 2 * w, align_corners), x.dtype)
    rha = jnp.stack([rh[0::2], rh[1::2]])              # (2, h, h)
    rwb = jnp.stack([rw[0::2], rw[1::2]])              # (2, w, w)
    y = jnp.einsum("aiu,bjv,nuvc->nijcab", rha, rwb, x)
    return y.reshape(b, h, w, c * 4)


def maxpool_exit(x_s2d: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool == max over the 4 phases; the result is the
    pooled tensor at ORIGINAL (H/2, W/2, C) layout — exits s2d space."""
    b, h, w, c4 = x_s2d.shape
    return x_s2d.reshape(b, h, w, c4 // 4, 4).max(axis=4)


def avgpool_exit(x_s2d: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool (phase mean); exits s2d space."""
    b, h, w, c4 = x_s2d.shape
    return x_s2d.reshape(b, h, w, c4 // 4, 4).mean(axis=4)
