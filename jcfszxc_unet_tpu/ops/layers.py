"""TPU-native layer primitives with PyTorch-compatible semantics.

Everything is NHWC (TPU-native layout; the reference is NCHW+channels_last,
which on CUDA is the same memory layout — here NHWC is first-class).

These wrappers exist so the block library (ops/blocks.py) can state reference
semantics (reference: UNetFamily/utils/unet_parts.py) once and get:
  * torch-default parameter init (ops/initializers.py),
  * torch BatchNorm running-stat conventions (momentum flipped vs Flax),
  * torch ConvTranspose2d padding/output_padding geometry,
  * torch Upsample nearest / bilinear(align_corners=True) resizing,
  * max-pooling with argmax capture + unpooling (SegNet, reference
    SegNet.py:89-138) without any dynamic scatter.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops import initializers as tinit

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


class _ConvParams(nn.Module):
    """Declares kernel/bias exactly like flax nn.Conv at the same tree
    path — shared by the split-kernel and s2d apply paths so weight
    transplant and ``.pth`` import see one canonical layout."""

    shape: Tuple[int, ...]
    use_bias: bool
    fan_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", tinit.conv_kernel_init, self.shape,
                       jnp.float32)
        b = (self.param("bias", tinit.conv_bias_init_for(self.fan_in),
                        (self.shape[-1],), jnp.float32)
             if self.use_bias else None)
        return k, b


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent on NHWC tensors.

    ``padding`` accepts an int (symmetric), a pair, or "same".

    ``s2d_space=True`` applies the SAME parameters in space-to-depth
    space (ops/s2d.py): the input is (B, H/2, W/2, 4*in_channels) in
    c-major phase layout and the output keeps that form.  Exact math
    (tests/test_s2d.py); requires stride 1, dilation 1 or 2, groups 1,
    odd square kernel, SAME-equivalent padding.
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    s2d_space: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        if isinstance(self.padding, str):
            padding = self.padding.upper()
        else:
            ph, pw = _pair(self.padding)
            padding = [(ph, ph), (pw, pw)]
        fan_in = (self.in_channels // self.groups) * kh * kw
        if self.s2d_space:
            return self._s2d_apply(x, (kh, kw), fan_in)
        if isinstance(x, (tuple, list)):
            return self._split_apply(x, (kh, kw), padding, fan_in)
        conv = nn.Conv(
            features=self.out_channels,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=padding,
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=tinit.conv_kernel_init,
            bias_init=tinit.conv_bias_init_for(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        return conv(x)

    def _split_apply(self, xs, ksize, padding, fan_in):
        """``conv(concat(xs), W) = Σ_i conv(xs[i], W[:, :, off_i:off_i+c_i])``
        without materializing the concat.  MEASURED on the v5e: consuming
        many narrow (lane-padded, <128-ch) producers through a channel
        concat is pathological — NestedUNet's 192-ch node costs 9.3 ms as
        cat→conv vs 3.8 ms split (scripts/tpu_nested_node_iso.py); for
        *wide* aligned inputs the split instead LOSES ~4% (round-2 UNet
        layout experiment), so callers opt in per node.

        Same parameters at the same tree path ("conv"/kernel+bias, same
        shapes/init) as the fused path — weight transplant and `.pth`
        import are unaffected.
        """
        if self.groups != 1:
            raise ValueError("split-input conv requires groups == 1")
        kh, kw = ksize
        # match flax's promote_dtype: params are f32, so dtype=None promotes
        # a bf16 input to f32 exactly like the fused nn.Conv path would
        dtype = self.dtype or jnp.result_type(
            jnp.float32, *[x.dtype for x in xs])
        kernel, bias = _ConvParams(
            (kh, kw, self.in_channels, self.out_channels),
            self.use_bias, fan_in, name="conv")()
        kernel = kernel.astype(dtype)
        # Partials are summed in the compute dtype: each partial conv's
        # output rounds before the add, a ±1-ulp difference vs the fused
        # conv's single rounding.  An f32-accumulated variant was measured
        # on the v5e and costs 20% (27.8 vs 23.1 ms NestedUNet — the f32
        # intermediates triple the partials' HBM traffic) for noise far
        # below the bf16 model's own precision.
        out = None
        off = 0
        for x in xs:
            c = x.shape[-1]
            part = jax.lax.conv_general_dilated(
                x.astype(dtype),
                jax.lax.slice_in_dim(kernel, off, off + c, axis=2),
                window_strides=_pair(self.stride),
                padding=padding,
                rhs_dilation=_pair(self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = part if out is None else out + part
            off += c
        if off != self.in_channels:
            raise ValueError(
                f"split-input conv: input channels sum to {off}, "
                f"expected {self.in_channels}")
        if bias is not None:
            out = out + bias.astype(dtype)
        return out

    def _s2d_apply(self, x, ksize, fan_in):
        """Apply in space-to-depth space: the (k,k,Ci,Co) parameters are
        transformed to their exact s2d equivalent (ops/s2d.s2d_kernel) at
        trace time (a tiny static-selector einsum) and convolved against
        the (B, H/2, W/2, 4*Ci) input."""
        from jcfszxc_unet_tpu.ops.s2d import conv_s2d, expand_vector, s2d_kernel

        kh, kw = ksize
        if kh != kw or kh % 2 == 0:
            raise ValueError(
                f"s2d conv needs an odd square kernel, got {kh}x{kw}")
        dil = _pair(self.dilation)
        if (self.groups != 1 or _pair(self.stride) != (1, 1)
                or dil[0] != dil[1] or dil[0] > 2):
            raise ValueError(
                "s2d conv requires stride 1, dilation 1 or 2, groups 1")
        if isinstance(self.padding, str):
            same = self.padding.upper() == "SAME"
        else:
            same = _pair(self.padding) == (kh // 2 * dil[0], kw // 2 * dil[1])
        if not same:
            raise ValueError("s2d conv requires SAME-equivalent padding")
        if isinstance(x, (tuple, list)):
            # parts are already s2d tensors; c-major concat is native
            x = jnp.concatenate(x, axis=-1)
        dtype = self.dtype or jnp.result_type(jnp.float32, x.dtype)
        kernel, bias = _ConvParams(
            (kh, kw, self.in_channels, self.out_channels),
            self.use_bias, fan_in, name="conv")()
        out = conv_s2d(x.astype(dtype),
                       s2d_kernel(kernel.astype(dtype), dil[0]))
        if bias is not None:
            out = out + expand_vector(bias.astype(dtype))
        return out


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d equivalent on NHWC tensors.

    Emulates torch geometry: out = (in-1)*stride - 2*padding + kernel
    + output_padding, by running a VALID fractionally-strided conv and
    slicing off ``padding`` from each border (zero-padding the tail if
    ``output_padding`` reaches past the scatter extent).
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        fan_in = self.out_channels * kh * kw  # torch's transposed-conv fan-in
        conv = nn.ConvTranspose(
            features=self.out_channels,
            kernel_size=(kh, kw),
            strides=(sh, sw),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=tinit.conv_transpose_kernel_init,
            bias_init=tinit.conv_bias_init_for(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        y = conv(x)
        n, hv, wv, c = y.shape
        h_in, w_in = x.shape[1], x.shape[2]
        h_out = (h_in - 1) * sh - 2 * ph + kh + oph
        w_out = (w_in - 1) * sw - 2 * pw + kw + opw
        # Pad tail if output_padding reaches past the VALID extent.
        pad_h = max(0, ph + h_out - hv)
        pad_w = max(0, pw + w_out - wv)
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return y[:, ph : ph + h_out, pw : pw + w_out, :]


# Trace-time switch: apply the train-mode BN normalization as a folded
# per-channel multiply-add in the COMPUTE dtype (statistics stay f32),
# mirroring the eval fast path.  Off by default pending measurement —
# flipped by scripts/tpu_bn_train_fastpath.py.
TRAIN_BN_FAST_APPLY = False

# Trace-time switch: compute the train-mode batch variance in ONE pass
# (E[x^2]-E[x]^2, clamped at 0) instead of two (E[(x-mean)^2]).  The
# two reductions over the same input fuse into a single HBM traversal,
# which matters on the narrow-channel lane-padded tensors that dominate
# the zoo's training slow tail (round-3 attribution: -20% fwd+bwd on the
# Multiresblock-9 composite in isolation).  Statistics stay in
# stat_dtype (>= f32), where the cancellation error for BN-scale
# activations (|mean| ~ std) is ~1e-6 relative — the trajectory-parity
# suite passes at unchanged tolerances either way.  The two-pass form
# remains available for exact-reproducibility studies.
TRAIN_BN_ONE_PASS_STATS = True

# Trace-time switch: fold the Multiresblock tail's second train-mode BN
# statistics pass away algebraically.  The tail is BN_c(concat) ->
# +shortcut -> BN_a -> ReLU (reference unet_parts.py:703-713); BN_a's
# batch statistics of y2 = BN_c(cat)+sh follow EXACTLY from five
# reductions over (cat, sh) computed in one fused pass — E[cat],
# E[cat^2], E[sh], E[sh^2], E[cat*sh] — via the affine view of BN_c:
#   E[y2]   = inv_c*mu_c + beta_c + mu_s
#   Var[y2] = inv_c^2*Var[cat] + Var[sh] + 2*inv_c*Cov[cat, sh]
# so y2 never has to be materialized for a second reduction.  The
# elementwise normalize chain is unchanged (identical math to the plain
# path); only BN_a's statistics SOURCE differs — exact f32 algebra vs a
# re-measurement over the bf16-rounded y2 — a ~1e-3-relative-in-bf16 /
# ~1e-7-in-f32 difference the trajectory suite bounds.  Implies one-pass
# (E[x^2]-E[x]^2) statistics for the two tail BNs regardless of
# TRAIN_BN_ONE_PASS_STATS.
#
# DEFAULT OFF — measured a LOSS in context on v5e (experiments_record.md
# round 4): the isolated block won (tpu_mres_tail_fuse.py, batch 128:
# fwd -12%/-30% at m9/m8, fwd+bwd -4%) but the FULL production
# MultiResUNet train step REGRESSED 31% (79.1 -> 104.1 ms/step,
# tpu_mres_fold_train.py; UNet control neutral).  The cross-covariance
# reduction E[cat*sh] and its backward (full-tensor sh/N, cat/N terms
# feeding both operands' gradient accumulations) add in-context HBM
# passes that the isolated composite amortized — the same
# isolated-vs-in-context trap as round 3's s2d.  Kept as an
# exactness-pinned alternative (tests/test_mres_fold.py): checkpoints
# are identical either way and the balance could differ on other TPU
# generations.
MRES_TAIL_FOLD = False


class _TorchBatchNorm(nn.Module):
    """Torch-exact batch norm over the last axis of an (..., C) tensor.

    Differences from ``flax.linen.BatchNorm`` (which this replaces):
      * the running-var update uses torch's *unbiased* batch variance
        (factor n/(n-1), torch BatchNorm2d docs / _NormBase.forward),
        while normalization itself uses the biased variance — both exactly
        as torch does in .train() mode;
      * running stats are kept in float32 regardless of compute dtype.

    The variable tree (params: scale/bias; batch_stats: mean/var) is
    identical to ``nn.BatchNorm`` so checkpoints and transplant tests are
    unaffected.
    """

    num_features: int
    eps: float
    momentum: float  # torch convention: running <- (1-m)*running + m*batch
    dtype: Optional[Dtype] = None
    # >1: the input is a space-to-depth tensor (ops/s2d.py, c-major phase
    # layout) whose last axis is num_features*phase_groups; statistics are
    # per ORIGINAL channel and running stats update exactly as they would
    # on the un-transformed tensor (same batch statistics, same n).
    phase_groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool, stats=None,
                 affine_out: bool = False):
        """``stats=(mean, var)``: train-mode batch statistics supplied by
        the caller (per-channel, biased variance, stat dtype) — the
        reduction over ``x`` is skipped but normalization and the
        running-stat update proceed exactly as if they had been measured
        here.  This is the hook for algebraically-derived statistics
        (e.g. Multiresblock's folded tail, where the second BN's batch
        stats follow from the first BN's affine view + a covariance —
        experiments_record.md round 4).  Ignored in eval mode.

        ``affine_out=True``: additionally return ``(inv, beta)`` with
        ``y == x*inv + beta`` per channel (stat dtype) — the affine view
        of this BN under the statistics it used this call.
        """
        c = self.num_features
        g = self.phase_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        reduce_axes = tuple(range(x.ndim - 1))

        def _ex(v):
            # per-channel vector -> last-axis layout (tiled over phases)
            return jnp.repeat(v, g) if g > 1 else v

        # Statistics in at least f32 (bf16 inputs are promoted; f64 stays
        # f64 so double-precision runs are not silently degraded).
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        shape = (1,) * (x.ndim - 1) + (c * g,)
        if use_running_average:
            # Eval fast path: fold stats+affine into ONE per-channel
            # multiply-add computed in f32 but *applied* in the compute
            # dtype — keeps the elementwise pass in bf16 so XLA fuses it
            # into the producing conv's epilogue (measured +7% on UNet
            # inference; an f32 elementwise pass breaks the fusion).
            out_dtype = self.dtype or x.dtype
            inv = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            beta = bias - ra_mean.value * inv
            y = x.astype(out_dtype) * _ex(inv).astype(out_dtype).reshape(shape)
            y = y + _ex(beta).astype(out_dtype).reshape(shape)
            if affine_out:
                return y, (inv.astype(stat_dtype), beta.astype(stat_dtype))
            return y
        elif stats is not None:
            mean = stats[0].astype(stat_dtype)
            var = stats[1].astype(stat_dtype)
            if not self.is_initializing():
                n = x.size // c
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = ((1.0 - m) * ra_mean.value
                                 + m * mean.astype(jnp.float32))
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * (var * bessel).astype(jnp.float32))
        else:
            xf = x.astype(stat_dtype)
            if g > 1:
                xg = xf.reshape(xf.shape[:-1] + (c, g))
                g_axes = tuple(range(xg.ndim - 2)) + (xg.ndim - 1,)
                mean = jnp.mean(xg, axis=g_axes)
            else:
                mean = jnp.mean(xf, axis=reduce_axes)
            if TRAIN_BN_ONE_PASS_STATS:
                # One fused traversal: XLA computes sum(x) and sum(x^2)
                # in the same pass.  Clamp guards the E[x^2]-E[x]^2
                # subtraction against tiny negative results.
                if g > 1:
                    mean2 = jnp.mean(jnp.square(xg), axis=g_axes)
                else:
                    mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
                var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            else:
                # Two-pass variance: exact even when |mean| >> std
                # (E[x^2]-E[x]^2 cancels catastrophically there).
                if g > 1:
                    mshape = (1,) * (xg.ndim - 2) + (c, 1)
                    var = jnp.mean(jnp.square(xg - mean.reshape(mshape)),
                                   axis=g_axes)
                else:
                    var = jnp.mean(jnp.square(xf - mean.reshape(shape)),
                                   axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // c
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = ((1.0 - m) * ra_mean.value
                                 + m * mean.astype(jnp.float32))
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * (var * bessel).astype(jnp.float32))
        out_dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.eps) * scale.astype(stat_dtype)
        if TRAIN_BN_FAST_APPLY and out_dtype != stat_dtype:
            # Fold (mean, inv, bias) into one per-channel multiply-add
            # applied in the compute dtype so the elementwise pass fuses
            # into the producing conv's epilogue (same trick as the eval
            # fast path above; constants stay f32).
            beta = bias.astype(stat_dtype) - mean * inv
            y = x.astype(out_dtype) * _ex(inv).astype(out_dtype).reshape(shape)
            y = y + _ex(beta).astype(out_dtype).reshape(shape)
            if affine_out:
                return y, (inv, beta)
            return y
        y = (x.astype(stat_dtype) - _ex(mean).reshape(shape)) \
            * _ex(inv).reshape(shape)
        y = y + _ex(bias).reshape(shape).astype(stat_dtype)
        y = y.astype(out_dtype)
        if affine_out:
            return y, (inv, bias.astype(stat_dtype) - mean * inv)
        return y


class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d equivalent (NHWC channel axis -1).

    torch ``momentum`` m updates running <- (1-m)*running + m*batch.  The
    ``train`` flag selects batch statistics (torch .train()) vs running
    statistics (torch .eval()).  Running var uses torch's unbiased batch
    variance (see :class:`_TorchBatchNorm`).
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention
    dtype: Optional[Dtype] = None
    phase_groups: int = 1  # >1: s2d input (see _TorchBatchNorm)

    @nn.compact
    def __call__(self, x, train: bool = True, stats=None,
                 affine_out: bool = False):
        bn = _TorchBatchNorm(
            num_features=self.num_features,
            eps=self.eps,
            momentum=self.momentum,
            dtype=self.dtype,
            phase_groups=self.phase_groups,
            name="bn",
        )
        return bn(x, use_running_average=not train, stats=stats,
                  affine_out=affine_out)


class BatchNorm1d(nn.Module):
    """torch.nn.BatchNorm1d equivalent for (N, C) activations."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = _TorchBatchNorm(
            num_features=self.num_features,
            eps=self.eps,
            momentum=self.momentum,
            dtype=self.dtype,
            name="bn",
        )
        return bn(x, use_running_average=not train)


class Linear(nn.Module):
    """torch.nn.Linear equivalent."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(
            features=self.out_features,
            use_bias=self.use_bias,
            kernel_init=tinit.linear_kernel_init,
            bias_init=tinit.conv_bias_init_for(self.in_features),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )
        return dense(x)


# ---------------------------------------------------------------------------
# Stateless spatial ops
# ---------------------------------------------------------------------------


def max_pool2d(x, kernel_size=2, stride=None):
    """torch F.max_pool2d (floor mode, no padding) on NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    return nn.max_pool(x, window_shape=k, strides=s, padding="VALID")


def avg_pool2d(x, kernel_size, stride=None, padding=0):
    """torch F.avg_pool2d with count_include_pad=True (torch default)."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    return nn.avg_pool(
        x,
        window_shape=k,
        strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        count_include_pad=True,
    )


def adaptive_avg_pool_1x1(x, keepdims: bool = True):
    """torch nn.AdaptiveAvgPool2d(1) on NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def adaptive_max_pool_1x1(x, keepdims: bool = True):
    """torch nn.AdaptiveMaxPool2d(1) on NHWC."""
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


def max_pool2d_with_indices(x):
    """2x2/stride-2 max pool capturing the within-window argmax (NHWC).

    Replaces torch ``F.max_pool2d(..., return_indices=True)`` (reference
    SegNet.py:89-112).  Because kernel == stride (non-overlapping windows),
    a window-local argmax in {0,1,2,3} carries the same information as
    torch's flat index; the paired :func:`max_unpool2d` consumes it.
    Returns (pooled, onehot) with onehot shape (N, H/2, W/2, 4, C).
    """
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"max_pool2d_with_indices requires even H and W, got {h}x{w} "
            f"(SegNet needs inputs divisible by 32 for its five pooling "
            f"stages — reference SegNet.py:89-138)")
    xw = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4, c)
    pooled = jnp.max(xw, axis=3)
    # One-hot of the *first* max (torch argmax picks the first on ties).
    is_max = xw == pooled[:, :, :, None, :]
    first = jnp.cumsum(is_max.astype(jnp.int32), axis=3) == 1
    onehot = (is_max & first).astype(x.dtype)
    return pooled, onehot


def max_unpool2d(x, onehot):
    """Inverse of :func:`max_pool2d_with_indices` — scatter values back to
    their argmax positions, zeros elsewhere (torch F.max_unpool2d,
    reference SegNet.py:115-138)."""
    n, h2, w2, c = x.shape
    y = x[:, :, :, None, :] * onehot  # (N, H/2, W/2, 4, C)
    y = y.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 * 2, w2 * 2, c)


def upsample_nearest(x, scale: int = 2):
    """torch nn.Upsample(scale_factor=s, mode='nearest') on NHWC.

    Broadcast+reshape instead of jnp.repeat: measured 2.25x faster on the
    v5e (0.80 vs 1.80 ms for 64->128 at 64 ch, batch 64;
    scripts/tpu_nested_prefix_profile.py) — XLA lowers the broadcast to a
    copy-free layout change while repeat goes through a gather."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def _linear_resize_weights(in_size: int, out_size: int, align_corners: bool):
    """Static 1-D linear-interpolation source indices/fractions (numpy:
    sizes are trace-time constants; device arrays here would cost eager
    relay round-trips during tracing)."""
    import numpy as _np

    if out_size == 1:
        src = _np.zeros((1,), _np.float32)
    elif align_corners:
        src = _np.arange(out_size, dtype=_np.float32) * (
            (in_size - 1) / (out_size - 1)
        )
    else:
        scale = in_size / out_size
        src = _np.maximum(
            (_np.arange(out_size, dtype=_np.float32) + 0.5) * scale - 0.5, 0.0)
        src = _np.minimum(src, in_size - 1)
    lo = _np.floor(src).astype(_np.int32)
    hi = _np.minimum(lo + 1, in_size - 1)
    frac = (src - lo.astype(_np.float32)).astype(_np.float32)
    return lo, hi, frac


# When True (default), bilinear upsampling contracts against constant
# interpolation matrices (MXU einsums) instead of gathering rows/columns.
# Identical two-term linear combination per output pixel.  MEASURED on the
# v5e (scripts/tpu_bilinear_forms.py): the gather form is catastrophically
# slow on TPU (21 ms for one 64->128 upsample at 64 ch, batch 64; XLA
# lowers the row/column gathers badly), the einsum form 20-45x faster in
# isolation; end-to-end NestedUNet inference 497 -> 1,693 img/s (3.4x),
# MCUNet 3,374 -> 8,912 (2.6x).
BILINEAR_VIA_MATMUL = True

# The dense interpolation matrix costs O(in_size) MACs per output pixel
# (vs the gather form's 2), and the win is measured at patch-scale sizes
# (in 16-64).  Beyond this input size — e.g. whole-image --spatial
# inference on 584x565 DRIVE images — fall back to the gather form
# rather than extrapolate the matmul's advantage by another 10x in FLOPs.
BILINEAR_MATMUL_MAX_IN = 256


def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (out_size, in_size) 1-D linear-interpolation matrix: each row
    holds the two source weights (1-f, f) of that output coordinate."""
    import numpy as _np

    lo, hi, f = _linear_resize_weights(in_size, out_size, align_corners)
    a = _np.zeros((out_size, in_size), _np.float32)
    rows = _np.arange(out_size)
    _np.add.at(a, (rows, lo), 1.0 - f)
    _np.add.at(a, (rows, hi), f)
    return a


def upsample_bilinear_matmul(x, scale: int = 2, align_corners: bool = True):
    """Bilinear upsample as two einsum contractions with constant
    interpolation matrices — the MXU-friendly formulation of
    :func:`upsample_bilinear` (same math: each output pixel is the same
    2-term H blend then 2-term W blend, weights cast to x.dtype)."""
    n, h, w, c = x.shape
    ah = jnp.asarray(_linear_resize_matrix(h, h * scale, align_corners),
                     x.dtype)
    aw = jnp.asarray(_linear_resize_matrix(w, w * scale, align_corners),
                     x.dtype)
    x = jnp.einsum("hH,nHwc->nhwc", ah, x)
    return jnp.einsum("wW,nhWc->nhwc", aw, x)


def resize_linear_align_corners(x, out_h: int, out_w: int):
    """Arbitrary-size bilinear resize with align_corners=True on NHWC, as
    two constant-matrix einsum contractions (the MXU form).

    This is bit-exact (to f32 rounding) with ``scipy.ndimage.zoom(...,
    order=1)``: zoom's order-1 spline maps output coordinate k to input
    coordinate k*(in-1)/(out-1) — the align-corners grid (verified
    numerically; tests/test_fractal.py pins it against the executed
    reference train-demo.py:163-174 zoom calls)."""
    n, h, w, c = x.shape
    ah = jnp.asarray(_linear_resize_matrix(h, out_h, True), x.dtype)
    aw = jnp.asarray(_linear_resize_matrix(w, out_w, True), x.dtype)
    x = jnp.einsum("hH,nHwc->nhwc", ah, x)
    return jnp.einsum("wW,nhWc->nhwc", aw, x)


def resize_nearest_align_corners(x, out_h: int, out_w: int):
    """Arbitrary-size nearest resize matching ``scipy.ndimage.zoom(...,
    order=0)``: source index = round(k*(in-1)/(out-1)) (align-corners
    grid, half rounds up via floor(x+0.5) — scipy's order-0 spline
    convention).  Static constant indices -> XLA take."""
    import numpy as _np

    n, h, w, c = x.shape

    def idx(in_size, out_size):
        if out_size == 1:
            return _np.zeros((1,), _np.int32)
        src = _np.arange(out_size, dtype=_np.float64) * (
            (in_size - 1) / (out_size - 1))
        return _np.floor(src + 0.5).astype(_np.int32)

    x = jnp.take(x, jnp.asarray(idx(h, out_h)), axis=1)
    return jnp.take(x, jnp.asarray(idx(w, out_w)), axis=2)


def upsample_bilinear(x, scale: int = 2, align_corners: bool = True):
    """torch nn.Upsample(mode='bilinear') on NHWC.

    align_corners=True matches reference Up_v1 (unet_parts.py:429) and
    NestedUNet's shared ``up`` (UNetPP.py:43).
    """
    if BILINEAR_VIA_MATMUL and max(x.shape[1], x.shape[2]) <= BILINEAR_MATMUL_MAX_IN:
        return upsample_bilinear_matmul(x, scale, align_corners)
    n, h, w, c = x.shape
    oh, ow = h * scale, w * scale
    lo_h, hi_h, fh = _linear_resize_weights(h, oh, align_corners)
    lo_w, hi_w, fw = _linear_resize_weights(w, ow, align_corners)
    fh = fh[None, :, None, None].astype(x.dtype)
    fw = fw[None, None, :, None].astype(x.dtype)
    top = x[:, lo_h, :, :]
    bot = x[:, hi_h, :, :]
    rows = top * (1 - fh) + bot * fh
    left = rows[:, :, lo_w, :]
    right = rows[:, :, hi_w, :]
    return left * (1 - fw) + right * fw


def pad_or_crop_to(x, target_h: int, target_w: int):
    """torch F.pad with possibly-negative pads (reference unet_parts.py:65-67,
    444-447): center-pad when the target is larger, center-crop when smaller.
    The reference computes pads as [d//2, d - d//2]; Python floor division
    already matches torch for negative d (e.g. (-3)//2 = -2), so no sign
    special-casing — the leading side takes the *larger* magnitude on an odd
    negative difference."""
    n, h, w, c = x.shape
    dh, dw = target_h - h, target_w - w
    lh, lw = dh // 2, dw // 2
    # Positive part: pad; negative: crop.
    pad_h = (max(lh, 0), max(dh - lh, 0))
    pad_w = (max(lw, 0), max(dw - lw, 0))
    if any(p > 0 for p in pad_h + pad_w):
        x = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
    crop_h0 = max(-lh, 0)
    crop_w0 = max(-lw, 0)
    return x[:, crop_h0 : crop_h0 + target_h, crop_w0 : crop_w0 + target_w, :]


_DROPOUT_DISABLED = [False]


def dropout_deterministic(train: bool) -> bool:
    """The ``deterministic=`` value for a dropout layer given the model's
    ``train`` flag.  Normally ``not train``; under :func:`dropout_disabled`
    it is always True, which neutralizes dropout while BatchNorm keeps its
    train-mode batch-statistics behavior.

    That split mode is the cross-framework parity-testing mode: dropout
    masks are RNG-coupled and can never match another framework's, but
    every other train-mode mechanism (BN statistics flow, loss, backward,
    optimizer) is deterministic and falsifiable once dropout is silenced —
    the torch-side mirror is putting the reference's nn.Dropout submodules
    in .eval() while the rest of the module stays .train()
    (tests/test_reference_import_parity.py).

    The flag is read at TRACE time: jit-compiled functions bake in the
    value that was set when they were traced.
    """
    return (not train) or _DROPOUT_DISABLED[0]


class dropout_disabled:
    """Context manager: neutralize all dropout layers (see
    :func:`dropout_deterministic`) for code traced within."""

    def __enter__(self):
        self._saved = _DROPOUT_DISABLED[0]
        _DROPOUT_DISABLED[0] = True
        return self

    def __exit__(self, *exc):
        _DROPOUT_DISABLED[0] = self._saved
        return False


def dropout2d(x, rate: float, deterministic: bool, rng=None):
    """torch nn.Dropout2d — drops whole channels (NHWC: broadcast over H, W)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[3]))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
