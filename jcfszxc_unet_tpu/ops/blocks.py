"""The shared block library — Flax/NHWC re-expression of every block in the
reference's ``UNetFamily/utils/unet_parts.py`` (885 LoC, ~30 blocks).

Each class documents the reference block (file:line) whose semantics it
reproduces, including the latent quirks the rebuild must preserve:

  * ``RecurrentBlock`` applies its shared conv t+1 times, not t
    (unet_parts.py:125-132's loop structure).
  * ``Respath`` applies the same BatchNorm twice per iteration
    (unet_parts.py:784-788).
  * ``UpV1``'s pad may be negative — a crop (unet_parts.py:444-447 via
    torch F.pad semantics); MCUNet's InceptionA bottleneck keeps spatial
    size, so up1 actually crops.
  * ``BasicConv2d`` (torchvision) uses BatchNorm eps=1e-3, not 1e-5.
  * ``FRConv`` ignores ``in_c`` and convolves out_c->out_c
    (unet_parts.py:496: Conv2d(out_c, out_c, ...)).

All blocks take/return NHWC; BN/dropout-bearing blocks take ``train``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.layers import (
    BatchNorm1d,
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    Linear,
    adaptive_avg_pool_1x1,
    adaptive_max_pool_1x1,
    avg_pool2d,
    dropout_deterministic,
    max_pool2d,
    pad_or_crop_to,
    upsample_bilinear,
    upsample_nearest,
)

Dtype = Any


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) x2, optional mid_channels.
    Reference: unet_parts.py:17-34."""

    in_channels: int
    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_channels or self.out_channels
        x = Conv2d(self.in_channels, mid, 3, padding=1, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm2d(mid, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv2d(mid, self.out_channels, 3, padding=1, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm2d(self.out_channels, dtype=self.dtype)(x, train)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool2 -> DoubleConv.  Reference: unet_parts.py:37-47."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = max_pool2d(x, 2)
        return DoubleConv(self.in_channels, self.out_channels, dtype=self.dtype)(x, train)


class Up(nn.Module):
    """ConvTranspose(k2,s2, C->C/2) -> pad-to-skip -> concat[skip, x] ->
    DoubleConv.  Reference: unet_parts.py:50-70."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        x1 = ConvTranspose2d(
            self.in_channels, self.in_channels // 2, 2, stride=2, dtype=self.dtype
        )(x1)
        x1 = pad_or_crop_to(x1, x2.shape[1], x2.shape[2])
        # A split-kernel (tuple) variant of this concat was measured on the
        # v5e and is a wash for UNet (12.7 vs 12.4 ms control) — one narrow
        # pair is not the NestedUNet many-narrow-producers pathology; the
        # concat stays (experiments_record.md round 2).
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.in_channels, self.out_channels, dtype=self.dtype)(x, train)


class OutConv(nn.Module):
    """Conv1x1 head.  Reference: unet_parts.py:73-79."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.in_channels, self.out_channels, 1, dtype=self.dtype)(x)


class ConvBlockBN(nn.Module):
    """(Conv3x3 bias -> BN -> ReLU) x2 — the reference's ``conv_block``
    (unet_parts.py:82-96)."""

    ch_in: int
    ch_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.ch_in, self.ch_out, 3, padding=1, dtype=self.dtype)(x)
        x = BatchNorm2d(self.ch_out, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv2d(self.ch_out, self.ch_out, 3, padding=1, dtype=self.dtype)(x)
        x = BatchNorm2d(self.ch_out, dtype=self.dtype)(x, train)
        return nn.relu(x)


class UpConvBlock(nn.Module):
    """Nearest-upsample x2 -> Conv3x3 -> BN -> ReLU — the reference's
    ``up_conv`` (unet_parts.py:99-111)."""

    ch_in: int
    ch_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample_nearest(x, 2)
        x = Conv2d(self.ch_in, self.ch_out, 3, padding=1, dtype=self.dtype)(x)
        x = BatchNorm2d(self.ch_out, dtype=self.dtype)(x, train)
        return nn.relu(x)


class RecurrentBlock(nn.Module):
    """t-step recurrent conv with shared Conv+BN+ReLU — the reference's
    ``Recurrent_block`` (unet_parts.py:114-132).  NOTE the reference loop
    applies the conv t+1 times in total (the i==0 branch runs the conv once
    on x, then every iteration including i==0 runs it again on x+x1); we
    reproduce that exactly, sharing the BN (stats update on every call)."""

    ch_out: int
    t: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = Conv2d(self.ch_out, self.ch_out, 3, padding=1, dtype=self.dtype)
        bn = BatchNorm2d(self.ch_out, dtype=self.dtype)

        def f(v):
            return nn.relu(bn(conv(v), train))

        x1 = f(x)
        for _ in range(self.t):
            x1 = f(x + x1)
        return x1


class RRCNNBlock(nn.Module):
    """Conv1x1 -> 2x RecurrentBlock -> residual add — the reference's
    ``RRCNN_block`` (unet_parts.py:135-146)."""

    ch_in: int
    ch_out: int
    t: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.ch_in, self.ch_out, 1, dtype=self.dtype)(x)
        x1 = RecurrentBlock(self.ch_out, self.t, dtype=self.dtype)(x, train)
        x1 = RecurrentBlock(self.ch_out, self.t, dtype=self.dtype)(x1, train)
        return x + x1


class AttentionBlock(nn.Module):
    """Additive attention gate — the reference's ``Attention_block``
    (unet_parts.py:149-176): psi = sigmoid(BN(Conv1x1(ReLU(W_g g + W_x x))));
    returns x * psi."""

    F_g: int
    F_l: int
    F_int: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, g, x, train: bool = True):
        g1 = Conv2d(self.F_g, self.F_int, 1, dtype=self.dtype)(g)
        g1 = BatchNorm2d(self.F_int, dtype=self.dtype)(g1, train)
        x1 = Conv2d(self.F_l, self.F_int, 1, dtype=self.dtype)(x)
        x1 = BatchNorm2d(self.F_int, dtype=self.dtype)(x1, train)
        psi = nn.relu(g1 + x1)
        psi = Conv2d(self.F_int, 1, 1, dtype=self.dtype)(psi)
        psi = BatchNorm2d(1, dtype=self.dtype)(psi, train)
        psi = nn.sigmoid(psi)
        return x * psi


class BAModule(nn.Module):
    """Bridge-attention fusion — the reference's ``BA_module_resnet``
    (unet_parts.py:188-224).  Inputs are GAP-pooled maps (N,1,1,C)."""

    pre_channels: Sequence[int]
    cur_channel: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pre_layers, cur_layer, train: bool = True):
        red = self.cur_channel // self.reduction
        fusion = None
        cur = cur_layer.reshape(cur_layer.shape[0], -1)
        cur = Linear(self.cur_channel, red, use_bias=False, dtype=self.dtype)(cur)
        cur = BatchNorm1d(red, dtype=self.dtype)(cur, train)
        fusion = cur
        for i, pre_c in enumerate(self.pre_channels):
            p = pre_layers[i].reshape(pre_layers[i].shape[0], -1)
            p = Linear(pre_c, red, use_bias=False, dtype=self.dtype)(p)
            p = BatchNorm1d(red, dtype=self.dtype)(p, train)
            fusion = fusion + p
        w = nn.relu(fusion)
        w = Linear(red, self.cur_channel, use_bias=False, dtype=self.dtype)(w)
        w = nn.sigmoid(w)
        return w.reshape(w.shape[0], 1, 1, self.cur_channel)


class BABasicBlock(nn.Module):
    """conv3x3-BN-ReLU -> conv3x3-BN, BA-gated, 1x1-conv + Dropout(0.5)
    residual — the reference's ``BABasicBlock`` (unet_parts.py:227-275)."""

    ch_in: int
    ch_out: int
    stride: int = 1
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = Conv2d(self.ch_in, self.ch_out, 3, stride=self.stride, padding=1,
                     use_bias=False, dtype=self.dtype)(x)
        out = BatchNorm2d(self.ch_out, dtype=self.dtype)(out, train)
        out = nn.relu(out)
        f1 = adaptive_avg_pool_1x1(out)
        out = Conv2d(self.ch_out, self.ch_out, 3, padding=1, use_bias=False,
                     dtype=self.dtype)(out)
        out = BatchNorm2d(self.ch_out, dtype=self.dtype)(out, train)
        f2 = adaptive_avg_pool_1x1(out)
        att = BAModule((self.ch_out,), self.ch_out, self.reduction, dtype=self.dtype)(
            [f1], f2, train
        )
        out = out * att
        residual = Conv2d(self.ch_in, self.ch_out, 1, stride=self.stride,
                          use_bias=False, dtype=self.dtype)(residual)
        residual = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(residual)
        return nn.relu(out + residual)


class ChannelAttentionModule(nn.Module):
    """avg+max pool -> shared 1x1-conv MLP -> sigmoid — reference
    unet_parts.py:278-294 (ratio 16)."""

    channel: int
    ratio: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        mlp1 = Conv2d(self.channel, self.channel // self.ratio, 1, use_bias=False,
                      dtype=self.dtype)
        mlp2 = Conv2d(self.channel // self.ratio, self.channel, 1, use_bias=False,
                      dtype=self.dtype)
        avg = mlp2(nn.relu(mlp1(adaptive_avg_pool_1x1(x))))
        mx = mlp2(nn.relu(mlp1(adaptive_max_pool_1x1(x))))
        return nn.sigmoid(avg + mx)


class SpatialAttentionModule(nn.Module):
    """mean/max over C -> Conv7x7 -> sigmoid — reference unet_parts.py:297-310
    (conv has bias there; RetinaLiteNet's private copy is bias-free)."""

    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = Conv2d(2, 1, 7, padding=3, use_bias=self.use_bias, dtype=self.dtype)(y)
        return nn.sigmoid(y)


class CBAM(nn.Module):
    """channel-att * x, then spatial-att * that — reference
    unet_parts.py:313-322."""

    channel: int
    ratio: int = 16
    spatial_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = ChannelAttentionModule(self.channel, self.ratio, dtype=self.dtype)(x) * x
        out = SpatialAttentionModule(self.spatial_bias, dtype=self.dtype)(out) * out
        return out


class SEBlock(nn.Module):
    """GAP -> Linear down -> ReLU -> Linear up -> sigmoid scale — the
    reference's ``se_block`` (unet_parts.py:325-343; its constructor-time
    debug print is not reproduced)."""

    channel: int
    ratio: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = adaptive_avg_pool_1x1(x, keepdims=False)
        y = Linear(self.channel, self.channel // self.ratio, use_bias=False,
                   dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Linear(self.channel // self.ratio, self.channel, use_bias=False,
                   dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SingleLevelDensenet(nn.Module):
    """num_conv convs with dense *additive* skips — the reference's
    ``Single_level_densenet`` (unet_parts.py:346-367)."""

    filters: int
    num_conv: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = [x]
        for i in range(self.num_conv):
            t = Conv2d(self.filters, self.filters, 3, padding=1, dtype=self.dtype)(outs[i])
            for j in range(i):
                t = t + outs[j]
            t = BatchNorm2d(self.filters, dtype=self.dtype)(t, train)
            outs.append(nn.relu(t))
        return outs[-1]


def down_sample(x):
    """MaxPool2 returning (pooled, pre-pool skip) — the reference's
    ``Down_sample`` (unet_parts.py:370-377; parameter-free)."""
    return max_pool2d(x, 2), x


class UpsampleNConcat(nn.Module):
    """ConvTranspose(k4,s2,p1) -> concat skip -> Conv3x3 -> BN -> ReLU —
    the reference's ``Upsample_n_Concat`` (unet_parts.py:380-393)."""

    filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        x = ConvTranspose2d(self.filters, self.filters, 4, stride=2, padding=1,
                            dtype=self.dtype)(x)
        x = jnp.concatenate([x, y], axis=-1)
        x = Conv2d(2 * self.filters, self.filters, 3, padding=1, dtype=self.dtype)(x)
        x = BatchNorm2d(self.filters, dtype=self.dtype)(x, train)
        return nn.relu(x)


class BasicConv2d(nn.Module):
    """torchvision.models.inception.BasicConv2d: Conv(bias=False) ->
    BN(eps=1e-3) -> ReLU.  Used by InceptionA (unet_parts.py:396-422)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.in_channels, self.out_channels, self.kernel_size,
                   padding=self.padding, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm2d(self.out_channels, eps=1e-3, dtype=self.dtype)(x, train)
        return nn.relu(x)


class InceptionA(nn.Module):
    """4-branch inception, concat -> 256 ch, spatial size preserved —
    reference unet_parts.py:396-422."""

    in_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        y1 = avg_pool2d(x, 3, stride=1, padding=1)
        y1 = BasicConv2d(self.in_channels, 32, 1, dtype=self.dtype)(y1, train)
        y2 = BasicConv2d(self.in_channels, 32, 1, dtype=self.dtype)(x, train)
        y3 = BasicConv2d(self.in_channels, 32, 1, dtype=self.dtype)(x, train)
        y3 = BasicConv2d(32, 64, 3, padding=1, dtype=self.dtype)(y3, train)
        y4 = BasicConv2d(self.in_channels, 32, 1, dtype=self.dtype)(x, train)
        y4 = BasicConv2d(32, 64, 3, padding=1, dtype=self.dtype)(y4, train)
        y4 = BasicConv2d(64, 128, 3, padding=1, dtype=self.dtype)(y4, train)
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class UpV1(nn.Module):
    """Bilinear(align_corners=True) x2 (or ConvTranspose) -> pad/crop ->
    concat -> DoubleConv — the reference's ``Up_v1``
    (unet_parts.py:425-451).  With MCUNet's InceptionA bottleneck the
    "pad" is negative, i.e. a center crop; reproduced by pad_or_crop_to."""

    in_channels: int
    out_channels: int
    bilinear: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        if self.bilinear:
            x1 = upsample_bilinear(x1, 2, align_corners=True)
            conv = DoubleConv(self.in_channels, self.out_channels,
                              self.in_channels // 2, dtype=self.dtype)
        else:
            x1 = ConvTranspose2d(self.in_channels, self.in_channels // 2, 2,
                                 stride=2, dtype=self.dtype)(x1)
            conv = DoubleConv(self.in_channels, self.out_channels, dtype=self.dtype)
        x1 = pad_or_crop_to(x1, x2.shape[1], x2.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)
        return conv(x, train)


class ResidualConv(nn.Module):
    """Pre-activation residual: BN-ReLU-Conv3x3(stride) -> BN-ReLU-Conv3x3,
    plus Conv-BN skip — the reference's ``ResidualConv``
    (unet_parts.py:454-475)."""

    input_dim: int
    output_dim: int
    stride: int
    padding: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = BatchNorm2d(self.input_dim, dtype=self.dtype)(x, train)
        h = nn.relu(h)
        h = Conv2d(self.input_dim, self.output_dim, 3, stride=self.stride,
                   padding=self.padding, dtype=self.dtype)(h)
        h = BatchNorm2d(self.output_dim, dtype=self.dtype)(h, train)
        h = nn.relu(h)
        h = Conv2d(self.output_dim, self.output_dim, 3, padding=1, dtype=self.dtype)(h)
        s = Conv2d(self.input_dim, self.output_dim, 3, stride=self.stride,
                   padding=1, dtype=self.dtype)(x)
        s = BatchNorm2d(self.output_dim, dtype=self.dtype)(s, train)
        return h + s


class UpsampleT(nn.Module):
    """Bare ConvTranspose2d(kernel, stride) — the reference's ``Upsample``
    (unet_parts.py:478-487, ResUNet decoder)."""

    input_dim: int
    output_dim: int
    kernel: int
    stride: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return ConvTranspose2d(self.input_dim, self.output_dim, self.kernel,
                               stride=self.stride, dtype=self.dtype)(x)


class FRConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> Dropout2d -> LeakyReLU(0.1)) x2 — the
    reference's FRUNet ``conv`` (unet_parts.py:490-507).  NOTE the reference
    ignores in_c and builds Conv2d(out_c, out_c) — callers always pass
    in_c == out_c; we assert that."""

    in_c: int
    out_c: int
    dp: float = 0.0
    dtype: Optional[Dtype] = None
    s2d: bool = False  # input/output in space-to-depth form (ops/s2d.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        mult = 4 if self.s2d else 1
        assert x.shape[-1] == self.out_c * mult
        for _ in range(2):
            x = Conv2d(self.out_c, self.out_c, 3, padding=1, use_bias=False,
                       dtype=self.dtype, s2d_space=self.s2d)(x)
            x = BatchNorm2d(self.out_c, dtype=self.dtype,
                            phase_groups=mult)(x, train)
            if self.s2d:
                # Dropout2d drops whole ORIGINAL channels: mask on a
                # (B, h, w, C, 4) view so a channel's 4 phases drop
                # together.  The (B,1,1,C,1) bernoulli draw consumes the
                # same bits as the plain path's (B,1,1,C), so the masks
                # are bit-identical across the two execution modes.
                b, h, w, c4 = x.shape
                x5 = x.reshape(b, h, w, c4 // 4, 4)
                x5 = nn.Dropout(self.dp, broadcast_dims=(1, 2, 4),
                                deterministic=dropout_deterministic(train)
                                )(x5)
                x = x5.reshape(b, h, w, c4)
            else:
                x = nn.Dropout(self.dp, broadcast_dims=(1, 2),
                               deterministic=dropout_deterministic(train))(x)
            x = nn.leaky_relu(x, 0.1)
        return x


class FeatureFuse(nn.Module):
    """1x1 + 3x3 + dilated-3x3(d2) convs summed -> BN — the reference's
    ``feature_fuse`` (unet_parts.py:510-525)."""

    in_c: int
    out_c: int
    dtype: Optional[Dtype] = None
    s2d: bool = False  # input/output in space-to-depth form (ops/s2d.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x1 = Conv2d(self.in_c, self.out_c, 1, use_bias=False, dtype=self.dtype,
                    s2d_space=self.s2d)(x)
        x2 = Conv2d(self.in_c, self.out_c, 3, padding=1, use_bias=False,
                    dtype=self.dtype, s2d_space=self.s2d)(x)
        # dilation-2 taps sit on even offsets, so the s2d equivalent is a
        # plain (dilation-1) 3x3 s2d conv — see ops/s2d._selector
        x3 = Conv2d(self.in_c, self.out_c, 3, padding=2, dilation=2,
                    use_bias=False, dtype=self.dtype, s2d_space=self.s2d)(x)
        return BatchNorm2d(self.out_c, dtype=self.dtype,
                           phase_groups=4 if self.s2d else 1)(
            x1 + x2 + x3, train)


class FRUp(nn.Module):
    """ConvTranspose(k2,s2,no-bias) -> BN -> LeakyReLU(0.1) — the
    reference's FRUNet ``up`` (unet_parts.py:528-541)."""

    in_c: int
    out_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTranspose2d(self.in_c, self.out_c, 2, stride=2, use_bias=False,
                            dtype=self.dtype)(x)
        x = BatchNorm2d(self.out_c, dtype=self.dtype)(x, train)
        return nn.leaky_relu(x, 0.1)


class FRDown(nn.Module):
    """Conv(k2,s2,no-bias) -> BN -> LeakyReLU(0.1) — the reference's FRUNet
    ``down`` (unet_parts.py:544-555)."""

    in_c: int
    out_c: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.in_c, self.out_c, 2, stride=2, use_bias=False,
                   dtype=self.dtype)(x)
        x = BatchNorm2d(self.out_c, dtype=self.dtype)(x, train)
        return nn.leaky_relu(x, 0.1)


class FRBlock(nn.Module):
    """FRUNet grid node — the reference's ``block`` (unet_parts.py:558-591):
    fuse (iff in_c != out_c) -> conv, optionally emitting up/down branches.
    Returns x, (x, x_up), (x, x_down) or (x, x_up, x_down)."""

    in_c: int
    out_c: int
    dp: float = 0.0
    is_up: bool = False
    is_down: bool = False
    fuse: bool = True
    dtype: Optional[Dtype] = None
    # Space-to-depth execution (see Multiresblock.s2d): fuse + the double
    # conv run in s2d space; the up/down branches consume the transformed-
    # back output, so cross-resolution wiring is untouched.
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_s2d = (self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d:
            from jcfszxc_unet_tpu.ops.s2d import depth_to_space, space_to_depth
            x = space_to_depth(x)
        if self.in_c != self.out_c:
            if self.fuse:
                x = FeatureFuse(self.in_c, self.out_c, dtype=self.dtype,
                                s2d=use_s2d)(x, train)
            else:
                x = Conv2d(self.in_c, self.out_c, 1, dtype=self.dtype,
                           s2d_space=use_s2d)(x)
        x = FRConv(self.out_c, self.out_c, self.dp, dtype=self.dtype,
                   s2d=use_s2d)(x, train)
        if use_s2d:
            x = depth_to_space(x)
        if not self.is_up and not self.is_down:
            return x
        outs = [x]
        if self.is_up:
            outs.append(FRUp(self.out_c, self.out_c // 2, dtype=self.dtype)(x, train))
        if self.is_down:
            outs.append(FRDown(self.out_c, self.out_c * 2, dtype=self.dtype)(x, train))
        return tuple(outs)


class Conv2dBatchnorm(nn.Module):
    """Conv("same") -> BN -> optional ReLU — the reference's
    ``Conv2d_batchnorm`` (unet_parts.py:617-656).

    ``s2d=True``: input/output are space-to-depth tensors (ops/s2d.py);
    same parameters, exact same math, 4x better lane fill on the
    narrow-channel full-res stages (the training slow tail's binding
    resource, experiments_record.md round 3)."""

    num_in_filters: int
    num_out_filters: int
    kernel_size: Tuple[int, int]
    activation: str = "relu"
    dtype: Optional[Dtype] = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.num_in_filters, self.num_out_filters, self.kernel_size,
                   padding="same", dtype=self.dtype, s2d_space=self.s2d)(x)
        x = BatchNorm2d(self.num_out_filters, dtype=self.dtype,
                        phase_groups=4 if self.s2d else 1)(x, train)
        if self.activation == "relu":
            return nn.relu(x)
        return x


class Multiresblock(nn.Module):
    """3 chained 3x3 convs (~3x3/5x5/7x7 receptive fields), concat + 1x1
    shortcut, double BN + ReLU — reference unet_parts.py:659-715.  Filter
    counts use int() truncation exactly as the reference does."""

    num_in_channels: int
    num_filters: int
    alpha: float = 1.67
    dtype: Optional[Dtype] = None
    # Execute in space-to-depth space (ops/s2d.py): exact same math and
    # parameters, 4x better lane fill for the narrow (8-53 ch) full-res
    # instances that dominate MultiResUNet's training step (round-3
    # attribution: m8+m9 = 67% of the 6.8%-MFU step).  Falls back to the
    # plain path when the spatial dims are odd (static shapes under jit).
    s2d: bool = False
    # Persistent form: input is ALREADY s2d and the output stays s2d —
    # the model owns the (amortized) boundary transforms.  Implies s2d
    # compute; the caller is responsible for the even-dims check.
    s2d_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        W = self.num_filters * self.alpha
        f3 = int(W * 0.167)
        f5 = int(W * 0.333)
        f7 = int(W * 0.5)
        out_f = f3 + f5 + f7
        use_s2d = self.s2d_io or (
            self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d and not self.s2d_io:
            from jcfszxc_unet_tpu.ops.s2d import depth_to_space, space_to_depth
            x = space_to_depth(x)
        pg = 4 if use_s2d else 1
        shortcut = Conv2dBatchnorm(self.num_in_channels, out_f, (1, 1),
                                   activation="None", dtype=self.dtype,
                                   s2d=use_s2d)(x, train)
        a = Conv2dBatchnorm(self.num_in_channels, f3, (3, 3), dtype=self.dtype,
                            s2d=use_s2d)(x, train)
        b = Conv2dBatchnorm(f3, f5, (3, 3), dtype=self.dtype,
                            s2d=use_s2d)(a, train)
        c = Conv2dBatchnorm(f5, f7, (3, 3), dtype=self.dtype,
                            s2d=use_s2d)(b, train)
        # c-major phase layout: channel-concat of s2d tensors IS the s2d
        # of the concat, so this line serves both paths unchanged.
        y = jnp.concatenate([a, b, c], axis=-1)
        bn_c = BatchNorm2d(out_f, dtype=self.dtype, phase_groups=pg)
        bn_a = BatchNorm2d(out_f, dtype=self.dtype, phase_groups=pg)
        from jcfszxc_unet_tpu.ops import layers as _layers

        if _layers.MRES_TAIL_FOLD and train and pg == 1:
            # Folded tail (see ops/layers.MRES_TAIL_FOLD): ONE fused
            # reduction pass over (cat, shortcut) yields both BNs' batch
            # statistics — BN_a's derive algebraically from BN_c's affine
            # view + the cross-covariance — so y2 = BN_c(cat)+shortcut is
            # never materialized for a second stats pass.  The normalize
            # chain below is the exact plain-path math.
            sd = jnp.promote_types(y.dtype, jnp.float32)
            catf = y.astype(sd)
            shf = shortcut.astype(sd)
            axes = tuple(range(y.ndim - 1))
            mu_c = catf.mean(axes)
            m2_c = jnp.square(catf).mean(axes)
            mu_s = shf.mean(axes)
            m2_s = jnp.square(shf).mean(axes)
            m_cs = (catf * shf).mean(axes)
            var_c = jnp.maximum(m2_c - jnp.square(mu_c), 0.0)
            var_s = jnp.maximum(m2_s - jnp.square(mu_s), 0.0)
            cov = m_cs - mu_c * mu_s
            y, (inv_c, beta_c) = bn_c(y, train, stats=(mu_c, var_c),
                                      affine_out=True)
            mu_a = inv_c * mu_c + beta_c + mu_s
            var_a = jnp.maximum(
                inv_c * inv_c * var_c + var_s + 2.0 * inv_c * cov, 0.0)
            y = y + shortcut
            y = bn_a(y, train, stats=(mu_a, var_a))
        else:
            y = bn_c(y, train)
            y = y + shortcut
            y = bn_a(y, train)
        y = nn.relu(y)
        if use_s2d and not self.s2d_io:
            y = depth_to_space(y)
        return y


class Respath(nn.Module):
    """Length-L residual chain along the skip path — reference
    unet_parts.py:718-791.  Preserves the quirk that the same BN is applied
    twice per iteration (lines 784-788): stats are updated twice and the
    same affine is applied both times."""

    num_in_filters: int
    num_out_filters: int
    respath_length: int
    dtype: Optional[Dtype] = None
    # Space-to-depth execution (see Multiresblock.s2d): the whole chain
    # stays in s2d space, so the entry/exit transforms amortize over
    # respath_length residual units.
    s2d: bool = False
    # Persistent form: s2d input/output, no internal transforms (see
    # Multiresblock.s2d_io).
    s2d_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_s2d = self.s2d_io or (
            self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d and not self.s2d_io:
            from jcfszxc_unet_tpu.ops.s2d import depth_to_space, space_to_depth
            x = space_to_depth(x)
        for i in range(self.respath_length):
            in_f = self.num_in_filters if i == 0 else self.num_out_filters
            shortcut = Conv2dBatchnorm(in_f, self.num_out_filters, (1, 1),
                                       activation="None", dtype=self.dtype,
                                       s2d=use_s2d,
                                       name=f"shortcut_{i}")(x, train)
            x = Conv2dBatchnorm(in_f, self.num_out_filters, (3, 3),
                                dtype=self.dtype, s2d=use_s2d,
                                name=f"conv_{i}")(x, train)
            bn = BatchNorm2d(self.num_out_filters, dtype=self.dtype,
                             phase_groups=4 if use_s2d else 1,
                             name=f"bn_{i}")
            x = nn.relu(bn(x, train))
            x = x + shortcut
            x = nn.relu(bn(x, train))
        if use_s2d and not self.s2d_io:
            x = depth_to_space(x)
        return x


class ConvBlockPlain(nn.Module):
    """(Conv3x3 -> ReLU) x2, no BN — the reference's BCDUNet ``ConvBlock``
    (unet_parts.py:794-806)."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.in_channels, self.out_channels, 3, padding=1,
                   dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv2d(self.out_channels, self.out_channels, 3, padding=1,
                   dtype=self.dtype)(x)
        return nn.relu(x)


class _BareConvParams(nn.Module):
    """Declares kernel/bias exactly like flax nn.Conv does."""

    in_channels: int
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        from jcfszxc_unet_tpu.ops import initializers as tinit

        k = self.kernel_size
        fan_in = self.in_channels * k * k
        kernel = self.param(
            "kernel", tinit.conv_kernel_init,
            (k, k, self.in_channels, self.out_channels), jnp.float32)
        bias = self.param(
            "bias", tinit.conv_bias_init_for(fan_in),
            (self.out_channels,), jnp.float32)
        return kernel, bias


class _ConvParams(nn.Module):
    """Bare Conv2d parameters with the same tree as ops.layers.Conv2d
    (child "conv" holding kernel (kh,kw,I,O) + bias) — for blocks that need
    direct access to the kernel to split it algebraically."""

    in_channels: int
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        return _BareConvParams(self.in_channels, self.out_channels,
                               self.kernel_size, name="conv")()


class ConvLSTM2D(nn.Module):
    """ConvLSTM unrolled over a (B, T, H, W, C) sequence, returning the last
    hidden state — the reference's ``ConvLSTM2DCell``/``ConvLSTM2D``
    (unet_parts.py:809-869).  One conv on [x, h] -> 4 gates; zero-init
    state; ``go_backwards`` reverses time.

    TPU-native evaluation: conv([x, h], W) is split algebraically into
    conv(x, Wx) + conv(h, Wh).  The x-half of every time step runs as one
    *batched* conv over (B*T) — off the sequential chain — and the
    recurrent chain is only the (smaller) conv(h, Wh); the first step's
    conv(zeros, Wh) is elided exactly.  Parameters keep the single
    fused-conv tree (Conv2d_0/conv/{kernel,bias}), so checkpoints and
    transplants are unchanged.  T is static (2 in BCDUNet), so we unroll
    rather than scan."""

    input_dim: int
    hidden_dim: int
    kernel_size: int = 3
    padding: int = 1
    go_backwards: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, _ = x.shape
        kernel, bias = _ConvParams(
            self.input_dim + self.hidden_dim, 4 * self.hidden_dim,
            self.kernel_size, name="Conv2d_0")()
        dt = self.dtype or x.dtype
        kernel = kernel.astype(dt)
        bias = bias.astype(dt)
        x = x.astype(dt)
        w_x = kernel[:, :, : self.input_dim, :]
        w_h = kernel[:, :, self.input_dim :, :]
        pad = [(self.padding, self.padding)] * 2

        def conv(v, w):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        cell = jnp.zeros((b, h, w, self.hidden_dim), dt)
        hidden = None
        steps = range(t - 1, -1, -1) if self.go_backwards else range(t)
        for k, step in enumerate(steps):
            gates = conv(x[:, step], w_x) + bias
            if k > 0:  # first step's hidden state is exactly zero
                gates = gates + conv(hidden, w_h)
            i, f, o, g = jnp.split(gates, 4, axis=-1)
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            g = jnp.tanh(g)
            cell = f * cell + i * g if k > 0 else i * g
            hidden = o * jnp.tanh(cell)
        return hidden


class UpConvT(nn.Module):
    """ConvTranspose(k2,s2) -> BN -> ReLU — the reference's ``UpConv``
    (unet_parts.py:872-885, BCDUNet decoder)."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTranspose2d(self.in_channels, self.out_channels, 2, stride=2,
                            dtype=self.dtype)(x)
        x = BatchNorm2d(self.out_channels, dtype=self.dtype)(x, train)
        return nn.relu(x)


class MultiHeadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention(batch_first=True) self-attention
    equivalent — reference RetinaLiteNet.py:72-80.  Input (B, L, E)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from jcfszxc_unet_tpu.ops import initializers as tinit

        e, h = self.embed_dim, self.num_heads
        head = e // h
        in_proj = nn.DenseGeneral(features=3 * e, use_bias=True,
                                  kernel_init=tinit.xavier_uniform_init,
                                  bias_init=tinit.zeros_init,
                                  dtype=self.dtype, name="in_proj")
        # torch MultiheadAttention._reset_parameters xavier-inits only the
        # in_proj; out_proj.weight keeps nn.Linear's kaiming_uniform default
        # and out_proj.bias is explicitly zeroed.
        out_proj = nn.Dense(features=e, use_bias=True,
                            kernel_init=tinit.linear_kernel_init,
                            bias_init=tinit.zeros_init,
                            dtype=self.dtype, name="out_proj")
        b, l, _ = x.shape
        qkv = in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, h, head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(head, q.dtype))
        attn = jnp.einsum("bhld,bhmd->bhlm", q * scale, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, e)
        return out_proj(out)
