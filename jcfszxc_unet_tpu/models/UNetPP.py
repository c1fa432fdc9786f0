"""NestedUNet (UNet++) — nested dense skip grid with bilinear upsampling.
Reference: UNetFamily/UNetPP.py:31-107.

Uses UNetPP's *private* DoubleConv (UNetPP.py:15-28) whose convs have bias
(unlike the shared bias-free DoubleConv).  ``deepsupervision`` is hard-coded
False in the reference (UNetPP.py:38); we expose it as a ctor flag with the
same default and the same 4-head behavior when enabled.  Sigmoid output.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.layers import (
    BatchNorm2d,
    Conv2d,
    max_pool2d,
    upsample_bilinear,
)


class _DoubleConvBias(nn.Module):
    """UNetPP.py:15-28 — (Conv3x3 bias -> BN -> ReLU) x2.

    ``x`` may be a tuple of tensors (their channels summing to ``in_ch``):
    the first conv then runs in split-kernel form over the would-be
    concat (see Conv2d._split_apply) — same math, no concat materialized.
    """

    in_ch: int
    out_ch: int
    dtype: Optional[Any] = None
    # Space-to-depth execution (ops/s2d.py): the 32/64-ch rows run with
    # 4x better lane fill; in s2d space the producers are >=128-ch
    # aligned, so a plain concat replaces the split-kernel path.  Same
    # parameters, exact math (tests/test_s2d.py).
    s2d: bool = False
    # Persistent form: inputs are ALREADY s2d and the output stays s2d
    # (the model amortizes boundary transforms across the dense grid).
    s2d_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        ref = x[0] if isinstance(x, (tuple, list)) else x
        use_s2d = self.s2d_io or (
            self.s2d and ref.shape[1] % 2 == 0 and ref.shape[2] % 2 == 0)
        if use_s2d and not self.s2d_io:
            from jcfszxc_unet_tpu.ops.s2d import (
                depth_to_space,
                space_to_depth,
            )
            if isinstance(x, (tuple, list)):
                x = tuple(space_to_depth(t) for t in x)
            else:
                x = space_to_depth(x)
        pg = 4 if use_s2d else 1
        x = Conv2d(self.in_ch, self.out_ch, 3, padding=1, dtype=self.dtype,
                   s2d_space=use_s2d)(x)
        x = BatchNorm2d(self.out_ch, dtype=self.dtype, phase_groups=pg)(x, train)
        x = nn.relu(x)
        x = Conv2d(self.out_ch, self.out_ch, 3, padding=1, dtype=self.dtype,
                   s2d_space=use_s2d)(x)
        x = BatchNorm2d(self.out_ch, dtype=self.dtype, phase_groups=pg)(x, train)
        x = nn.relu(x)
        if use_s2d and not self.s2d_io:
            x = depth_to_space(x)
        return x


class NestedUNet(nn.Module):
    in_channel: int = 3
    out_channel: int = 1
    deepsupervision: bool = False
    dtype: Optional[Any] = None
    # Additive, off by default: run rows 0/1 (the 32/64-ch full/half-res
    # nodes — the x0 row alone is 73% of the 8.7%-MFU training step) in
    # space-to-depth space.  Exact math, same parameter tree
    # (tests/test_s2d.py); hardware verdict: scripts/tpu_s2d_train_probe.py.
    s2d: bool = False

    @property
    def n_channels(self):
        return self.in_channel

    @property
    def n_classes(self):
        return self.out_channel

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        nb = [32, 64, 128, 256, 512]
        up = lambda t: upsample_bilinear(t, 2, align_corners=True)
        cat = lambda *ts: jnp.concatenate(ts, axis=-1)
        # Rows 0/1 feed their nodes TUPLES instead of a concat: their
        # producers are 32/64-ch (lane-padded on TPU) and consuming them
        # through a channel concat is pathological — the split-kernel
        # Conv2d path (ops/layers.Conv2d._split_apply, algebraically
        # identical) measured 2.4x faster on the 192-ch node.  Rows 2+
        # have lane-aligned >=128-ch inputs where the concat is faster.
        tup = lambda *ts: tuple(ts)

        # Persistent s2d: rows 0/1 stay RESIDENT in s2d space across the
        # whole dense grid — x0_0 is transformed once instead of being
        # re-packed by each of the 4 later nodes that read it.  Pooling
        # exits via phase-max; up-edges interpolate straight into packed
        # form (upsample_bilinear_s2d, both variants).  %4 so the half-
        # res row is even too; odd geometries fall back to plain.
        use = self.s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        if use:
            from jcfszxc_unet_tpu.ops.s2d import (
                depth_to_space,
                maxpool_exit,
                space_to_depth,
                upsample_bilinear_s2d,
            )

            x_in = space_to_depth(x)
            up_to0 = lambda t: upsample_bilinear_s2d(t, from_s2d=True)
            up_to1 = upsample_bilinear_s2d
            pool0 = lambda t: space_to_depth(maxpool_exit(t))
            pool1 = maxpool_exit
            unpack0 = depth_to_space
        else:
            x_in = x
            up_to0 = up_to1 = up
            pool0 = pool1 = max_pool2d
            unpack0 = lambda t: t

        def dc(name, cin, cout):
            # s2d pays off where channels under-fill the 128 lanes: rows
            # 0 (32 ch @ full res) and 1 (64 ch @ half res)
            io = use and (name.startswith("conv0_")
                          or name.startswith("conv1_"))
            return _DoubleConvBias(cin, cout, dtype=dt, s2d_io=io, name=name)

        x0_0 = dc("conv0_0", self.in_channel, nb[0])(x_in, train)
        x1_0 = dc("conv1_0", nb[0], nb[1])(pool0(x0_0), train)
        x0_1 = dc("conv0_1", nb[0] + nb[1], nb[0])(tup(x0_0, up_to0(x1_0)), train)

        x2_0 = dc("conv2_0", nb[1], nb[2])(pool1(x1_0), train)
        x1_1 = dc("conv1_1", nb[1] + nb[2], nb[1])(tup(x1_0, up_to1(x2_0)), train)
        x0_2 = dc("conv0_2", nb[0] * 2 + nb[1], nb[0])(
            tup(x0_0, x0_1, up_to0(x1_1)), train)

        x3_0 = dc("conv3_0", nb[2], nb[3])(max_pool2d(x2_0), train)
        x2_1 = dc("conv2_1", nb[2] + nb[3], nb[2])(cat(x2_0, up(x3_0)), train)
        x1_2 = dc("conv1_2", nb[1] * 2 + nb[2], nb[1])(
            tup(x1_0, x1_1, up_to1(x2_1)), train)
        x0_3 = dc("conv0_3", nb[0] * 3 + nb[1], nb[0])(
            tup(x0_0, x0_1, x0_2, up_to0(x1_2)), train)

        x4_0 = dc("conv4_0", nb[3], nb[4])(max_pool2d(x3_0), train)
        x3_1 = dc("conv3_1", nb[3] + nb[4], nb[3])(cat(x3_0, up(x4_0)), train)
        x2_2 = dc("conv2_2", nb[2] * 2 + nb[3], nb[2])(cat(x2_0, x2_1, up(x3_1)), train)
        x1_3 = dc("conv1_3", nb[1] * 3 + nb[2], nb[1])(
            tup(x1_0, x1_1, x1_2, up_to1(x2_2)), train)
        x0_4 = dc("conv0_4", nb[0] * 4 + nb[1], nb[0])(
            tup(x0_0, x0_1, x0_2, x0_3, up_to0(x1_3)), train)

        if self.deepsupervision:
            outs = []
            for i, xi in enumerate([x0_1, x0_2, x0_3, x0_4], start=1):
                o = Conv2d(nb[0], self.out_channel, 1, dtype=dt,
                           name=f"final{i}")(unpack0(xi))
                outs.append(nn.sigmoid(o))
            return outs
        out = Conv2d(nb[0], self.out_channel, 1, dtype=dt,
                     name="final")(unpack0(x0_4))
        return nn.sigmoid(out)
