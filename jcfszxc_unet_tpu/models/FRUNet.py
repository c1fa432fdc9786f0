"""FRUNet — full-resolution grid network (~17 block nodes exchanging up/down
branches), feature_scale=2, five conv heads on full-res nodes averaged.
Reference: UNetFamily/FRUNet.py:15-138.

The reference's ``self.apply(InitWeights_He)`` (FRUNet.py:106) passes the
class, not an instance, so it never initializes anything — default PyTorch
init applies; we match that (see ops/initializers.py).  Logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import FRBlock
from jcfszxc_unet_tpu.ops.layers import Conv2d


class FRUNet(nn.Module):
    num_classes: int = 1
    num_channels: int = 3
    feature_scale: int = 2
    dropout: float = 0.2
    fuse: bool = True
    out_ave: bool = True
    dtype: Optional[Any] = None
    # Additive, off by default: run the full-resolution 32-channel row
    # (7 of 17 grid nodes — the lane-padded traffic that keeps training
    # at 14.9% MFU) in space-to-depth space.  Exact math, identical
    # parameter tree, bit-identical Dropout2d masks (tests/test_s2d.py);
    # hardware verdict: scripts/tpu_s2d_train_probe.py.
    s2d: bool = False

    @property
    def n_channels(self):
        return self.num_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        dp, fu = self.dropout, self.fuse
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]

        def blk(name, in_c, out_c, is_up, is_down):
            # s2d pays off only where channels under-fill the 128 lanes:
            # the full-res f[0]-wide row (32 ch -> exactly 128 in s2d).
            return FRBlock(in_c, out_c, dp=dp, is_up=is_up, is_down=is_down,
                           fuse=fu, dtype=dt, s2d=self.s2d and out_c == f[0],
                           name=name)

        cat = lambda *ts: jnp.concatenate(ts, axis=-1)

        # Wiring mirrors FRUNet.py:109-126.
        x1_3, x_down1_3 = blk("block1_3", self.num_channels, f[0], False, True)(x, train)
        x1_2, x_down1_2 = blk("block1_2", f[0], f[0], False, True)(x1_3, train)
        x2_2, x_up2_2, x_down2_2 = blk("block2_2", f[1], f[1], True, True)(x_down1_3, train)
        x1_1, x_down1_1 = blk("block1_1", f[0] * 2, f[0], False, True)(cat(x1_2, x_up2_2), train)
        x2_1, x_up2_1, x_down2_1 = blk("block2_1", f[1] * 2, f[1], True, True)(
            cat(x_down1_2, x2_2), train)
        x3_1, x_up3_1, x_down3_1 = blk("block3_1", f[2], f[2], True, True)(x_down2_2, train)
        x10, x_down10 = blk("block10", f[0] * 2, f[0], False, True)(cat(x1_1, x_up2_1), train)
        x20, x_up20, x_down20 = blk("block20", f[1] * 3, f[1], True, True)(
            cat(x_down1_1, x2_1, x_up3_1), train)
        x30, x_up30 = blk("block30", f[2] * 2, f[2], True, False)(cat(x_down2_1, x3_1), train)
        _, x_up40 = blk("block40", f[3], f[3], True, False)(x_down3_1, train)
        x11, x_down11 = blk("block11", f[0] * 2, f[0], False, True)(cat(x10, x_up20), train)
        x21, x_up21 = blk("block21", f[1] * 3, f[1], True, False)(
            cat(x_down10, x20, x_up30), train)
        _, x_up31 = blk("block31", f[2] * 3, f[2], True, False)(
            cat(x_down20, x30, x_up40), train)
        x12 = blk("block12", f[0] * 2, f[0], False, False)(cat(x11, x_up21), train)
        _, x_up22 = blk("block22", f[1] * 3, f[1], True, False)(
            cat(x_down11, x21, x_up31), train)
        x13 = blk("block13", f[0] * 2, f[0], False, False)(cat(x12, x_up22), train)

        heads = [
            Conv2d(f[0], self.num_classes, 1, dtype=dt, name=f"final{i}")
            for i in range(1, 6)
        ]
        if self.out_ave:
            return (
                heads[0](x1_1) + heads[1](x10) + heads[2](x11)
                + heads[3](x12) + heads[4](x13)
            ) / 5
        return heads[4](x13)
