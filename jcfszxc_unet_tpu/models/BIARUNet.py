"""BIARUNet — BARUNet + SE blocks on each decoder upsample.
Reference: UNetFamily/BIARUNet.py:15-90.  Softmax output (same 1-channel
defect as BARUNet, BIARUNet.py:89).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import (
    BABasicBlock,
    CBAM,
    ConvBlockBN,
    SEBlock,
    UpConvBlock,
)
from jcfszxc_unet_tpu.ops.layers import Conv2d, max_pool2d


class BIARUNet(nn.Module):
    img_ch: int = 3
    output_ch: int = 1
    dtype: Optional[Any] = None
    # CLI --logit-head: return the pre-softmax head (see BARUNet; same
    # constant-softmax defect, BIARUNet.py:89).  Identical param tree.
    logit_head: bool = False

    @property
    def n_channels(self):
        return self.img_ch

    @property
    def n_classes(self):
        return self.output_ch

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x1 = ConvBlockBN(self.img_ch, 64, dtype=dt, name="Conv1")(x, train)
        x1 = CBAM(64, dtype=dt, name="cbam1")(x1) + x1
        x2 = BABasicBlock(64, 128, dtype=dt, name="Conv2")(max_pool2d(x1), train)
        x2 = CBAM(128, dtype=dt, name="cbam2")(x2) + x2
        x3 = BABasicBlock(128, 256, dtype=dt, name="Conv3")(max_pool2d(x2), train)
        x3 = CBAM(256, dtype=dt, name="cbam3")(x3) + x3
        x4 = BABasicBlock(256, 512, dtype=dt, name="Conv4")(max_pool2d(x3), train)
        x4 = CBAM(512, dtype=dt, name="cbam4")(x4) + x4
        x5 = BABasicBlock(512, 1024, dtype=dt, name="Conv5")(max_pool2d(x4), train)

        d5 = UpConvBlock(1024, 512, dtype=dt, name="Up5")(x5, train)
        d5 = SEBlock(512, dtype=dt, name="SE1")(d5)
        d5 = ConvBlockBN(1024, 512, dtype=dt, name="Up_conv5")(
            jnp.concatenate([x4, d5], axis=-1), train
        )
        d4 = UpConvBlock(512, 256, dtype=dt, name="Up4")(d5, train)
        d4 = SEBlock(256, dtype=dt, name="SE2")(d4)
        d4 = ConvBlockBN(512, 256, dtype=dt, name="Up_conv4")(
            jnp.concatenate([x3, d4], axis=-1), train
        )
        d3 = UpConvBlock(256, 128, dtype=dt, name="Up3")(d4, train)
        d3 = SEBlock(128, dtype=dt, name="SE3")(d3)
        d3 = ConvBlockBN(256, 128, dtype=dt, name="Up_conv3")(
            jnp.concatenate([x2, d3], axis=-1), train
        )
        d2 = UpConvBlock(128, 64, dtype=dt, name="Up2")(d3, train)
        d2 = SEBlock(64, dtype=dt, name="SE4")(d2)
        d2 = ConvBlockBN(128, 64, dtype=dt, name="Up_conv2")(
            jnp.concatenate([x1, d2], axis=-1), train
        )
        d1 = Conv2d(64, self.output_ch, 1, dtype=dt, name="Conv_1x1")(d2)
        if self.logit_head:
            return d1
        return jax.nn.softmax(d1, axis=-1)
