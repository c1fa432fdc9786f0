"""R2U-Net — recurrent-residual conv units at each level.
Reference: UNetFamily/R2UNet.py:14-82.  Logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import RRCNNBlock, UpConvBlock
from jcfszxc_unet_tpu.ops.layers import Conv2d, max_pool2d


class R2UNet(nn.Module):
    img_ch: int = 3
    output_ch: int = 1
    t: int = 2
    dtype: Optional[Any] = None

    @property
    def n_channels(self):
        return self.img_ch

    @property
    def n_classes(self):
        return self.output_ch

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x1 = RRCNNBlock(self.img_ch, 64, self.t, dtype=dt, name="RRCNN1")(x, train)
        x2 = RRCNNBlock(64, 128, self.t, dtype=dt, name="RRCNN2")(max_pool2d(x1), train)
        x3 = RRCNNBlock(128, 256, self.t, dtype=dt, name="RRCNN3")(max_pool2d(x2), train)
        x4 = RRCNNBlock(256, 512, self.t, dtype=dt, name="RRCNN4")(max_pool2d(x3), train)
        x5 = RRCNNBlock(512, 1024, self.t, dtype=dt, name="RRCNN5")(max_pool2d(x4), train)

        d5 = UpConvBlock(1024, 512, dtype=dt, name="Up5")(x5, train)
        d5 = RRCNNBlock(1024, 512, self.t, dtype=dt, name="Up_RRCNN5")(
            jnp.concatenate([x4, d5], axis=-1), train
        )
        d4 = UpConvBlock(512, 256, dtype=dt, name="Up4")(d5, train)
        d4 = RRCNNBlock(512, 256, self.t, dtype=dt, name="Up_RRCNN4")(
            jnp.concatenate([x3, d4], axis=-1), train
        )
        d3 = UpConvBlock(256, 128, dtype=dt, name="Up3")(d4, train)
        d3 = RRCNNBlock(256, 128, self.t, dtype=dt, name="Up_RRCNN3")(
            jnp.concatenate([x2, d3], axis=-1), train
        )
        d2 = UpConvBlock(128, 64, dtype=dt, name="Up2")(d3, train)
        d2 = RRCNNBlock(128, 64, self.t, dtype=dt, name="Up_RRCNN2")(
            jnp.concatenate([x1, d2], axis=-1), train
        )
        return Conv2d(64, self.output_ch, 1, dtype=dt, name="Conv_1x1")(d2)
