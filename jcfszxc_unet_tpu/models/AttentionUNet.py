"""Attention UNet — reference: UNetFamily/AttentionUNet.py:15-86.

5-level conv_block encoder, attention-gated skips, nearest-up decoder,
logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import AttentionBlock, ConvBlockBN, UpConvBlock
from jcfszxc_unet_tpu.ops.layers import Conv2d, max_pool2d


class AttentionUNet(nn.Module):
    img_ch: int = 3
    output_ch: int = 1
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
        x1 = ConvBlockBN(self.img_ch, 64, dtype=dt, name="Conv1")(x, train)
        x2 = ConvBlockBN(64, 128, dtype=dt, name="Conv2")(max_pool2d(x1), train)
        x3 = ConvBlockBN(128, 256, dtype=dt, name="Conv3")(max_pool2d(x2), train)
        x4 = ConvBlockBN(256, 512, dtype=dt, name="Conv4")(max_pool2d(x3), train)
        x5 = ConvBlockBN(512, 1024, dtype=dt, name="Conv5")(max_pool2d(x4), train)

        d5 = UpConvBlock(1024, 512, dtype=dt, name="Up5")(x5, train)
        x4 = AttentionBlock(512, 512, 256, dtype=dt, name="Att5")(d5, x4, train)
        d5 = ConvBlockBN(1024, 512, dtype=dt, name="Up_conv5")(
            jnp.concatenate([x4, d5], axis=-1), train
        )

        d4 = UpConvBlock(512, 256, dtype=dt, name="Up4")(d5, train)
        x3 = AttentionBlock(256, 256, 128, dtype=dt, name="Att4")(d4, x3, train)
        d4 = ConvBlockBN(512, 256, dtype=dt, name="Up_conv4")(
            jnp.concatenate([x3, d4], axis=-1), train
        )

        d3 = UpConvBlock(256, 128, dtype=dt, name="Up3")(d4, train)
        x2 = AttentionBlock(128, 128, 64, dtype=dt, name="Att3")(d3, x2, train)
        d3 = ConvBlockBN(256, 128, dtype=dt, name="Up_conv3")(
            jnp.concatenate([x2, d3], axis=-1), train
        )

        d2 = UpConvBlock(128, 64, dtype=dt, name="Up2")(d3, train)
        x1 = AttentionBlock(64, 64, 32, dtype=dt, name="Att2")(d2, x1, train)
        d2 = ConvBlockBN(128, 64, dtype=dt, name="Up_conv2")(
            jnp.concatenate([x1, d2], axis=-1), train
        )

        return Conv2d(64, self.output_ch, 1, dtype=dt, name="Conv_1x1")(d2)
