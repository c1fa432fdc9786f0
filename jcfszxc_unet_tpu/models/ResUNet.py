"""ResUNet — 3-down residual UNet with strided-conv downsampling and bare
ConvTranspose ups.  Reference: UNetFamily/ResUNet.py:15-76.
Output: sigmoid probabilities (ResUNet.py:46-49) — the training loop still
applies another sigmoid on top (train.py:264); reproduced.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import ResidualConv, UpsampleT
from jcfszxc_unet_tpu.ops.layers import BatchNorm2d, Conv2d


class ResUNet(nn.Module):
    channel: int = 3
    out_channels: int = 1
    dtype: Optional[Any] = None

    @property
    def n_channels(self):
        return self.channel

    @property
    def n_classes(self):
        return self.out_channels

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        h = Conv2d(self.channel, 64, 3, padding=1, dtype=dt, name="input_conv1")(x)
        h = BatchNorm2d(64, dtype=dt, name="input_bn")(h, train)
        h = nn.relu(h)
        h = Conv2d(64, 64, 3, padding=1, dtype=dt, name="input_conv2")(h)
        skip = Conv2d(self.channel, 64, 3, padding=1, dtype=dt, name="input_skip")(x)
        x1 = h + skip
        x2 = ResidualConv(64, 128, 2, 1, dtype=dt, name="residual_conv_1")(x1, train)
        x3 = ResidualConv(128, 256, 2, 1, dtype=dt, name="residual_conv_2")(x2, train)
        x4 = ResidualConv(256, 512, 2, 1, dtype=dt, name="bridge")(x3, train)
        x4 = UpsampleT(512, 512, 2, 2, dtype=dt, name="upsample_1")(x4)
        x6 = ResidualConv(512 + 256, 256, 1, 1, dtype=dt, name="up_residual_conv1")(
            jnp.concatenate([x4, x3], axis=-1), train
        )
        x6 = UpsampleT(256, 256, 2, 2, dtype=dt, name="upsample_2")(x6)
        x8 = ResidualConv(128 + 256, 128, 1, 1, dtype=dt, name="up_residual_conv2")(
            jnp.concatenate([x6, x2], axis=-1), train
        )
        x8 = UpsampleT(128, 128, 2, 2, dtype=dt, name="upsample_3")(x8)
        x10 = ResidualConv(128 + 64, 64, 1, 1, dtype=dt, name="up_residual_conv3")(
            jnp.concatenate([x8, x1], axis=-1), train
        )
        out = Conv2d(64, self.out_channels, 1, dtype=dt, name="output_layer")(x10)
        return nn.sigmoid(out)
