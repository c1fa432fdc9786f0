"""Canonical 5-level UNet — reference: UNetFamily/UNet.py:14-55.

64->1024 channels, maxpool encoder, ConvTranspose(k2,s2) decoder, logits out.
NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from jcfszxc_unet_tpu.ops.blocks import DoubleConv, Down, OutConv, Up


class UNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x1 = DoubleConv(self.n_channels, 64, dtype=dt, name="inc")(x, train)
        x2 = Down(64, 128, dtype=dt, name="down1")(x1, train)
        x3 = Down(128, 256, dtype=dt, name="down2")(x2, train)
        x4 = Down(256, 512, dtype=dt, name="down3")(x3, train)
        x5 = Down(512, 1024, dtype=dt, name="down4")(x4, train)
        x = Up(1024, 512, dtype=dt, name="up1")(x5, x4, train)
        x = Up(512, 256, dtype=dt, name="up2")(x, x3, train)
        x = Up(256, 128, dtype=dt, name="up3")(x, x2, train)
        x = Up(128, 64, dtype=dt, name="up4")(x, x1, train)
        return OutConv(64, self.n_classes, dtype=dt, name="outc")(x)
