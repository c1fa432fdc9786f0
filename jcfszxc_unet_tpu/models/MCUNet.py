"""MCUNet — base_c=32 UNet with CBAM after every encoder stage and an
InceptionA bottleneck.  Reference: UNetFamily/MCUNet.py:15-61.

The InceptionA bottleneck keeps spatial resolution (unet_parts.py:396-422),
so ``up1`` upsamples past x4's size and Up_v1's "pad" is a center crop
(handled by pad_or_crop_to).  Logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from jcfszxc_unet_tpu.ops.blocks import CBAM, DoubleConv, Down, InceptionA, OutConv, UpV1


class MCUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True
    base_c: int = 32
    dtype: Optional[Any] = None

    @property
    def n_channels(self):
        return self.in_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        c = self.base_c
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(self.in_channels, c, dtype=dt, name="in_conv")(x, train)
        x1 = CBAM(c, dtype=dt, name="cbam1")(x1)
        x2 = Down(c, c * 2, dtype=dt, name="down1")(x1, train)
        x2 = CBAM(c * 2, dtype=dt, name="cbam2")(x2)
        x3 = Down(c * 2, c * 4, dtype=dt, name="down2")(x2, train)
        x3 = CBAM(c * 4, dtype=dt, name="cbam3")(x3)
        x4 = Down(c * 4, c * 8, dtype=dt, name="down3")(x3, train)
        x4 = CBAM(c * 8, dtype=dt, name="cbam4")(x4)
        x5 = InceptionA(c * 8, dtype=dt, name="down4")(x4, train)
        y = UpV1(c * 16, c * 8 // factor, self.bilinear, dtype=dt, name="up1")(x5, x4, train)
        y = UpV1(c * 8, c * 4 // factor, self.bilinear, dtype=dt, name="up2")(y, x3, train)
        y = UpV1(c * 4, c * 2 // factor, self.bilinear, dtype=dt, name="up3")(y, x2, train)
        y = UpV1(c * 2, c, self.bilinear, dtype=dt, name="up4")(y, x1, train)
        return OutConv(c, self.num_classes, dtype=dt, name="out_conv")(y)
