"""DenseUNet — constant-width (128) dense-conv levels.
Reference: UNetFamily/DenseUNet.py:15-56.

Reproduced defects (behavioral parity):
  * ``n_classes`` is set to ``filters`` (=128, DenseUNet.py:39) even though
    the out-conv emits ``out_chan`` (=1) channels — this trips the
    ``n_classes > 1 -> CrossEntropyLoss`` branch at train.py:124 (which is a
    constant 0 for 1-channel logits; see train/losses.soft_cross_entropy).
  * the forward reuses ``self.down1`` for all four downsamples
    (DenseUNet.py:44-47); the pooling is parameter-free so this is
    functionally the same maxpool each time — down2..4 are dead params in
    the reference and simply don't exist here.
Logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from jcfszxc_unet_tpu.ops.blocks import SingleLevelDensenet, UpsampleNConcat, down_sample
from jcfszxc_unet_tpu.ops.layers import Conv2d


class DenseUNet(nn.Module):
    in_chan: int = 3
    out_chan: int = 1
    filters: int = 128
    num_conv: int = 4
    dtype: Optional[Any] = None

    @property
    def n_channels(self):
        return self.in_chan

    @property
    def n_classes(self):
        # Reference defect preserved: reports `filters`, not out_chan.
        return self.filters

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        f, nc = self.filters, self.num_conv
        x = Conv2d(self.in_chan, f, 1, dtype=dt, name="conv1")(x)
        x, y1 = down_sample(SingleLevelDensenet(f, nc, dtype=dt, name="d1")(x, train))
        x, y2 = down_sample(SingleLevelDensenet(f, nc, dtype=dt, name="d2")(x, train))
        x, y3 = down_sample(SingleLevelDensenet(f, nc, dtype=dt, name="d3")(x, train))
        x, y4 = down_sample(SingleLevelDensenet(f, nc, dtype=dt, name="d4")(x, train))
        x = SingleLevelDensenet(f, nc, dtype=dt, name="bottom")(x, train)
        x = SingleLevelDensenet(f, nc, dtype=dt, name="u4")(
            UpsampleNConcat(f, dtype=dt, name="up4")(x, y4, train), train
        )
        x = SingleLevelDensenet(f, nc, dtype=dt, name="u3")(
            UpsampleNConcat(f, dtype=dt, name="up3")(x, y3, train), train
        )
        x = SingleLevelDensenet(f, nc, dtype=dt, name="u2")(
            UpsampleNConcat(f, dtype=dt, name="up2")(x, y2, train), train
        )
        x = SingleLevelDensenet(f, nc, dtype=dt, name="u1")(
            UpsampleNConcat(f, dtype=dt, name="up1")(x, y1, train), train
        )
        return Conv2d(f, self.out_chan, 1, dtype=dt, name="outconv")(x)
