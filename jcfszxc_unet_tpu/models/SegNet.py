"""SegNet — VGG16-style 13-conv encoder + mirrored decoder with
pooling-indices upsampling.  Reference: UNetFamily/SegNet.py:15-149.

torch's ``F.max_pool2d(..., return_indices=True)`` / ``F.max_unpool2d``
pair (SegNet.py:89-138) is re-expressed TPU-natively as a window-local
argmax one-hot (ops/layers.max_pool2d_with_indices) and a broadcast-multiply
unpool — no dynamic scatter, fully fusable by XLA.  Logits out.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from jcfszxc_unet_tpu.ops.layers import (
    BatchNorm2d,
    Conv2d,
    max_pool2d_with_indices,
    max_unpool2d,
)


class SegNet(nn.Module):
    input_nbr: int = 3
    label_nbr: int = 1
    dtype: Optional[Any] = None

    @property
    def n_channels(self):
        return self.input_nbr

    @property
    def n_classes(self):
        return self.label_nbr

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype

        def cbr(name, cin, cout, v):
            v = Conv2d(cin, cout, 3, padding=1, dtype=dt, name=f"conv{name}")(v)
            v = BatchNorm2d(cout, dtype=dt, name=f"bn{name}")(v, train)
            return nn.relu(v)

        # Encoder (channel plan per SegNet.py:23-52)
        x = cbr("11", self.input_nbr, 64, x)
        x = cbr("12", 64, 64, x)
        x, id1 = max_pool2d_with_indices(x)
        x = cbr("21", 64, 128, x)
        x = cbr("22", 128, 128, x)
        x, id2 = max_pool2d_with_indices(x)
        x = cbr("31", 128, 256, x)
        x = cbr("32", 256, 256, x)
        x = cbr("33", 256, 256, x)
        x, id3 = max_pool2d_with_indices(x)
        x = cbr("41", 256, 512, x)
        x = cbr("42", 512, 512, x)
        x = cbr("43", 512, 512, x)
        x, id4 = max_pool2d_with_indices(x)
        x = cbr("51", 512, 512, x)
        x = cbr("52", 512, 512, x)
        x = cbr("53", 512, 512, x)
        x, id5 = max_pool2d_with_indices(x)

        # Decoder (SegNet.py:114-141)
        x = max_unpool2d(x, id5)
        x = cbr("53d", 512, 512, x)
        x = cbr("52d", 512, 512, x)
        x = cbr("51d", 512, 512, x)
        x = max_unpool2d(x, id4)
        x = cbr("43d", 512, 512, x)
        x = cbr("42d", 512, 512, x)
        x = cbr("41d", 512, 256, x)
        x = max_unpool2d(x, id3)
        x = cbr("33d", 256, 256, x)
        x = cbr("32d", 256, 256, x)
        x = cbr("31d", 256, 128, x)
        x = max_unpool2d(x, id2)
        x = cbr("22d", 128, 128, x)
        x = cbr("21d", 128, 64, x)
        x = max_unpool2d(x, id1)
        x = cbr("12d", 64, 64, x)
        return Conv2d(64, self.label_nbr, 3, padding=1, dtype=dt, name="conv11d")(x)
