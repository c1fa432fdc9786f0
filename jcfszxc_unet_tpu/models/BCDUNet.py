"""BCDU-Net D3/D1 — encoder + (densely connected) bottleneck + decoder that
fuses each skip with the upsampled path via a *backward* ConvLSTM over a
2-step sequence [skip, upsampled].  Reference: UNetFamily/BCDUNet.py:15-253.

Notes mirrored from the reference:
  * ``pool3`` pools conv3, not drop3 (BCDUNet.py:96) — dropout only affects
    the skip branch;
  * output is sigmoid (BCDUNet.py:144) and the training loop applies yet
    another sigmoid (train.py:264);
  * ``N`` (patch size) is accepted for ctor compatibility but unused —
    shapes are taken from the input.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import ConvBlockPlain, ConvLSTM2D, UpConvT
from jcfszxc_unet_tpu.ops.layers import (Conv2d, dropout_deterministic,
                                         max_pool2d)


def _lstm_fuse(skip, up, lstm):
    """Stack [skip, upsampled] on a time axis and run the backward ConvLSTM
    (BCDUNet.py:119-124)."""
    seq = jnp.stack([skip, up], axis=1)  # (B, 2, H, W, C)
    return lstm(seq)


class _Decoder(nn.Module):
    """Shared decoder of D1/D3 (BCDUNet.py:57-84 / 176-203)."""

    num_classes: int
    dtype: Optional[Any] = None
    logit_head: bool = False  # see BCDU_net_D3.logit_head

    @nn.compact
    def __call__(self, bottleneck, conv1, conv2, drop3, train: bool = True):
        dt = self.dtype
        up6 = UpConvT(512, 256, dtype=dt, name="up6")(bottleneck, train)
        h = _lstm_fuse(drop3, up6,
                       ConvLSTM2D(256, 128, 3, 1, go_backwards=True, dtype=dt,
                                  name="conv_lstm6"))
        h = ConvBlockPlain(128, 256, dtype=dt, name="conv6")(h)
        up7 = UpConvT(256, 128, dtype=dt, name="up7")(h, train)
        h = _lstm_fuse(conv2, up7,
                       ConvLSTM2D(128, 64, 3, 1, go_backwards=True, dtype=dt,
                                  name="conv_lstm7"))
        h = ConvBlockPlain(64, 128, dtype=dt, name="conv7")(h)
        up8 = UpConvT(128, 64, dtype=dt, name="up8")(h, train)
        h = _lstm_fuse(conv1, up8,
                       ConvLSTM2D(64, 32, 3, 1, go_backwards=True, dtype=dt,
                                  name="conv_lstm8"))
        h = Conv2d(32, 64, 3, padding=1, dtype=dt, name="conv8_1")(h)
        h = nn.relu(h)
        h = Conv2d(64, 64, 3, padding=1, dtype=dt, name="conv8_2")(h)
        h = nn.relu(h)
        h = Conv2d(64, 2, 3, padding=1, dtype=dt, name="conv8_3")(h)
        h = nn.relu(h)
        h = Conv2d(2, self.num_classes, 1, dtype=dt, name="conv9")(h)
        if self.logit_head:
            return h
        return nn.sigmoid(h)


class _Encoder(nn.Module):
    """Shared encoder (BCDUNet.py:25-33 / 159-167)."""

    num_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        conv1 = ConvBlockPlain(self.num_channels, 64, dtype=dt, name="conv1")(x)
        pool1 = max_pool2d(conv1)
        conv2 = ConvBlockPlain(64, 128, dtype=dt, name="conv2")(pool1)
        pool2 = max_pool2d(conv2)
        conv3 = ConvBlockPlain(128, 256, dtype=dt, name="conv3")(pool2)
        drop3 = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(conv3)
        pool3 = max_pool2d(conv3)  # pools conv3, not drop3 (BCDUNet.py:96)
        return conv1, conv2, conv3, drop3, pool3


class BCDU_net_D3(nn.Module):
    N: int = 256
    num_channels: int = 3
    num_classes: int = 1
    dtype: Optional[Any] = None
    # CLI --logit-head: return the pre-sigmoid conv9 head so training sees
    # true logits instead of the reference's double-squash (sigmoid at
    # BCDUNet.py:144 + another sigmoid in the loss path, train.py:264).
    # Identical param tree; off = exact reference behavior.
    logit_head: bool = False

    @property
    def n_channels(self):
        return self.num_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        conv1, conv2, conv3, drop3, pool3 = _Encoder(self.num_channels, dtype=dt,
                                                     name="encoder")(x, train)
        # Dense bottleneck D1 -> D2 -> concat -> D3 (BCDUNet.py:98-113)
        h = nn.relu(Conv2d(256, 512, 3, padding=1, dtype=dt, name="conv4")(pool3))
        h = nn.relu(Conv2d(512, 512, 3, padding=1, dtype=dt, name="conv4_1")(h))
        drop4_1 = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(h)
        h = nn.relu(Conv2d(512, 512, 3, padding=1, dtype=dt, name="conv4_2")(drop4_1))
        h = nn.relu(Conv2d(512, 512, 3, padding=1, dtype=dt, name="conv4_2_2")(h))
        drop4_2 = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(h)
        merge = jnp.concatenate([drop4_2, drop4_1], axis=-1)
        h = nn.relu(Conv2d(1024, 512, 3, padding=1, dtype=dt, name="conv4_3")(merge))
        h = nn.relu(Conv2d(512, 512, 3, padding=1, dtype=dt, name="conv4_3_2")(h))
        drop4_3 = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(h)
        return _Decoder(self.num_classes, dtype=dt,
                        logit_head=self.logit_head, name="decoder")(
            drop4_3, conv1, conv2, drop3, train
        )


class BCDU_net_D1(nn.Module):
    N: int = 256
    num_channels: int = 3
    num_classes: int = 1
    dtype: Optional[Any] = None
    logit_head: bool = False  # see BCDU_net_D3.logit_head

    @property
    def n_channels(self):
        return self.num_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        conv1, conv2, conv3, drop3, pool3 = _Encoder(self.num_channels, dtype=dt,
                                                     name="encoder")(x, train)
        h = nn.relu(Conv2d(256, 512, 3, padding=1, dtype=dt, name="conv4")(pool3))
        h = nn.relu(Conv2d(512, 512, 3, padding=1, dtype=dt, name="conv4_1")(h))
        drop4_1 = nn.Dropout(0.5, deterministic=dropout_deterministic(train))(h)
        return _Decoder(self.num_classes, dtype=dt,
                        logit_head=self.logit_head, name="decoder")(
            drop4_1, conv1, conv2, drop3, train
        )
