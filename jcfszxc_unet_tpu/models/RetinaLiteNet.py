"""TransFuseNet (RetinaLiteNet) — lightweight 3-conv encoder (8/16/32 ch),
MultiheadAttention bottleneck whose output is mean-pooled over the token
sequence and broadcast back to HxW, private CBAM copies, ConvTranspose
decoder, dual BV/OD heads but only BV returned.
Reference: UNetFamily/RetinaLiteNet.py:83-203.  Sigmoid output.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import (
    ChannelAttentionModule,
    MultiHeadSelfAttention,
    SpatialAttentionModule,
)
from jcfszxc_unet_tpu.ops.layers import BatchNorm2d, Conv2d, ConvTranspose2d, max_pool2d


class _PrivateCBAM(nn.Module):
    """RetinaLiteNet's private CBAM (RetinaLiteNet.py:16-68): same math as
    the shared one but the 7x7 spatial conv is bias-free."""

    in_channels: int
    reduction_ratio: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = x * ChannelAttentionModule(self.in_channels, self.reduction_ratio,
                                       dtype=self.dtype, name="channel_att")(x)
        x = x * SpatialAttentionModule(use_bias=False, dtype=self.dtype,
                                       name="spatial_att")(x)
        return x


class TransFuseNet(nn.Module):
    input_channels: int = 3
    dtype: Optional[Any] = None
    # CLI --logit-head: return the pre-sigmoid BV head so training sees
    # true logits instead of the reference's double-squash (sigmoid here
    # + another sigmoid in the loss path, train.py:264).  Identical
    # param tree; off = exact reference behavior.
    logit_head: bool = False

    @property
    def n_channels(self):
        return self.input_channels

    @property
    def n_classes(self):
        return 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype

        def conv_block(name, cin, cout, v):
            # Conv -> ReLU -> MaxPool -> BN (RetinaLiteNet.py:91-110; BN
            # after the pool, matching the reference ordering).
            v = Conv2d(cin, cout, 3, padding=1, dtype=dt, name=f"{name}_conv")(v)
            v = nn.relu(v)
            v = max_pool2d(v)
            return BatchNorm2d(cout, dtype=dt, name=f"{name}_bn")(v, train)

        conv1 = conv_block("conv_block1", self.input_channels, 8, x)
        conv2 = conv_block("conv_block2", 8, 16, conv1)
        conv3 = conv_block("conv_block3", 16, 32, conv2)

        b, h, w, c = conv3.shape
        tokens = conv3.reshape(b, h * w, c)
        att = MultiHeadSelfAttention(32, 4, dtype=dt, name="multihead_attention")(tokens)
        pooled = jnp.mean(att, axis=1, keepdims=True)  # (B, 1, C)
        broadcast = jnp.broadcast_to(pooled[:, :, None, :], (b, h, w, c))

        att1 = _PrivateCBAM(32, dtype=dt, name="cbam1")(broadcast)
        fused = jnp.concatenate([conv3, att1], axis=-1)

        d1 = ConvTranspose2d(64, 32, 3, stride=2, padding=1, output_padding=1,
                             dtype=dt, name="decoder_block1")(fused)
        d1 = nn.relu(d1)
        att2 = _PrivateCBAM(32, dtype=dt, name="cbam2")(d1)
        d1 = jnp.concatenate([att2, conv2], axis=-1)
        d1 = nn.relu(Conv2d(48, 32, 3, padding=1, dtype=dt, name="decoder_conv1")(d1))

        d2 = ConvTranspose2d(32, 16, 3, stride=2, padding=1, output_padding=1,
                             dtype=dt, name="decoder_block2")(d1)
        d2 = nn.relu(d2)
        att3 = _PrivateCBAM(16, dtype=dt, name="cbam3")(d2)
        d2 = jnp.concatenate([att3, conv1], axis=-1)
        d2 = nn.relu(Conv2d(24, 16, 3, padding=1, dtype=dt, name="decoder_conv2")(d2))

        d3 = ConvTranspose2d(16, 8, 3, stride=2, padding=1, output_padding=1,
                             dtype=dt, name="decoder_block3")(d2)
        d3 = nn.relu(d3)
        d3 = nn.relu(Conv2d(8, 8, 3, padding=1, dtype=dt, name="decoder_block3_conv")(d3))

        bv = Conv2d(8, 1, 1, dtype=dt, name="output_BV")(d3)
        # output_OD head exists in the reference but is never returned
        # (RetinaLiteNet.py:194-197); we keep its params for parity.
        _ = nn.sigmoid(Conv2d(8, 1, 1, dtype=dt, name="output_OD")(d3))
        if self.logit_head:
            return bv
        return nn.sigmoid(bv)


def create_transfuse_net(input_shape):
    """Reference RetinaLiteNet.py:201-203."""
    input_channels = input_shape[0] if isinstance(input_shape, tuple) else 3
    return TransFuseNet(input_channels=input_channels)
