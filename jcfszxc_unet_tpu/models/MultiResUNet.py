"""MultiResUNet — Multiresblock encoder/decoder + Respath skips (lengths
4,3,2,1), alpha=1.67 filter arithmetic.  Reference:
UNetFamily/MultiResUNet.py:15-162.  Logits out (1x1 conv+BN, no act).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.blocks import Conv2dBatchnorm, Multiresblock, Respath
from jcfszxc_unet_tpu.ops.layers import ConvTranspose2d, max_pool2d


def _mrb_out(filters: int, alpha: float) -> int:
    return (
        int(filters * alpha * 0.167)
        + int(filters * alpha * 0.333)
        + int(filters * alpha * 0.5)
    )


class MultiResUNet(nn.Module):
    input_channels: int = 3
    num_classes: int = 1
    alpha: float = 1.67
    dtype: Optional[Any] = None
    # Additive, off by default: run the narrow-channel full/half-res
    # blocks (m1/m2/m8/m9 + respath1/2 — 8-53 output channels, 2.5-16x
    # lane-padding traffic amplification, >=67% of the 6.8%-MFU training
    # step) in space-to-depth space.  Exact same math and parameter tree
    # (tests/test_s2d.py pins forward+train parity); hardware verdict:
    # scripts/tpu_s2d_train_probe.py.
    s2d: bool = False

    @property
    def n_channels(self):
        return self.input_channels

    @property
    def n_classes(self):
        return self.num_classes

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt, a = self.dtype, self.alpha
        fs = [32, 64, 128, 256, 512]
        ins = [_mrb_out(f, a) for f in fs]  # encoder block output widths

        # Persistent s2d: the narrow encoder mouth (m1 -> respath1 /
        # pool -> m2 -> respath2) and the narrow decoder tail (m8, m9)
        # stay resident in s2d space — one transform per true boundary
        # instead of one pair per block.  %4 so the half-res row is even
        # too; odd geometries fall back to the plain path (static shapes).
        use = self.s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        if use:
            from jcfszxc_unet_tpu.ops.s2d import (
                depth_to_space,
                maxpool_exit,
                space_to_depth,
            )

            m1 = Multiresblock(self.input_channels, 32, a, dtype=dt,
                               s2d_io=True, name="multiresblock1")(
                space_to_depth(x), train)
            p1 = maxpool_exit(m1)
            s1 = Respath(ins[0], 32, 4, dtype=dt, s2d_io=True,
                         name="respath1")(m1, train)
            m2 = Multiresblock(ins[0], 64, a, dtype=dt, s2d_io=True,
                               name="multiresblock2")(
                space_to_depth(p1), train)
            p2 = maxpool_exit(m2)
            s2 = Respath(ins[1], 64, 3, dtype=dt, s2d_io=True,
                         name="respath2")(m2, train)
        else:
            m1 = Multiresblock(self.input_channels, 32, a, dtype=dt, name="multiresblock1")(x, train)
            p1 = max_pool2d(m1)
            s1 = Respath(ins[0], 32, 4, dtype=dt, name="respath1")(m1, train)

            m2 = Multiresblock(ins[0], 64, a, dtype=dt, name="multiresblock2")(p1, train)
            p2 = max_pool2d(m2)
            s2 = Respath(ins[1], 64, 3, dtype=dt, name="respath2")(m2, train)

        m3 = Multiresblock(ins[1], 128, a, dtype=dt, name="multiresblock3")(p2, train)
        p3 = max_pool2d(m3)
        s3 = Respath(ins[2], 128, 2, dtype=dt, name="respath3")(m3, train)

        m4 = Multiresblock(ins[2], 256, a, dtype=dt, name="multiresblock4")(p3, train)
        p4 = max_pool2d(m4)
        s4 = Respath(ins[3], 256, 1, dtype=dt, name="respath4")(m4, train)

        m5 = Multiresblock(ins[3], 512, a, dtype=dt, name="multiresblock5")(p4, train)

        u6 = ConvTranspose2d(ins[4], 256, 2, stride=2, dtype=dt, name="upsample6")(m5)
        m6 = Multiresblock(256 * 2, 256, a, dtype=dt, name="multiresblock6")(
            jnp.concatenate([u6, s4], axis=-1), train
        )
        u7 = ConvTranspose2d(_mrb_out(256, a), 128, 2, stride=2, dtype=dt, name="upsample7")(m6)
        m7 = Multiresblock(128 * 2, 128, a, dtype=dt, name="multiresblock7")(
            jnp.concatenate([u7, s3], axis=-1), train
        )
        u8 = ConvTranspose2d(_mrb_out(128, a), 64, 2, stride=2, dtype=dt, name="upsample8")(m7)
        if use:
            # c-major layout: concat of s2d tensors IS the s2d of the
            # concat, so the reference's channel order is preserved
            m8 = Multiresblock(64 * 2, 64, a, dtype=dt, s2d_io=True,
                               name="multiresblock8")(
                jnp.concatenate([space_to_depth(u8), s2], axis=-1), train)
            u9 = ConvTranspose2d(_mrb_out(64, a), 32, 2, stride=2, dtype=dt,
                                 name="upsample9")(depth_to_space(m8))
            m9 = Multiresblock(32 * 2, 32, a, dtype=dt, s2d_io=True,
                               name="multiresblock9")(
                jnp.concatenate([space_to_depth(u9), s1], axis=-1), train)
            m9 = depth_to_space(m9)
        else:
            m8 = Multiresblock(64 * 2, 64, a, dtype=dt, name="multiresblock8")(
                jnp.concatenate([u8, s2], axis=-1), train
            )
            u9 = ConvTranspose2d(_mrb_out(64, a), 32, 2, stride=2, dtype=dt, name="upsample9")(m8)
            m9 = Multiresblock(32 * 2, 32, a, dtype=dt, name="multiresblock9")(
                jnp.concatenate([u9, s1], axis=-1), train
            )
        return Conv2dBatchnorm(_mrb_out(32, a), self.num_classes, (1, 1),
                               activation="None", dtype=dt, name="conv_final")(m9, train)
