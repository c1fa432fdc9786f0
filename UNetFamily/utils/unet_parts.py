"""Compat re-export of the TPU-native block library (the reference's
UNetFamily/utils/unet_parts.py surface)."""
from jcfszxc_unet_tpu.ops.blocks import *  # noqa: F401,F403
from jcfszxc_unet_tpu.ops.layers import (  # noqa: F401
    max_pool2d,
    max_pool2d_with_indices,
    max_unpool2d,
    upsample_bilinear,
    upsample_nearest,
)
