"""Compat re-export of the TPU-native AttentionUNet module."""
from jcfszxc_unet_tpu.models.AttentionUNet import *  # noqa: F401,F403
