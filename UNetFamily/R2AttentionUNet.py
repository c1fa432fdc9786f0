"""Compat re-export of the TPU-native R2AttentionUNet module."""
from jcfszxc_unet_tpu.models.R2AttentionUNet import *  # noqa: F401,F403
