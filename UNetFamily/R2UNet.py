"""Compat re-export of the TPU-native R2UNet module."""
from jcfszxc_unet_tpu.models.R2UNet import *  # noqa: F401,F403
