"""Compat re-export of the TPU-native UNet module."""
from jcfszxc_unet_tpu.models.UNet import *  # noqa: F401,F403
