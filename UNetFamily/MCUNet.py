"""Compat re-export of the TPU-native MCUNet module."""
from jcfszxc_unet_tpu.models.MCUNet import *  # noqa: F401,F403
