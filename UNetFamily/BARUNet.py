"""Compat re-export of the TPU-native BARUNet module."""
from jcfszxc_unet_tpu.models.BARUNet import *  # noqa: F401,F403
