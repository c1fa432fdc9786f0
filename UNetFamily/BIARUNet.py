"""Compat re-export of the TPU-native BIARUNet module."""
from jcfszxc_unet_tpu.models.BIARUNet import *  # noqa: F401,F403
