"""Compat re-export of the TPU-native BCDUNet module."""
from jcfszxc_unet_tpu.models.BCDUNet import *  # noqa: F401,F403
