"""Compat re-export of the TPU-native ResUNet module."""
from jcfszxc_unet_tpu.models.ResUNet import *  # noqa: F401,F403
