"""Compat re-export of the TPU-native FRUNet module."""
from jcfszxc_unet_tpu.models.FRUNet import *  # noqa: F401,F403
