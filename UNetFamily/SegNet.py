"""Compat re-export of the TPU-native SegNet module."""
from jcfszxc_unet_tpu.models.SegNet import *  # noqa: F401,F403
