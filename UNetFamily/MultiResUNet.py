"""Compat re-export of the TPU-native MultiResUNet module."""
from jcfszxc_unet_tpu.models.MultiResUNet import *  # noqa: F401,F403
