"""Compat re-export of the TPU-native DenseUNet module."""
from jcfszxc_unet_tpu.models.DenseUNet import *  # noqa: F401,F403
