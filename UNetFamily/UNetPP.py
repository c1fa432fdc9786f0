"""Compat re-export of the TPU-native UNetPP module."""
from jcfszxc_unet_tpu.models.UNetPP import *  # noqa: F401,F403
