"""Compat re-export of the TPU-native RetinaLiteNet module."""
from jcfszxc_unet_tpu.models.RetinaLiteNet import (  # noqa: F401
    TransFuseNet,
    create_transfuse_net,
)
