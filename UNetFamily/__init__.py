"""Compatibility namespace: mirrors the reference's ``UNetFamily`` package
layout so ``from UNetFamily import UNet; UNet.UNet()`` works unchanged
(the reference has no __init__.py and imports modules, train.py:28-44).
Each submodule re-exports the TPU-native Flax class of the same name."""

from UNetFamily import (  # noqa: F401
    AttentionUNet,
    BARUNet,
    BCDUNet,
    BIARUNet,
    DenseUNet,
    FRUNet,
    MCUNet,
    MultiResUNet,
    R2AttentionUNet,
    R2UNet,
    ResUNet,
    RetinaLiteNet,
    SegNet,
    UNet,
    UNetPP,
)
