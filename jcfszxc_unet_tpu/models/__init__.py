"""Model zoo registry — 16 classes / 15 modules, mirroring the reference's
module-qualified spellings (``UNet.UNet()``, ``BCDUNet.BCDU_net_D3(N=...)``,
train.py:505-523) so the CLI's ``--model`` flag accepts the exact names a
reference user would write.
"""

from __future__ import annotations

from jcfszxc_unet_tpu.models import (  # noqa: F401
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

MODEL_REGISTRY = {
    "UNet.UNet": UNet.UNet,
    "AttentionUNet.AttentionUNet": AttentionUNet.AttentionUNet,
    "R2UNet.R2UNet": R2UNet.R2UNet,
    "R2AttentionUNet.R2AttentionUNet": R2AttentionUNet.R2AttentionUNet,
    "BARUNet.BARUNet": BARUNet.BARUNet,
    "BIARUNet.BIARUNet": BIARUNet.BIARUNet,
    "DenseUNet.DenseUNet": DenseUNet.DenseUNet,
    "MCUNet.MCUNet": MCUNet.MCUNet,
    "ResUNet.ResUNet": ResUNet.ResUNet,
    "FRUNet.FRUNet": FRUNet.FRUNet,
    "MultiResUNet.MultiResUNet": MultiResUNet.MultiResUNet,
    "SegNet.SegNet": SegNet.SegNet,
    "BCDUNet.BCDU_net_D3": BCDUNet.BCDU_net_D3,
    "BCDUNet.BCDU_net_D1": BCDUNet.BCDU_net_D1,
    "RetinaLiteNet.TransFuseNet": RetinaLiteNet.TransFuseNet,
    "UNetPP.NestedUNet": UNetPP.NestedUNet,
}

# Short aliases: bare class names resolve too.
_ALIASES = {name.split(".")[-1]: cls for name, cls in MODEL_REGISTRY.items()}


def resolve_model(name: str):
    """Return the model class for a registry name or bare-class alias."""
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    if name in _ALIASES:
        return _ALIASES[name]
    raise KeyError(
        f"Unknown model {name!r}. Available: {sorted(MODEL_REGISTRY)}"
    )


def create_model(name: str, **kwargs):
    """Instantiate a model from the registry by name."""
    return resolve_model(name)(**kwargs)


def s2d_capable():
    """Registry names of models with the ``s2d`` execution-mode field
    (space-to-depth form for their narrow-channel blocks, ops/s2d.py)."""
    return sorted(
        name for name, cls in MODEL_REGISTRY.items()
        if "s2d" in getattr(cls, "__dataclass_fields__", {})
    )


def logit_head_capable():
    """Registry names of models with the ``logit_head`` field — the five
    whose reference forward ends in a constant softmax or a sigmoid that
    the training loop double-squashes (BARUNet.py:83, BIARUNet.py:89,
    BCDUNet.py:144/251, RetinaLiteNet.py:194-197).  With the field set
    they return the pre-activation head instead (CLI ``--logit-head``,
    additive; identical parameter tree)."""
    return sorted(
        name for name, cls in MODEL_REGISTRY.items()
        if "logit_head" in getattr(cls, "__dataclass_fields__", {})
    )
