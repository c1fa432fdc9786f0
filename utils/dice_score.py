"""Compat re-export of the on-device dice numerics (the reference's
utils/dice_score.py surface)."""
from jcfszxc_unet_tpu.train.losses import (  # noqa: F401
    dice_coeff,
    dice_loss,
    multiclass_dice_coeff,
)
