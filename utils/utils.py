"""Compat re-export of seeding/visualization helpers (the reference's
utils/utils.py surface)."""
from jcfszxc_unet_tpu.utils.seed import set_deterministic_mode, set_seed  # noqa: F401
from jcfszxc_unet_tpu.utils.vis import vis_numpy_img  # noqa: F401
