"""Minimal timm shim: no timm wheel in this image; the reference imports
exactly one symbol (``from timm.layers import trunc_normal_``,
unet_parts.py:14, used by InitWeights_He at 594-614).  torch.nn.init has
an identical trunc_normal_ — re-export it."""
