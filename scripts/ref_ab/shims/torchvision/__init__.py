"""Minimal torchvision shim: this image has no torchvision wheel, and the
reference's block library imports exactly one symbol from it
(``from torchvision.models.inception import BasicConv2d``,
reference UNetFamily/utils/unet_parts.py:13).  Provides just that."""
