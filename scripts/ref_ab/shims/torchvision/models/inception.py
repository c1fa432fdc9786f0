"""BasicConv2d exactly as torchvision.models.inception defines it
(conv bias=False -> BN eps=0.001 -> relu inplace) — the one torchvision
symbol the reference uses (unet_parts.py:13, InceptionA at 396-422)."""

import torch.nn as nn
import torch.nn.functional as F


class BasicConv2d(nn.Module):
    def __init__(self, in_channels: int, out_channels: int, **kwargs) -> None:
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, bias=False, **kwargs)
        self.bn = nn.BatchNorm2d(out_channels, eps=0.001)

    def forward(self, x):
        x = self.conv(x)
        x = self.bn(x)
        return F.relu(x, inplace=True)
