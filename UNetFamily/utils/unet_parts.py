"""Compat re-export of the TPU-native block library with the reference's
original block spellings (reference: UNetFamily/utils/unet_parts.py), so
``from UNetFamily.utils.unet_parts import conv_block, Attention_block, ...``
works unchanged against the Flax implementations."""

from jcfszxc_unet_tpu.ops.blocks import *  # noqa: F401,F403
from jcfszxc_unet_tpu.ops.blocks import (
    AttentionBlock,
    BABasicBlock,
    BAModule,
    BasicConv2d,
    CBAM,
    ChannelAttentionModule,
    Conv2dBatchnorm,
    ConvBlockBN,
    ConvBlockPlain,
    ConvLSTM2D,
    DoubleConv,
    Down,
    FRBlock,
    FRConv,
    FRDown,
    FRUp,
    FeatureFuse,
    InceptionA,
    Multiresblock,
    OutConv,
    RecurrentBlock,
    Respath,
    ResidualConv,
    RRCNNBlock,
    SEBlock,
    SingleLevelDensenet,
    SpatialAttentionModule,
    Up,
    UpConvBlock,
    UpConvT,
    UpV1,
    UpsampleNConcat,
    UpsampleT,
    down_sample,
)
from jcfszxc_unet_tpu.ops.layers import (  # noqa: F401
    Conv2d,
    max_pool2d,
    max_pool2d_with_indices,
    max_unpool2d,
    upsample_bilinear,
    upsample_nearest,
)


# --- reference-spelled aliases (unet_parts.py class names) ---------------
conv_block = ConvBlockBN                  # unet_parts.py:82
up_conv = UpConvBlock                     # unet_parts.py:99
Recurrent_block = RecurrentBlock          # unet_parts.py:114
RRCNN_block = RRCNNBlock                  # unet_parts.py:135
Attention_block = AttentionBlock          # unet_parts.py:149
BA_module_resnet = BAModule               # unet_parts.py:188
se_block = SEBlock                        # unet_parts.py:325
Single_level_densenet = SingleLevelDensenet  # unet_parts.py:346
Down_sample = down_sample                 # unet_parts.py:370 (param-free)
Upsample_n_Concat = UpsampleNConcat       # unet_parts.py:380
Up_v1 = UpV1                              # unet_parts.py:425
Upsample = UpsampleT                      # unet_parts.py:478
conv = FRConv                             # unet_parts.py:490
feature_fuse = FeatureFuse                # unet_parts.py:510
up = FRUp                                 # unet_parts.py:528
down = FRDown                             # unet_parts.py:544
block = FRBlock                           # unet_parts.py:558
Conv2d_batchnorm = Conv2dBatchnorm        # unet_parts.py:617
ConvBlock = ConvBlockPlain                # unet_parts.py:794
UpConv = UpConvT                          # unet_parts.py:872


def conv1x1(ch_in, ch_out, stride=1):
    """1x1 conv helper (unet_parts.py:179-181)."""
    return Conv2d(ch_in, ch_out, 1, stride=stride, use_bias=False)


def conv3x3(ch_in, ch_out, stride=1):
    """3x3 conv helper (unet_parts.py:184-185)."""
    return Conv2d(ch_in, ch_out, 3, stride=stride, padding=1, use_bias=False)


class InitWeights_He:
    """API stub for the reference's init callable (unet_parts.py:594-614).

    In the reference it is applied as ``self.apply(InitWeights_He)`` —
    passing the class, not an instance — so it never actually initializes
    anything (FRUNet.py:106); PyTorch defaults win.  The TPU framework
    matches those defaults directly (ops/initializers.py), so this exists
    only so reference-style imports keep working."""

    def __init__(self, neg_slope=1e-2):
        self.neg_slope = neg_slope

    def __call__(self, module):
        return module
