"""Generic PyTorch-state_dict -> Flax-variables mapping for the model zoo.

The reference framework's checkpoint artifact is a whole pickled nn.Module
(reference train.py:374, consumed at evaluate.py:421).  This module maps any
reference model's ``state_dict()`` onto our Flax variable trees, making the
rebuild genuinely drop-in against reference-trained weights.

Design: a recursive rules engine.  Every Flax block class we wrote (one per
reference block, ops/blocks.py) gets a CHILD_RULES entry translating its
auto-named Flax children ("Conv2d_0", "BatchNorm2d_1", ...) into the torch
child path inside the corresponding reference block ("double_conv.0",
"conv.4", ...).  Per-model ROOT tables translate the top-level module names
(mostly identity — our models deliberately reuse the reference's attribute
names).  Weight transforms at the leaves:

  * Conv2d:          torch (O,I,kh,kw)  -> flax kernel (kh,kw,I,O)
  * ConvTranspose2d: torch (I,O,kh,kw)  -> flax kernel (kh,kw,I,O), spatially
                     flipped (flax convT is an unflipped correlation)
  * Linear:          torch (O,I)        -> flax kernel (I,O)
  * BatchNorm:       weight/bias/running_mean/running_var ->
                     scale/bias + batch_stats mean/var
  * MultiheadAttention: in_proj_weight/bias + out_proj (transposed)

Unmatched torch keys are errors unless listed in EXPECTED_UNUSED (parameters
the reference defines but never uses in forward, e.g. FRUNet's dead ``fuse``
head, FRUNet.py:105 vs the forward at 108-138).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Leaf transforms
# ---------------------------------------------------------------------------

_AUTO_NAME = re.compile(r"^(.+)_(\d+)$")

LEAF_CLASSES = {"Conv2d", "ConvTranspose2d", "BatchNorm2d", "BatchNorm1d",
                "Linear"}


def _seg_class(seg: str) -> Tuple[str, int]:
    """Split a Flax auto-name "Conv2d_3" -> ("Conv2d", 3)."""
    m = _AUTO_NAME.match(seg)
    if m and m.group(1) in _KNOWN_CLASSES:
        return m.group(1), int(m.group(2))
    return seg, -1


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _fill_conv(out, flax_sub, prefix, take, transposed: bool):
    kernel = take(prefix + ".weight")
    out["conv"] = {"kernel": _convt_kernel(kernel) if transposed
                   else _conv_kernel(kernel)}
    if "bias" in flax_sub["conv"]:
        out["conv"]["bias"] = take(prefix + ".bias")


def _fill_bn(out_params, out_stats, prefix, take):
    out_params["bn"] = {"scale": take(prefix + ".weight"),
                        "bias": take(prefix + ".bias")}
    out_stats["bn"] = {"mean": take(prefix + ".running_mean"),
                       "var": take(prefix + ".running_var")}


def _fill_linear(out, flax_sub, prefix, take):
    out["linear"] = {"kernel": np.ascontiguousarray(take(prefix + ".weight").T)}
    if "bias" in flax_sub["linear"]:
        out["linear"]["bias"] = take(prefix + ".bias")


# ---------------------------------------------------------------------------
# Per-class child rules.  Value: dict flax_child_segment -> (torch_rel, class)
# or a callable (seg, idx, siblings) -> (torch_rel, class).
# ---------------------------------------------------------------------------


def _ba_module_rule(seg, idx, siblings):
    # reference BA_module_resnet (unet_parts.py:188-224): cur_fusion =
    # Sequential(Linear, BN1d); pre_fusions = ModuleList of the same;
    # generation = Sequential(ReLU, Linear) -> generation.1.
    cls, i = _seg_class(seg)
    if cls == "Linear":
        n_lin = sum(1 for s in siblings if _seg_class(s)[0] == "Linear")
        if i == 0:
            return "cur_fusion.0", "Linear"
        if i == n_lin - 1:
            return "generation.1", "Linear"
        return f"pre_fusions.{i - 1}.0", "Linear"
    if cls == "BatchNorm1d":
        if i == 0:
            return "cur_fusion.1", "BatchNorm1d"
        return f"pre_fusions.{i - 1}.1", "BatchNorm1d"
    raise KeyError(seg)


CHILD_RULES: Dict[str, Any] = {
    # reference unet_parts.py:17-34
    "DoubleConv": {"Conv2d_0": ("double_conv.0", "Conv2d"),
                   "BatchNorm2d_0": ("double_conv.1", "BatchNorm2d"),
                   "Conv2d_1": ("double_conv.3", "Conv2d"),
                   "BatchNorm2d_1": ("double_conv.4", "BatchNorm2d")},
    # unet_parts.py:37-47
    "Down": {"DoubleConv_0": ("maxpool_conv.1", "DoubleConv")},
    # unet_parts.py:50-70
    "Up": {"ConvTranspose2d_0": ("up", "ConvTranspose2d"),
           "DoubleConv_0": ("conv", "DoubleConv")},
    # unet_parts.py:73-79
    "OutConv": {"Conv2d_0": ("conv", "Conv2d")},
    # conv_block, unet_parts.py:82-96
    "ConvBlockBN": {"Conv2d_0": ("conv.0", "Conv2d"),
                    "BatchNorm2d_0": ("conv.1", "BatchNorm2d"),
                    "Conv2d_1": ("conv.3", "Conv2d"),
                    "BatchNorm2d_1": ("conv.4", "BatchNorm2d")},
    # up_conv, unet_parts.py:99-111
    "UpConvBlock": {"Conv2d_0": ("up.1", "Conv2d"),
                    "BatchNorm2d_0": ("up.2", "BatchNorm2d")},
    # Recurrent_block, unet_parts.py:114-132
    "RecurrentBlock": {"Conv2d_0": ("conv.0", "Conv2d"),
                       "BatchNorm2d_0": ("conv.1", "BatchNorm2d")},
    # RRCNN_block, unet_parts.py:135-146
    "RRCNNBlock": {"Conv2d_0": ("Conv_1x1", "Conv2d"),
                   "RecurrentBlock_0": ("RCNN.0", "RecurrentBlock"),
                   "RecurrentBlock_1": ("RCNN.1", "RecurrentBlock")},
    # Attention_block, unet_parts.py:149-176
    "AttentionBlock": {"Conv2d_0": ("W_g.0", "Conv2d"),
                       "BatchNorm2d_0": ("W_g.1", "BatchNorm2d"),
                       "Conv2d_1": ("W_x.0", "Conv2d"),
                       "BatchNorm2d_1": ("W_x.1", "BatchNorm2d"),
                       "Conv2d_2": ("psi.0", "Conv2d"),
                       "BatchNorm2d_2": ("psi.1", "BatchNorm2d")},
    # BA_module_resnet, unet_parts.py:188-224
    "BAModule": _ba_module_rule,
    # BABasicBlock, unet_parts.py:227-275
    "BABasicBlock": {"Conv2d_0": ("conv1", "Conv2d"),
                     "BatchNorm2d_0": ("bn1", "BatchNorm2d"),
                     "Conv2d_1": ("conv2", "Conv2d"),
                     "BatchNorm2d_1": ("bn2", "BatchNorm2d"),
                     "BAModule_0": ("ba", "BAModule"),
                     "Conv2d_2": ("conv3", "Conv2d")},
    # CBAM + submodules, unet_parts.py:278-322
    "CBAM": {"ChannelAttentionModule_0": ("channel_attention",
                                          "ChannelAttentionModule"),
             "SpatialAttentionModule_0": ("spatial_attention",
                                          "SpatialAttentionModule")},
    "ChannelAttentionModule": {"Conv2d_0": ("shared_MLP.0", "Conv2d"),
                               "Conv2d_1": ("shared_MLP.2", "Conv2d")},
    "SpatialAttentionModule": {"Conv2d_0": ("conv2d", "Conv2d")},
    # RetinaLiteNet's private copies (RetinaLiteNet.py:16-68): lowercase
    # shared_mlp, bias-free spatial conv named "conv".
    "PrivateCBAM": {"channel_att": ("channel_att", "PrivateChannelAtt"),
                    "spatial_att": ("spatial_att", "PrivateSpatialAtt")},
    "PrivateChannelAtt": {"Conv2d_0": ("shared_mlp.0", "Conv2d"),
                          "Conv2d_1": ("shared_mlp.2", "Conv2d")},
    "PrivateSpatialAtt": {"Conv2d_0": ("conv", "Conv2d")},
    # se_block, unet_parts.py:325-343
    "SEBlock": {"Linear_0": ("fc.0", "Linear"),
                "Linear_1": ("fc.2", "Linear")},
    # Single_level_densenet, unet_parts.py:346-367
    "SingleLevelDensenet": lambda seg, idx, siblings: (
        (f"conv_list.{idx}", "Conv2d") if seg.startswith("Conv2d_")
        else (f"bn_list.{idx}", "BatchNorm2d")),
    # Upsample_n_Concat, unet_parts.py:380-393
    "UpsampleNConcat": {"ConvTranspose2d_0": ("upsample_layer",
                                              "ConvTranspose2d"),
                        "Conv2d_0": ("conv", "Conv2d"),
                        "BatchNorm2d_0": ("bn", "BatchNorm2d")},
    # torchvision BasicConv2d (used by InceptionA, unet_parts.py:396-422)
    "BasicConv2d": {"Conv2d_0": ("conv", "Conv2d"),
                    "BatchNorm2d_0": ("bn", "BatchNorm2d")},
    # InceptionA branch order mirrors our execution order (y1..y4)
    "InceptionA": {"BasicConv2d_0": ("b1_2", "BasicConv2d"),
                   "BasicConv2d_1": ("b2", "BasicConv2d"),
                   "BasicConv2d_2": ("b3_1", "BasicConv2d"),
                   "BasicConv2d_3": ("b3_2", "BasicConv2d"),
                   "BasicConv2d_4": ("b4_1", "BasicConv2d"),
                   "BasicConv2d_5": ("b4_2", "BasicConv2d"),
                   "BasicConv2d_6": ("b4_3", "BasicConv2d")},
    # Up_v1, unet_parts.py:425-451
    "UpV1": {"ConvTranspose2d_0": ("up", "ConvTranspose2d"),
             "DoubleConv_0": ("conv", "DoubleConv")},
    # ResidualConv, unet_parts.py:454-475
    "ResidualConv": {"BatchNorm2d_0": ("conv_block.0", "BatchNorm2d"),
                     "Conv2d_0": ("conv_block.2", "Conv2d"),
                     "BatchNorm2d_1": ("conv_block.3", "BatchNorm2d"),
                     "Conv2d_1": ("conv_block.5", "Conv2d"),
                     "Conv2d_2": ("conv_skip.0", "Conv2d"),
                     "BatchNorm2d_2": ("conv_skip.1", "BatchNorm2d")},
    # Upsample (ResUNet), unet_parts.py:478-487
    "UpsampleT": {"ConvTranspose2d_0": ("upsample", "ConvTranspose2d")},
    # FRUNet conv, unet_parts.py:490-507
    "FRConv": {"Conv2d_0": ("conv.0", "Conv2d"),
               "BatchNorm2d_0": ("conv.1", "BatchNorm2d"),
               "Conv2d_1": ("conv.4", "Conv2d"),
               "BatchNorm2d_1": ("conv.5", "BatchNorm2d")},
    # feature_fuse, unet_parts.py:510-525
    "FeatureFuse": {"Conv2d_0": ("conv11", "Conv2d"),
                    "Conv2d_1": ("conv33", "Conv2d"),
                    "Conv2d_2": ("conv33_di", "Conv2d"),
                    "BatchNorm2d_0": ("norm", "BatchNorm2d")},
    # up / down, unet_parts.py:528-555
    "FRUp": {"ConvTranspose2d_0": ("up.0", "ConvTranspose2d"),
             "BatchNorm2d_0": ("up.1", "BatchNorm2d")},
    "FRDown": {"Conv2d_0": ("down.0", "Conv2d"),
               "BatchNorm2d_0": ("down.1", "BatchNorm2d")},
    # block (FRUNet grid node), unet_parts.py:558-591
    "FRBlock": {"FeatureFuse_0": ("fuse", "FeatureFuse"),
                "Conv2d_0": ("fuse", "Conv2d"),  # fuse=False variant
                "FRConv_0": ("conv", "FRConv"),
                "FRUp_0": ("up", "FRUp"),
                "FRDown_0": ("down", "FRDown")},
    # Conv2d_batchnorm, unet_parts.py:617-656
    "Conv2dBatchnorm": {"Conv2d_0": ("conv1", "Conv2d"),
                        "BatchNorm2d_0": ("batchnorm", "BatchNorm2d")},
    # Multiresblock, unet_parts.py:659-715 (our execution order: shortcut,
    # 3x3, 5x5, 7x7, bn1, bn2)
    "Multiresblock": {"Conv2dBatchnorm_0": ("shortcut", "Conv2dBatchnorm"),
                      "Conv2dBatchnorm_1": ("conv_3x3", "Conv2dBatchnorm"),
                      "Conv2dBatchnorm_2": ("conv_5x5", "Conv2dBatchnorm"),
                      "Conv2dBatchnorm_3": ("conv_7x7", "Conv2dBatchnorm"),
                      "BatchNorm2d_0": ("batch_norm1", "BatchNorm2d"),
                      "BatchNorm2d_1": ("batch_norm2", "BatchNorm2d")},
    # Respath, unet_parts.py:718-791 (our children are custom-named)
    "Respath": lambda seg, idx, siblings: (
        (f"shortcuts.{seg.split('_')[1]}", "Conv2dBatchnorm")
        if seg.startswith("shortcut_") else
        (f"convs.{seg.split('_')[1]}", "Conv2dBatchnorm")
        if seg.startswith("conv_") else
        (f"bns.{seg.split('_')[1]}", "BatchNorm2d")),
    # BCDUNet ConvBlock, unet_parts.py:794-806
    "ConvBlockPlain": {"Conv2d_0": ("conv.0", "Conv2d"),
                       "Conv2d_1": ("conv.2", "Conv2d")},
    # ConvLSTM2D(+Cell), unet_parts.py:809-869
    "ConvLSTM2D": {"Conv2d_0": ("cell.conv", "Conv2d")},
    # UpConv, unet_parts.py:872-885
    "UpConvT": {"ConvTranspose2d_0": ("up.0", "ConvTranspose2d"),
                "BatchNorm2d_0": ("up.1", "BatchNorm2d")},
    # nn.MultiheadAttention wrapper (RetinaLiteNet.py:72-80) — handled
    # specially in the engine (leaf-level key names differ).
    "MultiHeadSelfAttention": None,
}

_KNOWN_CLASSES = set(CHILD_RULES) | LEAF_CLASSES


# ---------------------------------------------------------------------------
# Per-model root tables: flax top-level name -> (torch name, class).
# "@same" recurses with the same root table and no prefix (transparent
# wrapper modules like BCDUNet's encoder/decoder).
# ---------------------------------------------------------------------------


def _root_unet(seg):
    if seg == "inc":
        return seg, "DoubleConv"
    if seg.startswith("down"):
        return seg, "Down"
    if seg.startswith("up"):
        return seg, "Up"
    if seg == "outc":
        return seg, "OutConv"
    raise KeyError(seg)


def _root_attention_unet(seg):
    if seg.startswith("Up_conv"):
        return seg, "ConvBlockBN"
    if seg.startswith("Att"):
        return seg, "AttentionBlock"
    if seg == "Conv_1x1":
        return seg, "Conv2d"
    if seg.startswith("Conv"):
        return seg, "ConvBlockBN"
    if seg.startswith("Up"):
        return seg, "UpConvBlock"
    raise KeyError(seg)


def _root_r2(seg):
    if seg.startswith("RRCNN") or seg.startswith("Up_RRCNN"):
        return seg, "RRCNNBlock"
    if seg.startswith("Att"):
        return seg, "AttentionBlock"
    if seg == "Conv_1x1":
        return seg, "Conv2d"
    if seg.startswith("Up"):
        return seg, "UpConvBlock"
    raise KeyError(seg)


def _root_barunet(seg):
    if seg == "Conv1":
        return seg, "ConvBlockBN"
    if seg.startswith("Up_conv"):
        return seg, "ConvBlockBN"
    if seg == "Conv_1x1":
        return seg, "Conv2d"
    if seg.startswith("Conv"):
        return seg, "BABasicBlock"
    if seg.startswith("cbam"):
        return seg, "CBAM"
    if seg.startswith("SE"):
        return seg, "SEBlock"
    if seg.startswith("Up"):
        return seg, "UpConvBlock"
    raise KeyError(seg)


def _root_denseunet(seg):
    if seg == "conv1" or seg == "outconv":
        return seg, "Conv2d"
    if seg.startswith("up"):
        return seg, "UpsampleNConcat"
    if seg in ("bottom",) or seg[0] in "du":
        return seg, "SingleLevelDensenet"
    raise KeyError(seg)


def _root_mcunet(seg):
    if seg == "in_conv":
        return seg, "DoubleConv"
    if seg == "down4":
        return seg, "InceptionA"
    if seg.startswith("down"):
        return seg, "Down"
    if seg.startswith("cbam"):
        return seg, "CBAM"
    if seg.startswith("up"):
        return seg, "UpV1"
    if seg == "out_conv":
        return seg, "OutConv"
    raise KeyError(seg)


def _root_resunet(seg):
    table = {"input_conv1": ("input_layer.0", "Conv2d"),
             "input_bn": ("input_layer.1", "BatchNorm2d"),
             "input_conv2": ("input_layer.3", "Conv2d"),
             "input_skip": ("input_skip.0", "Conv2d"),
             "output_layer": ("output_layer.0", "Conv2d")}
    if seg in table:
        return table[seg]
    if seg.startswith("upsample_"):
        return seg, "UpsampleT"
    if seg.startswith("residual_conv") or seg == "bridge" or \
            seg.startswith("up_residual_conv"):
        return seg, "ResidualConv"
    raise KeyError(seg)


def _root_frunet(seg):
    if seg.startswith("block"):
        return seg, "FRBlock"
    if seg.startswith("final"):
        return seg, "Conv2d"
    raise KeyError(seg)


def _root_multires(seg):
    if seg.startswith("multiresblock"):
        return seg, "Multiresblock"
    if seg.startswith("respath"):
        return seg, "Respath"
    if seg.startswith("upsample"):
        return seg, "ConvTranspose2d"
    if seg == "conv_final":
        return seg, "Conv2dBatchnorm"
    raise KeyError(seg)


def _root_segnet(seg):
    if seg.startswith("conv"):
        return seg, "Conv2d"
    if seg.startswith("bn"):
        return seg, "BatchNorm2d"
    raise KeyError(seg)


def _root_bcdu(seg):
    if seg in ("encoder", "decoder"):
        return "", "@same"
    if seg.startswith("conv_lstm"):
        return seg, "ConvLSTM2D"
    if seg in ("conv1", "conv2", "conv3", "conv6", "conv7"):
        return seg, "ConvBlockPlain"
    if seg in ("up6", "up7", "up8"):
        return seg, "UpConvT"
    # conv8 is a Sequential(conv, relu, conv, relu, conv, relu) in the
    # reference (BCDUNet.py); ours are three named convs.
    table = {"conv8_1": ("conv8.0", "Conv2d"),
             "conv8_2": ("conv8.2", "Conv2d"),
             "conv8_3": ("conv8.4", "Conv2d")}
    if seg in table:
        return table[seg]
    if seg.startswith("conv"):  # conv4, conv4_1, ..., conv9: bare convs
        return seg, "Conv2d"
    raise KeyError(seg)


def _root_transfuse(seg):
    m = re.match(r"^conv_block(\d)_conv$", seg)
    if m:
        return f"conv_block{m.group(1)}.0", "Conv2d"
    m = re.match(r"^conv_block(\d)_bn$", seg)
    if m:
        return f"conv_block{m.group(1)}.3", "BatchNorm2d"
    if seg == "multihead_attention":
        return seg, "MultiHeadSelfAttention"
    if seg.startswith("cbam"):
        return seg, "PrivateCBAM"
    if seg == "decoder_block3_conv":
        return "decoder_block3.2", "Conv2d"
    if seg.startswith("decoder_block"):
        return f"{seg}.0", "ConvTranspose2d"
    if seg.startswith("decoder_conv"):
        return f"{seg}.0", "Conv2d"
    if seg in ("output_BV", "output_OD"):
        return seg, "Conv2d"
    raise KeyError(seg)


def _root_nested(seg):
    if seg.startswith("conv"):
        return seg, "DoubleConvBias"
    if seg.startswith("final"):
        return seg, "Conv2d"
    raise KeyError(seg)


# UNetPP's private DoubleConv has convs WITH bias (UNetPP.py:15-28)
CHILD_RULES["DoubleConvBias"] = {"Conv2d_0": ("conv.0", "Conv2d"),
                                 "BatchNorm2d_0": ("conv.1", "BatchNorm2d"),
                                 "Conv2d_1": ("conv.3", "Conv2d"),
                                 "BatchNorm2d_1": ("conv.4", "BatchNorm2d")}
_KNOWN_CLASSES.add("DoubleConvBias")

ROOT_RULES: Dict[str, Callable] = {
    "UNet.UNet": _root_unet,
    "AttentionUNet.AttentionUNet": _root_attention_unet,
    "R2UNet.R2UNet": _root_r2,
    "R2AttentionUNet.R2AttentionUNet": _root_r2,
    "BARUNet.BARUNet": _root_barunet,
    "BIARUNet.BIARUNet": _root_barunet,
    "DenseUNet.DenseUNet": _root_denseunet,
    "MCUNet.MCUNet": _root_mcunet,
    "ResUNet.ResUNet": _root_resunet,
    "FRUNet.FRUNet": _root_frunet,
    "MultiResUNet.MultiResUNet": _root_multires,
    "SegNet.SegNet": _root_segnet,
    "BCDUNet.BCDU_net_D3": _root_bcdu,
    "BCDUNet.BCDU_net_D1": _root_bcdu,
    "RetinaLiteNet.TransFuseNet": _root_transfuse,
    "UNetPP.NestedUNet": _root_nested,
}

# torch parameters the reference defines but never uses in forward —
# tolerated as unconsumed keys (regex, and excluded from param-count
# parity).
EXPECTED_UNUSED: Dict[str, Tuple[str, ...]] = {
    # FRUNet.py:105: the top-level self.fuse head is dead (forward averages
    # final1..5), and every grid ``block`` with in_c == out_c creates a
    # self.fuse it never applies (unet_parts.py:563-566 vs forward at 577);
    # any block*.fuse.* key left unconsumed after mapping is such a dead one.
    "FRUNet.FRUNet": (r"^fuse\.", r"^block[0-9_]+\.fuse\."),
}


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


class MappingError(RuntimeError):
    pass


# Classes handled at the leaf level by a mapping direction's ``visit``
# callback (everything with its own torch parameter/buffer key scheme).
_VISIT_CLASSES = LEAF_CLASSES | {"MultiHeadSelfAttention"}


def _walk(flax_params, flax_stats, cls, prefix, root_rule, model_name, visit):
    """Shared structural traversal for BOTH mapping directions.

    Descends a Flax (params, batch_stats) subtree pair by the rule tables,
    computing each node's torch key prefix, and calls
    ``visit(cls, prefix, params_sub, stats_sub)`` at every torch-leaf-class
    node; returns the (params_tree, stats_tree) assembled from visit's
    (params, stats) returns (export visits return empty trees).
    """
    if cls in _VISIT_CLASSES:
        return visit(cls, prefix, flax_params, flax_stats)
    rules = root_rule if cls == "@same" else CHILD_RULES[cls]
    siblings = list(flax_params.keys())
    out_params, out_stats = {}, {}
    for seg, sub_params in flax_params.items():
        sub_stats = flax_stats.get(seg, {}) if flax_stats else {}
        if cls == "@same":
            rel, sub_cls = root_rule(seg)
        elif callable(rules):
            _, idx = _seg_class(seg)
            rel, sub_cls = rules(seg, idx, siblings)
        else:
            if seg not in rules:
                raise MappingError(
                    f"no rule for child {seg!r} of class {cls!r} "
                    f"(prefix {prefix!r}, model {model_name})")
            rel, sub_cls = rules[seg]
        sub_prefix = f"{prefix}.{rel}" if prefix and rel else \
            (prefix or rel)
        op, os_ = _walk(sub_params, sub_stats, sub_cls, sub_prefix,
                        root_rule, model_name, visit)
        out_params[seg] = op
        if os_:
            out_stats[seg] = os_
    # batch_stats-only children (BN wrappers whose params subtree is
    # empty cannot occur: BN always has scale/bias params).
    return out_params, out_stats


def state_dict_to_variables(model_name: str, state_dict: Dict[str, Any],
                            flax_variables_template: Dict[str, Any],
                            return_info: bool = False):
    """Map a torch ``state_dict`` onto {"params", "batch_stats"} matching
    ``flax_variables_template`` (e.g. from ``jax.eval_shape(model.init, ...)``).

    Raises MappingError on any unmatched flax leaf or torch key (except
    EXPECTED_UNUSED and num_batches_tracked).  With ``return_info`` also
    returns {"consumed": set, "unused": list} — the reference keys left
    behind (its documented dead parameters).
    """
    if model_name not in ROOT_RULES:
        raise MappingError(f"no mapping rules for model {model_name!r}")
    # NOTE .numpy() aliases the live torch buffers (BN running stats mutate
    # in place on later torch forwards) — copy to snapshot.
    sd = {k: (v.detach().cpu().numpy().copy() if hasattr(v, "detach")
              else np.array(v))
          for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    consumed = set()

    def take(key):
        if key not in sd:
            raise MappingError(f"torch key {key!r} not found "
                               f"(model {model_name})")
        consumed.add(key)
        return sd[key]

    params_t = flax_variables_template.get("params", {})
    stats_t = flax_variables_template.get("batch_stats", {})

    def import_visit(cls, prefix, flax_params, flax_stats):
        """Translate one torch-leaf flax node (params + stats subtrees)."""
        out_params: Dict[str, Any] = {}
        out_stats: Dict[str, Any] = {}
        if cls == "Conv2d" or cls == "ConvTranspose2d":
            _fill_conv(out_params, flax_params, prefix, take,
                       transposed=(cls == "ConvTranspose2d"))
        elif cls in ("BatchNorm2d", "BatchNorm1d"):
            _fill_bn(out_params, out_stats, prefix, take)
        elif cls == "Linear":
            _fill_linear(out_params, flax_params, prefix, take)
        else:  # MultiHeadSelfAttention
            # torch wrapper: self.mha = nn.MultiheadAttention
            # (RetinaLiteNet.py:75); state_dict keys <p>.mha.in_proj_weight,
            # <p>.mha.in_proj_bias, <p>.mha.out_proj.{weight,bias}
            out_params["in_proj"] = {
                "kernel": np.ascontiguousarray(
                    take(prefix + ".mha.in_proj_weight").T),
                "bias": take(prefix + ".mha.in_proj_bias"),
            }
            out_params["out_proj"] = {
                "kernel": np.ascontiguousarray(
                    take(prefix + ".mha.out_proj.weight").T),
                "bias": take(prefix + ".mha.out_proj.bias"),
            }
        _check_shapes(flax_params, out_params, prefix)
        return out_params, out_stats

    try:
        out_params, out_stats = _walk(
            params_t, stats_t, "@same", "", ROOT_RULES[model_name],
            model_name, import_visit)
    except KeyError as e:  # root-rule misses raise bare KeyError
        raise MappingError(f"no root rule for {e} in model {model_name}") from e

    unused = set(sd) - consumed
    allowed = [re.compile(p) for p in EXPECTED_UNUSED.get(model_name, ())]
    leftover = [k for k in sorted(unused)
                if not any(p.search(k) for p in allowed)]
    if leftover:
        raise MappingError(
            f"{len(leftover)} torch keys unmatched for {model_name}: "
            f"{leftover[:8]}...")
    variables = {"params": out_params, "batch_stats": out_stats}
    if return_info:
        return variables, {"consumed": consumed, "unused": sorted(unused)}
    return variables


def variables_to_state_dict(model_name: str, variables: Dict[str, Any]
                            ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`state_dict_to_variables`: map Flax variables back to
    a torch ``state_dict`` (plain dict of numpy arrays) loadable by the
    actual reference nn.Module — the "eject path" of the migration story
    (train here, hand a checkpoint back to the reference's torch tooling).

    The weight transforms are lossless transposes/flips, so
    import-then-export round-trips bit-exactly (test_torch_export.py).
    Notes:
      * BN ``num_batches_tracked`` buffers are emitted as 0 — they are inert
        under the zoo's momentum-EMA BatchNorms (torch only reads them when
        ``momentum=None``).
      * Parameters the reference defines but never uses in forward
        (EXPECTED_UNUSED, e.g. FRUNet's dead ``fuse`` head, FRUNet.py:105)
        have no Flax counterpart and are absent — load those models with
        ``strict=False``; the forward is unaffected.
      * Float leaves that are neither f32 nor f64 (e.g. bf16 compute params)
        are cast to f32, the reference modules' parameter dtype.
    """
    if model_name not in ROOT_RULES:
        raise MappingError(f"no mapping rules for model {model_name!r}")
    out: Dict[str, np.ndarray] = {}

    def emit(key: str, arr) -> None:
        if key in out:
            raise MappingError(f"duplicate torch key {key!r} "
                               f"(model {model_name})")
        a = np.asarray(arr)
        if a.dtype not in (np.float32, np.float64, np.int64):
            a = a.astype(np.float32)
        out[key] = np.ascontiguousarray(a)

    def export_visit(cls, prefix, flax_params, flax_stats):
        if cls == "Conv2d":
            # flax (kh,kw,I,O) -> torch (O,I,kh,kw)
            emit(prefix + ".weight",
                 np.transpose(flax_params["conv"]["kernel"], (3, 2, 0, 1)))
            if "bias" in flax_params["conv"]:
                emit(prefix + ".bias", flax_params["conv"]["bias"])
        elif cls == "ConvTranspose2d":
            # undo _convt_kernel: spatial flip, then (kh,kw,I,O)->(I,O,kh,kw)
            k = np.asarray(flax_params["conv"]["kernel"])[::-1, ::-1]
            emit(prefix + ".weight", np.transpose(k, (2, 3, 0, 1)))
            if "bias" in flax_params["conv"]:
                emit(prefix + ".bias", flax_params["conv"]["bias"])
        elif cls in ("BatchNorm2d", "BatchNorm1d"):
            emit(prefix + ".weight", flax_params["bn"]["scale"])
            emit(prefix + ".bias", flax_params["bn"]["bias"])
            emit(prefix + ".running_mean", flax_stats["bn"]["mean"])
            emit(prefix + ".running_var", flax_stats["bn"]["var"])
            emit(prefix + ".num_batches_tracked", np.array(0, np.int64))
        elif cls == "Linear":
            emit(prefix + ".weight",
                 np.asarray(flax_params["linear"]["kernel"]).T)
            if "bias" in flax_params["linear"]:
                emit(prefix + ".bias", flax_params["linear"]["bias"])
        else:  # MultiHeadSelfAttention (key scheme: import_visit above)
            emit(prefix + ".mha.in_proj_weight",
                 np.asarray(flax_params["in_proj"]["kernel"]).T)
            emit(prefix + ".mha.in_proj_bias", flax_params["in_proj"]["bias"])
            emit(prefix + ".mha.out_proj.weight",
                 np.asarray(flax_params["out_proj"]["kernel"]).T)
            emit(prefix + ".mha.out_proj.bias",
                 flax_params["out_proj"]["bias"])
        return {}, {}

    try:
        _walk(variables.get("params", {}), variables.get("batch_stats", {}),
              "@same", "", ROOT_RULES[model_name], model_name, export_visit)
    except KeyError as e:  # root-rule misses raise bare KeyError
        raise MappingError(f"no root rule for {e} in model {model_name}") from e
    return out


def _check_shapes(flax_sub, out_sub, prefix):
    """Assert imported array shapes equal the template's (catches wrong
    pairings loudly instead of failing deep inside XLA)."""
    def rec(t, o, path):
        for k, v in t.items():
            if k not in o:
                raise MappingError(f"missing leaf {path}/{k} at {prefix!r}")
            if hasattr(v, "shape"):
                if tuple(v.shape) != tuple(o[k].shape):
                    raise MappingError(
                        f"shape mismatch at {path}/{k} ({prefix!r}): "
                        f"flax {tuple(v.shape)} vs torch {tuple(o[k].shape)}")
            else:
                rec(v, o[k], f"{path}/{k}")
    rec(flax_sub, out_sub, "")
