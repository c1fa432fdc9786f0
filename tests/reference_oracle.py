"""Load the reference PyTorch models (/root/reference) as test oracles.

The strongest available parity evidence is comparing our Flax models against
the *actual* reference nn.Modules, not hand-rolled re-creations.  The
reference imports two symbols this image lacks; per the environment rules we
stub them (both have tiny, documented public semantics):

  * ``torchvision.models.inception.BasicConv2d`` — Conv2d(bias=False) ->
    BatchNorm2d(eps=0.001) -> relu (used by InceptionA, unet_parts.py:396-422)
  * ``timm.layers.trunc_normal_`` — torch.nn.init.trunc_normal_ re-export
    (used only by the reference's dead InitWeights_He, unet_parts.py:594-614)

The loader runs with a temporarily patched ``sys.modules`` so the reference's
``UNetFamily`` namespace package never collides with this repo's compat shim
of the same name, then restores the originals.  Everything is cached after
the first call.  Tests must skip when /root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_cache = {}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "UNetFamily"))


def _install_stubs():
    """Register torchvision/timm stubs (only if the real ones are absent)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    if "torchvision" not in sys.modules:
        class BasicConv2d(tnn.Module):
            # torchvision.models.inception.BasicConv2d public semantics:
            # conv(bias=False, **kwargs) -> BN(eps=0.001) -> relu(inplace).
            def __init__(self, in_channels, out_channels, **kwargs):
                super().__init__()
                self.conv = tnn.Conv2d(in_channels, out_channels, bias=False,
                                       **kwargs)
                self.bn = tnn.BatchNorm2d(out_channels, eps=0.001)

            def forward(self, x):
                return F.relu(self.bn(self.conv(x)), inplace=True)

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_inc = types.ModuleType("torchvision.models.inception")
        tv_inc.BasicConv2d = BasicConv2d
        tv_models.inception = tv_inc
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.inception"] = tv_inc

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_layers = types.ModuleType("timm.layers")
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = timm_layers


def _load_module(fullname: str, path: str):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


_MODEL_FILES = [
    "UNet", "AttentionUNet", "R2UNet", "R2AttentionUNet", "BARUNet",
    "BIARUNet", "DenseUNet", "MCUNet", "ResUNet", "FRUNet", "MultiResUNet",
    "SegNet", "BCDUNet", "RetinaLiteNet", "UNetPP",
]


def load_reference_models():
    """Import all 15 reference model modules; returns {module_name: module}.

    The reference's ``UNetFamily``/``UNetFamily.utils`` entries are swapped
    into ``sys.modules`` only for the duration of the import so this repo's
    compat shim of the same name is untouched afterwards.
    """
    if _cache:
        return dict(_cache)
    if not reference_available():
        raise RuntimeError(f"reference tree not found at {REFERENCE_ROOT}")

    _install_stubs()

    touched = ["UNetFamily", "UNetFamily.utils", "UNetFamily.utils.unet_parts"]
    touched += [f"UNetFamily.{m}" for m in _MODEL_FILES]
    saved = {name: sys.modules.get(name) for name in touched}
    try:
        pkg = types.ModuleType("UNetFamily")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "UNetFamily")]
        utils_pkg = types.ModuleType("UNetFamily.utils")
        utils_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "UNetFamily", "utils")]
        sys.modules["UNetFamily"] = pkg
        sys.modules["UNetFamily.utils"] = utils_pkg
        _cache["_unet_parts"] = _load_module(
            "UNetFamily.utils.unet_parts",
            os.path.join(REFERENCE_ROOT, "UNetFamily", "utils", "unet_parts.py"),
        )
        for name in _MODEL_FILES:
            mod = _load_module(
                f"UNetFamily.{name}",
                os.path.join(REFERENCE_ROOT, "UNetFamily", f"{name}.py"),
            )
            _cache[name] = mod
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
    return dict(_cache)


def load_reference_train_demo():
    """Import the reference's train-demo.py (the fractal trainer) as a
    module and return it.  Its module-level imports (data_loading,
    utils.dice_score, utils.utils, UNetFamily) are satisfied from the
    reference tree under temporarily-swapped sys.modules entries, exactly
    like :func:`load_reference_models`."""
    if "_train_demo" in _cache:
        return _cache["_train_demo"]
    load_reference_models()  # installs stubs + caches UNetFamily modules

    names = (["UNetFamily", "UNetFamily.utils",
              "UNetFamily.utils.unet_parts", "data_loading",
              "utils", "utils.dice_score", "utils.utils"]
             + [f"UNetFamily.{m}" for m in _MODEL_FILES])
    saved = {n: sys.modules.get(n) for n in names}
    try:
        pkg = types.ModuleType("UNetFamily")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "UNetFamily")]
        sys.modules["UNetFamily"] = pkg
        sys.modules["UNetFamily.utils"] = types.ModuleType("UNetFamily.utils")
        sys.modules["UNetFamily.utils.unet_parts"] = _cache["_unet_parts"]
        for m in _MODEL_FILES:
            sys.modules[f"UNetFamily.{m}"] = _cache[m]
            setattr(pkg, m, _cache[m])
        upkg = types.ModuleType("utils")
        upkg.__path__ = [os.path.join(REFERENCE_ROOT, "utils")]
        sys.modules["utils"] = upkg
        _load_module("utils.dice_score",
                     os.path.join(REFERENCE_ROOT, "utils", "dice_score.py"))
        _load_module("utils.utils",
                     os.path.join(REFERENCE_ROOT, "utils", "utils.py"))
        _load_module("data_loading",
                     os.path.join(REFERENCE_ROOT, "data_loading.py"))
        _cache["_train_demo"] = _load_module(
            "ref_train_demo", os.path.join(REFERENCE_ROOT, "train-demo.py"))
    finally:
        sys.modules.pop("ref_train_demo", None)
        for n, mod in saved.items():
            if mod is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = mod
    return _cache["_train_demo"]


class reference_modules_registered:
    """Context manager that temporarily registers the loaded reference
    modules under their canonical ``UNetFamily.*`` names in sys.modules —
    needed to ``torch.save`` a whole reference module the way the reference
    itself does (pickle resolves classes by module path)."""

    def __enter__(self):
        load_reference_models()
        names = (["UNetFamily", "UNetFamily.utils",
                  "UNetFamily.utils.unet_parts"]
                 + [f"UNetFamily.{m}" for m in _MODEL_FILES])
        self._saved = {n: sys.modules.get(n) for n in names}
        pkg = types.ModuleType("UNetFamily")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "UNetFamily")]
        utils_pkg = types.ModuleType("UNetFamily.utils")
        sys.modules["UNetFamily"] = pkg
        sys.modules["UNetFamily.utils"] = utils_pkg
        sys.modules["UNetFamily.utils.unet_parts"] = _cache["_unet_parts"]
        for m in _MODEL_FILES:
            sys.modules[f"UNetFamily.{m}"] = _cache[m]
        return self

    def __exit__(self, *exc):
        for n, mod in self._saved.items():
            if mod is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = mod
        return False


def make_reference_model(registry_name: str, **kwargs):
    """Instantiate a reference model by our registry spelling
    (e.g. "UNet.UNet", "BCDUNet.BCDU_net_D3")."""
    mods = load_reference_models()
    module_name, class_name = registry_name.split(".")
    return getattr(mods[module_name], class_name)(**kwargs)
