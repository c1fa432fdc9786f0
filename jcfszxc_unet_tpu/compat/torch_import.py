"""Import reference PyTorch checkpoints (.pth) into framework checkpoints.

The reference saves the *whole pickled nn.Module* (train.py:374:
``torch.save(model, "best_model.pth")``) and evaluates by ``torch.load``
(evaluate.py:421).  Unpickling such a file normally requires the original
model classes; we don't ship torch model code, so ``load_pth_state_dict``
unpickles unknown classes into skeleton ``nn.Module`` subclasses — pickle
restores ``__dict__`` (which holds ``_parameters``/``_buffers``/``_modules``),
which is all ``state_dict()`` needs.

``import_torch_checkpoint`` then maps the state_dict onto our Flax variable
trees (compat/torch_mapping.py) and writes a framework checkpoint that
``cli/evaluate.py`` / ``cli/train.py --load`` consume directly.

CLI:  python -m jcfszxc_unet_tpu.compat.torch_import \
          --pth best_model.pth --model UNet.UNet --out best_model.ckpt
"""

from __future__ import annotations

import argparse
import io
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# Only torch/stdlib/numpy payload machinery resolves for real; every other
# class (the reference's model/block classes) becomes a skeleton nn.Module.
# Resolving them "for real" would be wrong even when a module of that name
# imports — this framework's own ``UNetFamily`` compat shim holds *Flax*
# classes under the reference's spellings.
_TRUSTED_ROOTS = ("torch", "collections", "builtins", "numpy",
                  "functools", "copyreg", "pickle", "_codecs")


def _make_shim():
    """A pickle-module shim whose Unpickler fabricates skeleton nn.Module
    subclasses for unknown classes; pickle restores __dict__ (which holds
    _parameters/_buffers/_modules) — all state_dict() needs."""
    import torch.nn as tnn

    made = {}

    class SkeletonUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "__builtin__":  # legacy Py2 spelling in torch pickles
                module = "builtins"
            if module.split(".")[0] in _TRUSTED_ROOTS:
                return super().find_class(module, name)
            key = (module, name)
            if key not in made:
                made[key] = type(name, (tnn.Module,),
                                 {"__module__": module})
            return made[key]

    # torch.load(pickle_module=...) accepts a module-like namespace.
    class _PickleShim:
        Unpickler = SkeletonUnpickler
        load = staticmethod(lambda f, **kw: SkeletonUnpickler(f, **kw).load())
        loads = staticmethod(
            lambda b, **kw: SkeletonUnpickler(io.BytesIO(b), **kw).load())
        # torch serialization probes these:
        HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
        dump = staticmethod(pickle.dump)
        dumps = staticmethod(pickle.dumps)

    return _PickleShim


def load_pth_state_dict(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` (whole pickled module OR a bare state_dict)
    and return an ordered state_dict of numpy-convertible tensors."""
    import torch
    import torch.nn as tnn

    obj = torch.load(path, map_location="cpu", pickle_module=_make_shim(),
                     weights_only=False)
    if isinstance(obj, tnn.Module):
        return obj.state_dict()
    if isinstance(obj, dict):
        # state-dict bundles (train-demo.py:600-604) store nested dicts;
        # accept either a flat state_dict or {"model_state_dict": ...}.
        for key in ("model_state_dict", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
        return obj
    raise TypeError(f"unsupported .pth payload type: {type(obj)!r}")


def detect_pth_model_name(path: str) -> Optional[str]:
    """Recover the registry name ("UNet.UNet", ...) from a whole-module .pth:
    the pickled class identity survives skeleton unpickling (its __module__
    keeps the reference spelling, e.g. "UNetFamily.BCDUNet")."""
    import torch
    import torch.nn as tnn

    obj = None
    try:
        sd_obj = torch.load(path, map_location="cpu", weights_only=False,
                            pickle_module=_make_shim())
        obj = sd_obj
    except Exception:
        return None
    if not isinstance(obj, tnn.Module):
        return None
    module = type(obj).__module__.split(".")[-1]
    name = f"{module}.{type(obj).__name__}"
    from jcfszxc_unet_tpu.models import MODEL_REGISTRY
    return name if name in MODEL_REGISTRY else None


def variables_from_state_dict(model_name: str, state_dict, model_kwargs=None,
                              input_hw: int = 64):
    """Build {"params","batch_stats"} for ``model_name`` from a torch
    state_dict.  Template shapes come from an abstract (eval_shape) init —
    no FLOPs spent."""
    from jcfszxc_unet_tpu.compat.torch_mapping import state_dict_to_variables
    from jcfszxc_unet_tpu.models import create_model

    model_kwargs = dict(model_kwargs or {})
    model = create_model(model_name, **model_kwargs)
    n_ch = getattr(model, "n_channels", 3)
    x = jnp.zeros((1, input_hw, input_hw, n_ch), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, True))
    variables = state_dict_to_variables(model_name, state_dict, template)
    return model, variables


def import_torch_checkpoint(pth_path: str, model_name: str, out_path: str,
                            model_kwargs: Optional[Dict[str, Any]] = None,
                            input_hw: int = 64) -> str:
    """.pth -> framework single-file checkpoint (train/checkpoint.py)."""
    from jcfszxc_unet_tpu.train.checkpoint import save_model

    sd = load_pth_state_dict(pth_path)
    _, variables = variables_from_state_dict(
        model_name, sd, model_kwargs, input_hw)
    variables = jax.tree.map(np.asarray, variables)
    return save_model(out_path, model_name, dict(model_kwargs or {}),
                      variables["params"], variables["batch_stats"])


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a reference PyTorch .pth checkpoint "
                    "(whole pickled module or state_dict) into a framework "
                    "checkpoint")
    p.add_argument("--pth", required=True, help="input .pth path")
    p.add_argument("--model", required=True,
                   help='registry name, e.g. "UNet.UNet"')
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--patch-size", type=int, default=64,
                   help="spatial size used for shape inference (and the "
                        "N kwarg for BCDU models)")
    args = p.parse_args(argv)
    kwargs = {}
    if args.model.startswith("BCDUNet."):
        kwargs["N"] = args.patch_size
    out = import_torch_checkpoint(args.pth, args.model, args.out,
                                  model_kwargs=kwargs,
                                  input_hw=args.patch_size)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
