"""Checkpointing — the contract equivalent of the reference's
``torch.save(model, "best_model.pth")`` (the *whole* model, not a
state_dict, train.py:374) consumed by both resume (train.py:500-503) and
evaluation (evaluate.py:421).

A checkpoint here is one self-describing file: a msgpack payload holding
the registry model name, ctor kwargs, params and batch_stats (and
optionally opt-state pieces for exact training resume, the analogue of
train-demo.py:597-604's state-dict bundle).  ``load_model`` reconstructs
the model from the registry — drop-in for "load the whole model from a
path".  An Orbax-based directory format is also provided for
production-scale async checkpointing.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_model(
    path: str,
    model_name: str,
    model_kwargs: Dict[str, Any],
    params,
    batch_stats,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a single-file checkpoint.  ``extra`` may carry optimizer state
    or scheduler metadata for exact resume."""
    payload = {
        "config": json.dumps(
            {"model_name": model_name, "model_kwargs": model_kwargs}
        ),
        "params": _to_numpy_tree(params),
        "batch_stats": _to_numpy_tree(batch_stats),
    }
    if extra:
        payload["extra"] = _to_numpy_tree(extra)
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic best-checkpoint update
    return path


def load_model(path: str, dtype=None) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Reconstruct (model, variables, config) from a checkpoint file.

    variables = {"params": ..., "batch_stats": ...}; the model comes from
    the registry using the stored name/kwargs — the behavioral equivalent
    of ``torch.load(path)`` returning a ready model.  ``dtype`` optionally
    overrides the compute dtype of the rebuilt model.
    """
    from jcfszxc_unet_tpu.models import create_model

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    config = json.loads(payload["config"])
    kwargs = dict(config["model_kwargs"])
    if dtype is not None:
        kwargs["dtype"] = dtype
    model = create_model(config["model_name"], **kwargs)
    variables = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
    }
    return model, variables, config


def load_model_any(path: str, dtype=None, patch_size: int = 64):
    """Like :func:`load_model`, but also accepts a reference PyTorch ``.pth``
    (whole pickled module, train.py:374) — the model class is detected from
    the pickle and its weights imported via compat/torch_mapping.py.  This
    makes ``evaluate.py -m best_model.pth`` and ``train.py --load`` drop-in
    against reference-trained checkpoints."""
    try:
        return load_model(path, dtype=dtype)
    except Exception:
        pass  # not a framework msgpack checkpoint — try the torch route
    from jcfszxc_unet_tpu.compat.torch_import import (
        detect_pth_model_name,
        load_pth_state_dict,
        variables_from_state_dict,
    )

    model_name = detect_pth_model_name(path)
    if model_name is None:
        raise ValueError(
            f"{path!r} is neither a framework checkpoint nor a whole-module "
            f"torch .pth with a recognizable model class")
    kwargs: Dict[str, Any] = {}
    if model_name.startswith("BCDUNet."):
        kwargs["N"] = patch_size
    if dtype is not None:
        kwargs["dtype"] = dtype
    sd = load_pth_state_dict(path)
    model, variables = variables_from_state_dict(
        model_name, sd, kwargs, input_hw=patch_size)
    config = {"model_name": model_name, "model_kwargs": kwargs}
    return model, variables, config


def load_extra(path: str) -> Optional[Dict[str, Any]]:
    """Fetch the optional resume payload (optimizer state etc.)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload.get("extra")


class AsyncCheckpointWriter:
    """Overlap checkpoint device→host fetch + disk write with training.

    The reference blocks training on every best-model save
    (``torch.save(model, ...)``, train.py:374).  Here the save's
    device→host transfer (~124 MB for UNet) runs on a background thread:
    jax device buffers are immutable, so snapshotting tree references at
    submit time is consistent, and :func:`save_model`'s tmp+``os.replace``
    write means concurrent readers see the old or the new file, never a
    partial one.

    One write in flight at a time: ``submit`` first waits for the
    previous write (bounding extra HBM retention to one params snapshot
    and surfacing any worker exception at the call site).  Call
    :meth:`close` (or use as a context manager) before relying on files
    being on disk.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._pending = None

    def submit(self, fn, *args, **kwargs):
        self.wait()
        self._pending = self._executor.submit(fn, *args, **kwargs)

    def wait(self):
        """Block until the in-flight write (if any) completes; re-raises
        any exception from the worker."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self):
        try:
            self.wait()
        finally:
            self._executor.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


# ---------------------------------------------------------------------------
# Orbax directory checkpoints (production path: async, sharded-aware)
# ---------------------------------------------------------------------------


def save_orbax(ckpt_dir: str, state_tree) -> None:
    """Write an Orbax PyTree checkpoint (directory format)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state_tree, force=True)


def restore_orbax(ckpt_dir: str, template=None):
    """Restore an Orbax PyTree checkpoint."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(ckpt_dir, item=template)
        return ckptr.restore(ckpt_dir)
