"""AOT model export for production serving.

Serializes the jitted forward (params closed over) via ``jax.export`` into
a portable StableHLO artifact that a serving binary can load and run
without Python model code — the deployment-path counterpart of the
training framework.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_forward(model, variables, batch_size: int, patch_size: int,
                   channels: int = 3, compute_dtype=jnp.bfloat16) -> bytes:
    """Export the sigmoid forward at a fixed deployment shape; returns the
    serialized artifact bytes."""

    def forward(x):
        out = model.apply(variables, x.astype(compute_dtype), train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    spec = jax.ShapeDtypeStruct(
        (batch_size, patch_size, patch_size, channels), compute_dtype
    )
    exported = jax_export.export(jax.jit(forward))(spec)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns a callable taking the
    original input shape."""
    exported = jax_export.deserialize(blob)
    return exported.call


def export_checkpoint(ckpt_path: str, out_path: str, batch_size: int = 32,
                      patch_size: int = 512, compute_dtype=jnp.bfloat16
                      ) -> str:
    """Checkpoint file -> serialized serving artifact on disk."""
    from jcfszxc_unet_tpu.train.checkpoint import load_model

    model, variables, _ = load_model(ckpt_path, dtype=compute_dtype)
    blob = export_forward(model, variables, batch_size, patch_size,
                          compute_dtype=compute_dtype)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path
