"""Device mesh + sharding helpers — the framework's communication backend.

The reference is single-process/single-GPU with zero collectives
(SURVEY.md §2.5); the TPU-native equivalent of its *capability* is data
parallelism over ICI: a 1-D ``data`` mesh, batch axis sharded, gradient
all-reduce inserted by XLA (GSPMD) when the loss mean crosses the shard.
Everything else in the framework is placement-agnostic: it only talks to
this module.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: join this process into a JAX distributed job so
    ``jax.devices()`` spans every host's chips (DCN between hosts, ICI
    within).  No-op when arguments are absent and no cluster env is set.

    After this, the same 1-D ``data`` mesh code path scales across hosts —
    the mesh helpers below are topology-agnostic.
    """
    import jax.distributed

    if coordinator_address is None and num_processes is None:
        return  # single-process (the common case in this repo)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_2d_mesh(data: int, model: int) -> Mesh:
    """(data, model) mesh for DP x TP experiments (the model axis is unused
    by the UNet family's conv-dominant compute, but the helper keeps the
    framework forward-compatible with tensor-parallel heads)."""
    devices = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """NamedSharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh], axis_name: str = "data"):
    """Constrain an array's leading axis onto the data axis (no-op without
    a mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
    )


def put_replicated(tree, mesh: Optional[Mesh]):
    """Device-put a pytree fully replicated over the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_batch_sharded(x, mesh: Optional[Mesh], axis_name: str = "data"):
    """Device-put an array with its batch axis sharded over the mesh."""
    if mesh is None:
        return jax.device_put(x)
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))
