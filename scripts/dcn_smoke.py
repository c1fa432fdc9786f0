#!/usr/bin/env python
"""Two-process ``jax.distributed`` smoke for the multi-host (DCN) hook.

``initialize_distributed`` (parallel/mesh.py) is the SURVEY §2.5 "DCN only
if ever multi-host" entry point; until round 4 it was only exercised as a
single-process no-op (tests/test_parallel.py).  This worker turns it into
a tested path: the test harness (tests/test_distributed.py) spawns TWO of
these processes on localhost with the CPU backend (gloo collectives), and
each one

  1. joins the job through initialize_distributed(...) — the exact
     production entry point, not jax.distributed directly,
  2. checks the global device view spans both processes,
  3. builds the framework's own 1-D data mesh over the global devices
     (make_mesh) and runs one jitted cross-process reduction: each process
     contributes (process_id + 1) through its local shard and both must
     see sum == 3.0 — a real DCN collective, compiled by GSPMD from the
     same batch_sharding/replicated helpers the trainer uses.

Usage (one per process):
  python scripts/dcn_smoke.py --coordinator localhost:PORT \
      --num-processes 2 --process-id {0,1}
Prints "DCN_SMOKE_OK pid=<i> sum=3.0" and exits 0 on success.
"""

import argparse
import os
import sys

# CPU backend, one local device per process.  Set before importing jax;
# this image's sitecustomize registers a remote-TPU plugin and overrides
# JAX_PLATFORMS, so the explicit config updates below are the ones that
# actually win (same belt-and-suspenders as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jcfszxc_unet_tpu.parallel.mesh import (
        batch_sharding, initialize_distributed, make_mesh)

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * n_local, (n_global, n_local)

    # The framework's own mesh over the GLOBAL device view, one cross-
    # process reduction through it.
    mesh = make_mesh()
    local = np.full((n_local,), float(args.process_id + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        batch_sharding(mesh, 1), local, (n_global,))
    total = jax.jit(
        lambda x: jnp.sum(x) / n_local,
        out_shardings=NamedSharding(mesh, P()),
    )(arr)
    # P() output = fully replicated: every process holds an addressable
    # replica of the global sum and can read it without another gather.
    value = float(np.asarray(total.addressable_data(0)))
    expected = float(sum(range(1, args.num_processes + 1)))
    assert abs(value - expected) < 1e-6, (value, expected)
    print(f"DCN_SMOKE_OK pid={args.process_id} sum={value}", flush=True)


if __name__ == "__main__":
    main()
