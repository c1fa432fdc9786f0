#!/usr/bin/env python
"""Measure one-pass BN batch statistics (E[x^2]-E[x]^2, one fused HBM
traversal) vs the two-pass form (E[(x-mean)^2], two traversals) on FULL
production train steps.

Motivation (round-3 slow-tail attribution): the BN-dense narrow-channel
models spend most of their step in VPU/HBM passes over lane-padded
tensors; tpu_mres_block_iso.py put the Multiresblock-9 composite at
14.0 ms fwd+bwd of which only 3.2 ms is convs, and the one-pass stats
variant measured -20% on that block in isolation
(tpu_mres_layout_probe.py; the NCHW layout variant was a wash — XLA
assigns physical layouts itself).

Within-run comparison, UNet as control.  Production switch:
ops/layers.TRAIN_BN_ONE_PASS_STATS.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_bn_onepass_train.py
"""

import os
import time

import numpy as np

BATCH = int(os.environ.get("BN_BATCH", "128"))
PATCH = 128
N_LONG = 6
MODELS = os.environ.get(
    "BN_MODELS",
    "UNet.UNet,MultiResUNet.MultiResUNet,UNetPP.NestedUNet,FRUNet.FRUNet,"
    "MCUNet.MCUNet").split(",")


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.ops import layers as L
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_epoch_fn
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 256, 256, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 256, 256, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 256, 256), np.float32),
                               PATCH // 2))

    print(f"batch {BATCH}, patch {PATCH}, bf16", flush=True)
    for name in MODELS:
        for variant, onepass in (("2pass", False), ("1pass", True)):
            L.TRAIN_BN_ONE_PASS_STATS = onepass
            try:
                model = create_model(name, dtype=jnp.bfloat16)
                tx = make_optimizer(1e-4)
                state = create_train_state(
                    model, tx, jax.random.PRNGKey(0),
                    jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
                copy_state = jax.jit(
                    lambda s: jax.tree.map(lambda a: a + 0, s))
                key = jax.random.PRNGKey(1)

                def make(steps):
                    return make_epoch_fn(
                        model, tx, n_classes=model.n_classes,
                        batch_size=BATCH, patch_size=PATCH, steps=steps,
                        compute_dtype=jnp.bfloat16)

                e1, eN = make(1), make(N_LONG)

                def run(fn):
                    s, m = fn(copy_state(state), images, labels, smap, key)
                    return float(m["epoch_loss"])

                l1 = run(e1); run(eN)
                t0 = time.perf_counter(); run(e1)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); run(eN)
                t2 = time.perf_counter() - t0
                per = (t2 - t1) / (N_LONG - 1)
                print(f"{name} [{variant}]: {per*1e3:8.2f} ms/step "
                      f"{BATCH/per:8.1f} patches/s  (loss {l1:.5f})",
                      flush=True)
            except Exception as e:
                print(f"{name} [{variant}]: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
