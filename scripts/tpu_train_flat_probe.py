#!/usr/bin/env python
"""Probe: does the flat-buffer optimizer layout (make_optimizer
flatten=True, optax.flatten over the production chain) speed up the FULL
production train step?

The companion scripts/tpu_opt_flat_probe.py isolates the optimizer; this
one measures the decision metric — the end-to-end step (on-device
sampling + fwd/bwd + optimizer + NaN guard, exactly bench.py's
train_bench) with flatten off vs on, both variants within ONE process so
relay drift can't masquerade as a win (memory: only within-run
comparisons count).

Methodology: dynamic-trip-count fori_loop (one executable per variant),
t(N)-t(1) differencing.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_train_flat_probe.py
Env: FLAT_MODEL (default UNet.UNet), FLAT_BATCH (128), FLAT_N (21),
FLAT_PATCH (128; shrink for CPU smoke runs of this code path).
"""

import os
import time

import numpy as np

MODEL = os.environ.get("FLAT_MODEL", "UNet.UNet")
BATCH = int(os.environ.get("FLAT_BATCH", "128"))
N_LONG = int(os.environ.get("FLAT_N", "21"))
PATCH = int(os.environ.get("FLAT_PATCH", "128"))


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import (
        build_train_sample_map,
        sample_batch,
    )
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    rng = np.random.RandomState(0)
    pool_hw = 256
    images = jnp.asarray(rng.rand(2, pool_hw, pool_hw, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, pool_hw, pool_hw, 1) > 0.8),
                         jnp.float32)
    smap = jnp.asarray(build_train_sample_map(
        np.ones((2, pool_hw, pool_hw), np.float32), PATCH // 2))

    model = create_model(MODEL, dtype=jnp.bfloat16)

    def measure(flatten):
        tx = make_optimizer(1e-4, flatten=flatten)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
        batch_step = make_batch_step_fn(
            model, tx, n_classes=model.n_classes, compute_dtype=jnp.bfloat16)

        @jax.jit
        def run_n(state, n, key):
            def body(i, carry):
                state, total = carry
                k_s, k_d = jax.random.split(jax.random.fold_in(key, i))
                imgs, labs = sample_batch(k_s, images, labels, smap,
                                          BATCH, PATCH)
                state, loss, ok = batch_step(state, imgs, labs, k_d)
                return state, total + loss
            state, total = jax.lax.fori_loop(0, n, body,
                                             (state, jnp.zeros(())))
            return state, total

        def run(n):
            _, total = run_n(state, jnp.int32(n), jax.random.PRNGKey(1))
            return float(total)

        run(1)
        run(N_LONG)  # compile (one executable) + warm
        t0 = time.perf_counter(); run(1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(N_LONG)
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N_LONG - 1)
        loss1 = run(1)
        return per, loss1

    per_leaf, loss_a = measure(False)
    print(f"per-leaf  : {per_leaf*1e3:7.2f} ms/step "
          f"({BATCH/per_leaf:7.1f} patches/s)  loss(1)={loss_a:.6f}",
          flush=True)
    per_flat, loss_b = measure(True)
    print(f"flattened : {per_flat*1e3:7.2f} ms/step "
          f"({BATCH/per_flat:7.1f} patches/s)  loss(1)={loss_b:.6f}",
          flush=True)
    print(f"speedup   : {per_leaf/per_flat:6.3f}x  "
          f"(loss agreement: {abs(loss_a-loss_b):.2e})", flush=True)
    # Re-measure per-leaf to bracket relay drift within the run.
    per_leaf2, _ = measure(False)
    print(f"per-leaf-2: {per_leaf2*1e3:7.2f} ms/step (drift control)",
          flush=True)


if __name__ == "__main__":
    main()
