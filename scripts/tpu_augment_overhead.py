#!/usr/bin/env python
"""Probe: what does --augment (on-device dihedral-8 patch augmentation,
train.py --augment / data.sampler.augment_batch) cost inside the
production train step?

Expectation from the formulation (three whole-batch boolean selects per
tensor): noise-level — the selects are bandwidth-trivial next to the
fwd/bwd convs and fuse into the sampling epilogue.  Measured rather than
asserted, per the house rule that perf claims carry within-run numbers.

Methodology: the production step via make_epoch_fn(augment=...) at the
bench operating point (UNet, batch 128, 128^2), dynamic-trip-count
fori_loop executable, t(N)-t(1) differencing, augment=False re-measured
last as the drift control.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_augment_overhead.py
Env: AUG_MODEL (UNet.UNet), AUG_BATCH (128), AUG_N (21), AUG_PATCH (128).
"""

import os
import time

import numpy as np

MODEL = os.environ.get("AUG_MODEL", "UNet.UNet")
BATCH = int(os.environ.get("AUG_BATCH", "128"))
N_LONG = int(os.environ.get("AUG_N", "21"))
PATCH = int(os.environ.get("AUG_PATCH", "128"))


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import (
        augment_batch,
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
    tx = make_optimizer(1e-4)
    batch_step = make_batch_step_fn(
        model, tx, n_classes=model.n_classes, compute_dtype=jnp.bfloat16)

    def measure(augment):
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))

        @jax.jit
        def run_n(state, n, key):
            def body(i, carry):
                state, total = carry
                ks = jax.random.split(jax.random.fold_in(key, i), 3)
                imgs, labs = sample_batch(ks[0], images, labels, smap,
                                          BATCH, PATCH)
                if augment:
                    imgs, labs = augment_batch(ks[1], imgs, labs)
                state, loss, ok = batch_step(state, imgs, labs, ks[2])
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
        return (t2 - t1) / (N_LONG - 1)

    per_plain = measure(False)
    print(f"plain   : {per_plain*1e3:7.2f} ms/step "
          f"({BATCH/per_plain:7.1f} patches/s)", flush=True)
    per_aug = measure(True)
    print(f"augment : {per_aug*1e3:7.2f} ms/step "
          f"({BATCH/per_aug:7.1f} patches/s)", flush=True)
    print(f"overhead: {(per_aug/per_plain-1)*100:+.1f}%", flush=True)
    per_plain2 = measure(False)
    print(f"plain-2 : {per_plain2*1e3:7.2f} ms/step (drift control)",
          flush=True)


if __name__ == "__main__":
    main()
