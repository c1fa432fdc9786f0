#!/usr/bin/env python
"""MRES_TAIL_FOLD on FULL production train steps + eval forwards
(within-run, v5e) — the block-level probe (tpu_mres_tail_fuse.py:
fwd -12%/-30% at m9/m8, fwd+bwd -4%) decides nothing until the full
MultiResUNet step confirms it; UNet is the no-Multiresblock control.

Same methodology as tpu_bn_onepass_train.py: the production
make_epoch_fn (sampling + fwd/bwd + RMSprop + NaN guard) at batch 128
patch 128 bf16, t(N)-t(1) loop differencing, plus the batch-64
eval-mode forward (which the fold must NOT change - it gates on train).
"""

import os
import time
from functools import partial

import numpy as np

BATCH = int(os.environ.get("FOLD_BATCH", "128"))
PATCH = 128
N_LONG = 6
EVAL_BATCH = 64
EVAL_N = 11


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
    for name in ("UNet.UNet", "MultiResUNet.MultiResUNet"):
        for variant, fold in (("plain", False), ("fold", True)):
            L.MRES_TAIL_FOLD = fold
            model = create_model(name, dtype=jnp.bfloat16)
            tx = make_optimizer(1e-4)
            state = create_train_state(
                model, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
            copy_state = jax.jit(lambda s: jax.tree.map(lambda a: a + 0, s))
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

            # eval-mode forward (fold gates on train: must be unchanged)
            xe = jnp.asarray(
                np.random.RandomState(2).rand(EVAL_BATCH, PATCH, PATCH, 3),
                jnp.bfloat16)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            @partial(jax.jit, static_argnums=(2,))
            def eloop(v, x, n):
                def body(i, acc):
                    out = model.apply(v, x + i.astype(x.dtype) * 1e-6,
                                      train=False)
                    return acc + out.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            float(eloop(variables, xe, 1)); float(eloop(variables, xe, EVAL_N))
            t0 = time.perf_counter(); float(eloop(variables, xe, 1))
            te1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(eloop(variables, xe, EVAL_N))
            teN = time.perf_counter() - t0
            pere = (teN - te1) / (EVAL_N - 1)
            print(f"{name} [{variant}]: {per*1e3:8.2f} ms/step "
                  f"{BATCH/per:8.1f} patches/s  (loss {l1:.5f})   "
                  f"eval fwd b{EVAL_BATCH} {pere*1e3:7.2f} ms "
                  f"{EVAL_BATCH/pere:7.1f} img/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
