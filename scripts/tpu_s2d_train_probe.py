#!/usr/bin/env python
"""Measure space-to-depth execution (create_model(..., s2d=True) —
ops/s2d.py) vs the plain path on FULL production train steps for the two
slow-tail models it targets, with UNet as the drift control.

Motivation (round-3 attribution): MultiResUNet's m8+m9 are 67% and
NestedUNet's x0 row 73% of their training steps, bound by lane-padding
traffic amplification (8-53 ch pad to 128 lanes -> 2.5-16x physical
bytes per BN/concat/shortcut pass).  In s2d space the same math runs at
4x better lane fill; tests/test_s2d.py pins exact parity (eval + train
+ running stats).  The loss printed per variant must match to bf16
noise — it is the in-run correctness check.

Within-run comparison, same timing methodology as tpu_bn_onepass_train.py
(loop-in-jit difference).  Deviation from the production loop: steps are
chained with a hand-rolled fori_loop over make_batch_step_fn with a
fold_in+split-per-step RNG scheme, not make_epoch_fn's split(key, steps)
— per-step math is identical, only the key derivation differs, which is
irrelevant for the relative plain-vs-s2d comparison.  Alongside the loss
total the loop accumulates the NaN-skip flags; a variant that silently
skipped steps would show skipped>0 rather than passing off a smaller
loss total as agreement.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_s2d_train_probe.py
Env: S2DT_BATCH (128), S2DT_MODELS, S2DT_N (6).
"""

import os
import time

import numpy as np

BATCH = int(os.environ.get("S2DT_BATCH", "128"))
PATCH = int(os.environ.get("S2DT_PATCH", "128"))
N_LONG = int(os.environ.get("S2DT_N", "6"))
MODELS = os.environ.get(
    "S2DT_MODELS",
    "UNet.UNet,MultiResUNet.MultiResUNet,UNetPP.NestedUNet,"
    "FRUNet.FRUNet").split(",")
# UNet has no s2d flag — it is the control and only runs plain.
HAS_S2D = {"MultiResUNet.MultiResUNet", "UNetPP.NestedUNet",
           "FRUNet.FRUNet"}


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
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
        variants = [("plain", False)]
        if name in HAS_S2D:
            variants.append(("s2d", True))
        for variant, flag in variants:
            try:
                kwargs = {"s2d": True} if flag else {}
                model = create_model(name, dtype=jnp.bfloat16, **kwargs)
                tx = make_optimizer(1e-4)
                state = create_train_state(
                    model, tx, jax.random.PRNGKey(0),
                    jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
                key = jax.random.PRNGKey(1)

                # ONE executable with a traced trip count (the bench.py
                # methodology): two separately-compiled scans measured
                # >25 min of remote compile through this image's relay.
                from jcfszxc_unet_tpu.data.sampler import sample_batch
                from jcfszxc_unet_tpu.train.trainer import (
                    make_batch_step_fn,
                )

                batch_step = make_batch_step_fn(
                    model, tx, n_classes=model.n_classes,
                    compute_dtype=jnp.bfloat16)

                @jax.jit
                def run_n(state, n, key):
                    def body(i, carry):
                        state, total, skipped = carry
                        ks, kd = jax.random.split(
                            jax.random.fold_in(key, i))
                        imgs, labs = sample_batch(
                            ks, images, labels, smap, BATCH, PATCH)
                        state, loss, ok = batch_step(state, imgs, labs, kd)
                        return state, total + loss, skipped + (1.0 - ok)
                    return jax.lax.fori_loop(
                        0, n, body, (state, jnp.zeros(()), jnp.zeros(())))

                def run(n):
                    _, total, skipped = run_n(state, jnp.int32(n), key)
                    return float(total), int(skipped)

                def run_t(n):
                    return run(n)[0]

                l1, skip1 = run(1); run(N_LONG)
                t0 = time.perf_counter(); run_t(1)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); _, skipN = run(N_LONG)
                t2 = time.perf_counter() - t0
                per = (t2 - t1) / (N_LONG - 1)
                print(f"{name} [{variant}]: {per*1e3:8.2f} ms/step "
                      f"{BATCH/per:8.1f} patches/s  (loss {l1:.5f}, "
                      f"skipped {skip1}+{skipN}/{1 + N_LONG})",
                      flush=True)

                # eval-mode forward (the inference half), same loop-in-jit
                xb = jnp.asarray(
                    np.random.RandomState(2).rand(64, PATCH, PATCH, 3),
                    jnp.bfloat16)

                @jax.jit
                def fwd_n(v, n):
                    def body(i, acc):
                        y = model.apply(
                            v, xb + i.astype(jnp.bfloat16) * 1e-6,
                            train=False)
                        return acc + y.astype(jnp.float32).mean()
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

                var_eval = {"params": state.params,
                            "batch_stats": state.batch_stats}

                def frun(n):
                    return float(fwd_n(var_eval, jnp.int32(n)))

                frun(1); frun(N_LONG)
                t0 = time.perf_counter(); frun(1)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); frun(N_LONG)
                t2 = time.perf_counter() - t0
                fper = (t2 - t1) / (N_LONG - 1)
                print(f"{name} [{variant}]: eval fwd {fper*1e3:8.2f} "
                      f"ms/batch64 {64/fper:8.1f} img/s", flush=True)
            except Exception as e:
                print(f"{name} [{variant}]: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
