#!/usr/bin/env python
"""Measure train-step variants for the zoo's pathological trainers on the
real chip (round-2 follow-up to the per-model training table).

Targets (experiments_record.md round-2 training table):
  * R2UNet 87.7 ms vs R2AttentionUNet 59.2 ms at the SAME ~7 TFLOP/step —
    an XLA backward-scheduling artifact worth chasing.
  * MultiResUNet 2.2% MFU, FRUNet 5.8% MFU — far under roofline.

Variant axis: remat (jax.checkpoint around the forward) — it rewrites the
backward's materialization schedule, which is exactly where the anomaly
must live.  Timing: loop-in-jit epochs, (t(N)-t(1))/(N-1) per the relay
methodology (see bench.py).
"""

import time

import numpy as np

BATCH, PATCH = 32, 128
PEAK_TFLOPS = 394.0
N_LONG = 6

import os

MODELS = os.environ.get(
    "VARIANT_MODELS",
    "R2UNet.R2UNet,R2AttentionUNet.R2AttentionUNet,"
    "MultiResUNet.MultiResUNet,FRUNet.FRUNet",
).split(",")
REMATS = tuple(
    bool(int(v)) for v in os.environ.get("VARIANT_REMATS", "0,1").split(","))


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_epoch_fn

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 256, 256, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 256, 256, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 256, 256), np.float32), PATCH // 2))

    print(f"batch {BATCH}, patch {PATCH}, bf16; peak {PEAK_TFLOPS} TFLOP/s")
    for name in MODELS:
        model = create_model(name, dtype=jnp.bfloat16)
        tx = make_optimizer(1e-4)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
        copy_state = jax.jit(lambda s: jax.tree.map(lambda a: a + 0, s))
        key = jax.random.PRNGKey(1)

        for remat in REMATS:
            try:
                def make(steps):
                    return make_epoch_fn(
                        model, tx, n_classes=model.n_classes,
                        batch_size=BATCH, patch_size=PATCH, steps=steps,
                        compute_dtype=jnp.bfloat16, remat=remat)

                e1, eN = make(1), make(N_LONG)
                flops = None
                try:
                    ca = e1.lower(state, images, labels, smap, key)\
                           .compile().cost_analysis()
                    if isinstance(ca, list):
                        ca = ca[0]
                    flops = float(ca.get("flops", 0.0)) or None
                except Exception:
                    pass

                def run(fn):
                    s, m = fn(copy_state(state), images, labels, smap, key)
                    return float(m["epoch_loss"])

                run(e1); run(eN)
                t0 = time.perf_counter(); run(e1)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); run(eN)
                t2 = time.perf_counter() - t0
                per = (t2 - t1) / (N_LONG - 1)
                mfu = (flops / per / (PEAK_TFLOPS * 1e12) * 100.0
                       if flops else float("nan"))
                print(f"{name} remat={int(remat)}: {per*1e3:8.2f} ms/step "
                      f"{BATCH/per:8.1f} patches/s  MFU {mfu:5.1f}%",
                      flush=True)
            except Exception as e:
                print(f"{name} remat={int(remat)}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
