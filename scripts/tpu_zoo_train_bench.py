#!/usr/bin/env python
"""Per-model TRAINING throughput + MFU on the real chip (VERDICT r1 item
10): one full production train step (on-device sampling + fwd/bwd +
RMSprop + NaN guard, bf16 compute) per model, batch 32 of 128^2 patches —
the reference protocol (train.py:437-466).  Loop-in-jit timing (epoch with
N chained steps inside one lax.scan); FLOPs from XLA cost analysis of the
compiled step; MFU against the chip's 394 TFLOP/s bf16 peak (the measured
XLA conv ceiling on this chip is 385, experiments_record.md).
"""

import time

import numpy as np

import os

BATCH = int(os.environ.get("TRAIN_BENCH_BATCH", "32"))
PATCH = 128
ONLY = [m for m in os.environ.get("TRAIN_BENCH_MODELS", "").split(",") if m]
POOL_HW = int(os.environ.get("TRAIN_BENCH_POOL_HW", "256"))  # DRIVE ~584
PEAK_TFLOPS = 394.0
N_LONG = 6


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
    from jcfszxc_unet_tpu.models import MODEL_REGISTRY, create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_epoch_fn

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, POOL_HW, POOL_HW, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, POOL_HW, POOL_HW, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, POOL_HW, POOL_HW), np.float32), PATCH // 2))

    print(f"batch {BATCH}, patch {PATCH}, bf16; peak {PEAK_TFLOPS} TFLOP/s")
    for name in (ONLY or MODEL_REGISTRY):
        kwargs = {"N": PATCH} if name.startswith("BCDUNet.") else {}
        try:
            model = create_model(name, dtype=jnp.bfloat16, **kwargs)
            tx = make_optimizer(1e-4)
            state = create_train_state(
                model, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))

            def make(steps, model=model, tx=tx):
                return make_epoch_fn(
                    model, tx, n_classes=model.n_classes, batch_size=BATCH,
                    patch_size=PATCH, steps=steps,
                    compute_dtype=jnp.bfloat16)

            e1, eN = make(1), make(N_LONG)
            key = jax.random.PRNGKey(1)

            # FLOPs of the one-step epoch (includes sampling + optimizer).
            # e1 is already jitted (make_epoch_fn); lowering it directly
            # shares the executable with the timed calls below.
            flops = None
            try:
                lowered = e1.lower(state, images, labels, smap, key)
                ca = lowered.compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass

            # epoch_fn donates the state: hand each call a fresh on-device
            # copy.  The copy MUST be one jitted program — eager per-leaf
            # ops cost seconds each through this image's async relay.
            copy_state = jax.jit(lambda s: jax.tree.map(lambda a: a + 0, s))

            def run(fn, state=state):
                s, m = fn(copy_state(state), images, labels, smap, key)
                return float(m["epoch_loss"])

            run(e1); run(eN)  # compile both
            t0 = time.perf_counter(); run(e1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(eN)
            t2 = time.perf_counter() - t0
            per = (t2 - t1) / (N_LONG - 1)
            pps = BATCH / per
            if flops:
                mfu = flops / per / (PEAK_TFLOPS * 1e12) * 100.0
                gf = flops / 1e9
                print(f"{name}: {per*1e3:8.2f} ms/step  {pps:8.1f} patches/s"
                      f"  {gf:8.1f} GFLOP/step  MFU {mfu:5.1f}%", flush=True)
            else:
                print(f"{name}: {per*1e3:8.2f} ms/step  {pps:8.1f} patches/s",
                      flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
