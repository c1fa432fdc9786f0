#!/usr/bin/env python
"""Measure a train-mode BN "apply in compute dtype" fast path.

The round-2 eval BN fast path (fold stats+affine into one per-channel
multiply-add applied in bf16) bought +46% MultiResUNet / +12% UNet
inference because an f32 elementwise pass breaks XLA's fusion into the
producing conv's epilogue.  The TRAIN path still normalizes in f32
(ops/layers.py _TorchBatchNorm): statistics must be f32, but the
*application* y = x*inv + beta can be done in bf16 the same way.  This
script monkeypatches that variant in and measures the full train step
for the BN-densest models.

Numerics note: torch AMP autocasts BN to f32 (both passes), so this
variant trades a bf16 rounding of the normalize-apply for fusion; the
statistics and the folded (inv, beta) stay f32.
"""

import os
import time

import numpy as np

BATCH, PATCH = 32, 128
PEAK_TFLOPS = 394.0
N_LONG = 6
MODELS = os.environ.get(
    "BN_MODELS", "UNet.UNet,MultiResUNet.MultiResUNet").split(",")


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.ops import layers as L
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_epoch_fn

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 256, 256, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 256, 256, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 256, 256), np.float32),
                               PATCH // 2))

    print(f"batch {BATCH}, patch {PATCH}, bf16")
    for name in MODELS:
        for variant, fast in (("base", False), ("fast", True)):
            L.TRAIN_BN_FAST_APPLY = fast
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
            finally:
                L.TRAIN_BN_FAST_APPLY = False
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
