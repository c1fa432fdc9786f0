#!/usr/bin/env python
"""Whole-image evaluation throughput on the real chip: the full tiled
pipeline (grid patch extraction -> chunked batched forward -> sigmoid ->
fori_loop stitch -> count-average) at DRIVE geometry.

Complements the patch-level zoo table: this is what `evaluate.py`
actually runs per test image (reference evaluate.py:200-307 semantics).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_eval_bench.py
"""

import time

import numpy as np

N_IMAGES, H, W = 20, 584, 565
PATCH, INFER_BATCH = 512, 32
N_LONG = 6


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.eval.tiling import tiled_predict
    from jcfszxc_unet_tpu.models import create_model

    for name in ["UNet.UNet", "MCUNet.MCUNet", "SegNet.SegNet"]:
        model = create_model(name, dtype=jnp.bfloat16)
        images = jnp.asarray(
            np.random.RandomState(0).rand(N_IMAGES, H, W, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(
                {"params": k},
                jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16), train=False)
        )(jax.random.PRNGKey(0))

        def forward(batch):
            out = model.apply(variables, batch.astype(jnp.bfloat16),
                              train=False)
            return jax.nn.sigmoid(out.astype(jnp.float32))

        # Loop-in-jit differenced timing (the relay's block_until_ready
        # returns before remote execution; experiments_record.md).
        from functools import partial

        @partial(jax.jit, static_argnums=(1,))
        def loop(images, n):
            def body(i, acc):
                x = images + i.astype(images.dtype) * 1e-6
                pred = tiled_predict(forward, x, PATCH, INFER_BATCH)
                return acc + pred.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(images, 1)); float(loop(images, N_LONG))
        t0 = time.perf_counter(); float(loop(images, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(images, N_LONG))
        tN = time.perf_counter() - t0
        dt = (tN - t1) / (N_LONG - 1)
        print(f"{name}: {N_IMAGES} images {H}x{W} in {dt*1e3:.1f} ms  "
              f"= {N_IMAGES/dt:.1f} img/s whole-image eval", flush=True)


if __name__ == "__main__":
    main()
