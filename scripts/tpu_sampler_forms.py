#!/usr/bin/env python
"""Patch-gather formulations for the training sampler on the real chip.

The fwd/bwd split showed UNet's b128 train step spends only 44 of 80 ms
in fwd+bwd — probing whether the vmapped-dynamic_slice patch gather
(= XLA gather with dynamic starts) is the missing cost, and whether the
fori_loop-of-dynamic_slice form (stitch lesson: 280x vs scatter) wins.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_sampler_forms.py
"""

import time
from functools import partial

import numpy as np

B, P, N_LONG = 128, 128, 11
N_IMG, H, W = 18, 584, 565


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(jax.random.fold_in(a[0], i), *a[1:])
                return acc + out.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    r1, rN = make(1), make(N_LONG)
    float(r1(*args)); float(rN(*args))
    t0 = time.perf_counter(); float(r1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rN(*args)); tN = time.perf_counter() - t0
    return (tN - t1) / (N_LONG - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.data.sampler import (
        build_train_sample_map, extract_patches, sample_centers)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(N_IMG, H, W, 3), jnp.float32)
    labels = jnp.asarray(rng.rand(N_IMG, H, W, 1), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((N_IMG, H, W), np.float32), P // 2))

    def gather_form(key, images, labels, smap):
        centers = sample_centers(key, smap, B)
        return (extract_patches(images, centers, P).sum()
                + extract_patches(labels, centers, P).sum())

    def loop_form(key, images, labels, smap):
        centers = sample_centers(key, smap, B)

        def extract(pool, c):
            out = jnp.zeros((B, P, P, pool.shape[-1]), pool.dtype)

            def body(k, out):
                i, x, y = centers[k, 0], centers[k, 1], centers[k, 2]
                patch = jax.lax.dynamic_slice(
                    pool, (i, x - P // 2, y - P // 2, 0),
                    (1, P, P, pool.shape[-1]))
                return jax.lax.dynamic_update_slice(out, patch, (k, 0, 0, 0))

            return jax.lax.fori_loop(0, B, body, out)

        return extract(images, centers).sum() + extract(labels, centers).sum()

    key = jax.random.PRNGKey(0)
    g = timed(gather_form, key, images, labels, smap)
    l = timed(loop_form, key, images, labels, smap)
    print(f"sample_batch b{B} {P}^2: vmap-gather {g:7.2f} ms   "
          f"fori-slice {l:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
