#!/usr/bin/env python
"""Attribute the training step: forward-only vs value_and_grad time at
batch 128 (UNet).  Inference runs at ~39% MFU but the train step at ~28%
— is the backward disproportionately slow (vs its 2x FLOPs), or is the
gap in the optimizer/BN-stat plumbing?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_fwd_bwd_split.py
"""

import time
from functools import partial

import numpy as np

B, P, N_LONG = 128, 128, 6


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                b = (a[0] + i.astype(a[0].dtype) * 1e-6,) + a[1:]
                return acc + fn(*b).astype(jnp.float32)
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

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.losses import combined_loss

    model = create_model("UNet.UNet", dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).rand(B, P, P, 3), jnp.bfloat16)
    y = jnp.asarray(
        (np.random.RandomState(1).rand(B, P, P, 1) > 0.8), jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=True)
    )(jax.random.PRNGKey(0))
    params, bstats = variables["params"], variables["batch_stats"]

    def loss_fn(params, x):
        out, upd = model.apply(
            {"params": params, "batch_stats": bstats}, x, train=True,
            mutable=["batch_stats"])
        return combined_loss(out, y, 1)[0]

    fwd_ms = timed(lambda t: loss_fn(params, t), x)
    vg = jax.value_and_grad(loss_fn)

    def step(t):
        l, g = vg(params, t)
        return l + sum(jnp.sum(p).astype(jnp.float32)
                       for p in jax.tree.leaves(g)[:1])

    both_ms = timed(step, x)
    print(f"UNet b{B} train-mode: fwd+loss {fwd_ms:.2f} ms   "
          f"fwd+bwd {both_ms:.2f} ms   backward ≈ {both_ms - fwd_ms:.2f} ms "
          f"({(both_ms - fwd_ms) / fwd_ms:.2f}x fwd; FLOP ratio is 2x)",
          flush=True)


if __name__ == "__main__":
    main()
