#!/usr/bin/env python
"""Probe: is the optimizer's 12.8 ms/step (UNet batch-128 anatomy,
scripts/tpu_step_anatomy2.py) a property of the per-leaf pytree
structure, or genuinely irreducible state traffic?

Round-2 probed FUSION (hand-fused single tree.map: no change, 89.9 vs
88.0 ms) but never LEAF STRUCTURE.  UNet's 31M params live in ~90
leaves; the RMSprop chain touches params + grads + sq + momentum
(~500 MB of f32 traffic) which at 819 GB/s HBM should cost ~1.5 ms —
12.8 ms is ~8x over that roofline.  Hypotheses:
  (a) per-leaf kernel/fusion overhead: ~90 leaves x ~5 chain stages;
  (b) small-leaf tile padding (BN scale/bias, conv bias leaves pad to
      (8,128) tiles);
  (c) neither — the cost is real traffic that simply cannot overlap
      with the backward's tail, and the anatomy delta is scheduling.

Discriminating measurement, all within one run (loop-in-jit, t(N)-t(1)
differencing per the relay methodology):
  1. per-leaf optax chain isolated (production tx);
  2. the same math on ONE flat f32 vector (pre-flattened state);
  3. flat math + per-step ravel/unravel (what integration would cost).

If (2) << (1), leaf structure is the cost and a flat-buffer optimizer
is worth integrating.  If (2) ~= (1) ~= roofline, the anatomy delta was
scheduling shadow, not optimizer cost — record and close.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_opt_flat_probe.py
"""

import os
import time
from functools import partial

import numpy as np

N_LONG = 21
ALPHA, EPS, WD, MOM, CLIP, LR = 0.99, 1e-8, 1e-8, 0.999, 1.0, 1e-4
MODEL = os.environ.get("OPT_MODEL", "UNet.UNet")


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    model = create_model(MODEL, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, 128, 128, 3), jnp.bfloat16),
            train=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{MODEL}: {n_params/1e6:.1f}M params in {n_leaves} leaves",
          flush=True)

    tx = make_optimizer(LR)
    opt_state = jax.jit(tx.init)(params)

    def timed(fn, *args):
        """fn(n, *args) -> scalar; returns per-iteration seconds."""
        float(fn(1, *args))
        float(fn(N_LONG, *args))
        t0 = time.perf_counter(); float(fn(1, *args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fn(N_LONG, *args))
        t2 = time.perf_counter() - t0
        return (t2 - t1) / (N_LONG - 1)

    # ---- 1. per-leaf optax chain (the production path, isolated) ----
    @partial(jax.jit, static_argnums=(0,))
    def run_tree(n, params, opt_state):
        def body(i, carry):
            params, opt_state = carry
            g = jax.tree.map(
                lambda p: p * (1e-3 * (1.0 + i)), params)  # defeat CSE
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        params, opt_state = jax.lax.fori_loop(
            0, n, body, (params, opt_state))
        return jax.tree_util.tree_leaves(params)[0].ravel()[0]

    per_tree = timed(run_tree, params, opt_state)
    print(f"per-leaf optax chain : {per_tree*1e3:7.2f} ms/step", flush=True)

    # ---- 2. same math on one flat vector ----
    flat, unravel = ravel_pytree(params)
    flat = flat.astype(jnp.float32)
    sq0 = jnp.zeros_like(flat)
    mom0 = jnp.zeros_like(flat)

    def flat_update(g, p, sq, mom):
        gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
        g = g * jnp.minimum(1.0, CLIP / jnp.maximum(gnorm, 1e-16))
        g = g + WD * p
        sq = ALPHA * sq + (1 - ALPHA) * jnp.square(g)
        g = g / (jnp.sqrt(sq) + EPS)
        mom = MOM * mom + g
        return p - LR * mom, sq, mom

    @partial(jax.jit, static_argnums=(0,))
    def run_flat(n, p, sq, mom):
        def body(i, carry):
            p, sq, mom = carry
            g = p * (1e-3 * (1.0 + i))
            return flat_update(g, p, sq, mom)

        p, sq, mom = jax.lax.fori_loop(0, n, body, (p, sq, mom))
        return p[0]

    per_flat = timed(run_flat, flat, sq0, mom0)
    print(f"flat single vector   : {per_flat*1e3:7.2f} ms/step", flush=True)

    # ---- 3. flat math + per-step ravel/unravel (integration cost) ----
    @partial(jax.jit, static_argnums=(0,))
    def run_flat_ravel(n, params, sq, mom):
        def body(i, carry):
            params, sq, mom = carry
            g_tree = jax.tree.map(lambda p: p * (1e-3 * (1.0 + i)), params)
            g, _ = ravel_pytree(g_tree)
            p, _ = ravel_pytree(params)
            p, sq, mom = flat_update(g, p, sq, mom)
            return unravel(p), sq, mom

        params, sq, mom = jax.lax.fori_loop(0, n, body, (params, sq, mom))
        return jax.tree_util.tree_leaves(params)[0].ravel()[0]

    per_ravel = timed(run_flat_ravel, params, sq0, mom0)
    print(f"flat + ravel/unravel : {per_ravel*1e3:7.2f} ms/step", flush=True)

    # ---- 4. the actual integration candidate: optax.flatten chain ----
    # (make_optimizer(flatten=True): bit-exact vs per-leaf, test_optim.py)
    txf = make_optimizer(LR, flatten=True)
    opt_state_f = jax.jit(txf.init)(params)

    @partial(jax.jit, static_argnums=(0,))
    def run_flatten_tx(n, params, opt_state):
        def body(i, carry):
            params, opt_state = carry
            g = jax.tree.map(
                lambda p: p * (1e-3 * (1.0 + i)), params)  # defeat CSE
            updates, opt_state = txf.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        params, opt_state = jax.lax.fori_loop(
            0, n, body, (params, opt_state))
        return jax.tree_util.tree_leaves(params)[0].ravel()[0]

    per_flatten_tx = timed(run_flatten_tx, params, opt_state_f)
    print(f"optax.flatten chain  : {per_flatten_tx*1e3:7.2f} ms/step",
          flush=True)

    # Roofline reference: bytes ~= params(4) read+write, grads read,
    # sq read+write, mom read+write -> 7 passes of 4*n_params bytes.
    gb = 7 * 4 * n_params / 1e9
    print(f"roofline ~{gb:.2f} GB -> ~{gb/0.819:.2f} ms at 819 GB/s",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
