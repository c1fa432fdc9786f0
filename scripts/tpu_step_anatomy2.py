#!/usr/bin/env python
"""Single-run decomposition of the b128 train step (cross-run relay
drift makes multi-run attribution invalid): fwd+loss / +bwd / +optimizer
/ +NaN-guard, all timed with the same loop-in-jit methodology in one
process.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_step_anatomy2.py
"""

import time

import numpy as np

B, P, N_LONG = 128, 128, 6


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.losses import combined_loss
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn

    model = create_model("UNet.UNet", dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    state0 = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, P, P, 3), jnp.bfloat16))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, P, P, 3), jnp.bfloat16)
    labs = jnp.asarray((rng.rand(B, P, P, 1) > 0.8), jnp.float32)

    def loss_fn(params, batch_stats, x, k):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": k})
        return combined_loss(out, labs, 1)[0], mut["batch_stats"]

    step_full = make_batch_step_fn(model, tx, n_classes=1,
                                   compute_dtype=jnp.bfloat16)

    def timed(body_fn):
        def make(n):
            @jax.jit
            def run(state, imgs):
                def body(i, carry):
                    st, acc = carry
                    st, out = body_fn(
                        st, imgs + i.astype(imgs.dtype) * 1e-6,
                        jax.random.fold_in(jax.random.PRNGKey(7), i))
                    return st, acc + out
                st, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
                return acc

            return run

        r1, rN = make(1), make(N_LONG)
        float(r1(state0, imgs)); float(rN(state0, imgs))
        t0 = time.perf_counter(); float(r1(state0, imgs))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rN(state0, imgs))
        tN = time.perf_counter() - t0
        return (tN - t1) / (N_LONG - 1) * 1e3

    def v_fwd(st, x, k):
        loss, _ = loss_fn(st.params, st.batch_stats, x, k)
        return st, loss.astype(jnp.float32)

    def v_bwd(st, x, k):
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, st.batch_stats, x, k)
        # consume grads so nothing is dead-code-eliminated; carry params
        # unchanged (keeps variant costs comparable)
        gsum = sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(g))
        return st, loss.astype(jnp.float32) + gsum * 1e-20

    def v_opt(st, x, k):
        (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, st.batch_stats, x, k)
        upd, new_opt = tx.update(g, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, upd)
        st = st.replace(params=new_params, batch_stats=bs, opt_state=new_opt)
        return st, loss.astype(jnp.float32)

    def v_full(st, x, k):
        st, loss, ok = step_full(st, x, labs, k)
        return st, loss.astype(jnp.float32)

    for name, fn in [("fwd+loss", v_fwd), ("fwd+bwd", v_bwd),
                     ("fwd+bwd+opt", v_opt), ("full step (+guard)", v_full)]:
        print(f"  {name:20s}: {timed(fn):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
