#!/usr/bin/env python
"""Attribute the train-mode forward gap (VERDICT r3 weakness 2).

Round-3 anatomy: UNet trains at 31.1% MFU vs 38.8% inference; the
backward (2.2x fwd for 2x FLOPs) and optimizer (irreducible f32 state
traffic) were cleared, leaving the train-mode forward itself — 23.3 ms
(fwd+loss, batch 128) vs the eval forward's proportional ~15 ms — never
prefix-profiled after one-pass BN landed.  This script times truncated
UNet prefixes (inc; +down1; ...; +outc) in BOTH modes within one run:

  eval : BN normalizes with running stats (no reductions)
  train: BN computes one-pass batch stats (E[x], E[x^2]) + returns
         updated running stats (mutable collection carried through the
         loop, exactly like the production step)

Consecutive prefix differences attribute the per-stage cost; the
train-minus-eval column shows where the train-mode overhead lives
(presumed: the per-stage stat reductions + the f32 running-stat
round-trips).  A final full-model row adds sigmoid+BCE+dice loss to
bracket the production fwd+loss figure.

Methodology: loop-in-jit, t(N)-t(1) differencing, min of 3, within-run
pairs only (relay drift invalidates cross-run math — round-3 lesson).
"""

import time
from functools import partial

import numpy as np

BATCH = 128
PATCH = 128
N_LONG = 11


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.ops.blocks import DoubleConv, Down, OutConv, Up
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    dt = jnp.bfloat16
    model = create_model("UNet.UNet", dtype=dt)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), dt)
    y = jnp.asarray(
        (np.random.RandomState(1).rand(BATCH, PATCH, PATCH, 1) > 0.9), dt)
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=False)
    )(jax.random.PRNGKey(0))

    def make_prefix(n_stages):
        class Prefix(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                acc = [DoubleConv(3, 64, dtype=dt, name="inc")(x, train)]
                downs = [Down(64, 128, dtype=dt, name="down1"),
                         Down(128, 256, dtype=dt, name="down2"),
                         Down(256, 512, dtype=dt, name="down3"),
                         Down(512, 1024, dtype=dt, name="down4")]
                for k in range(min(n_stages - 1, 4)):
                    acc.append(downs[k](acc[-1], train))
                h = acc[-1]
                ups = [Up(1024, 512, dtype=dt, name="up1"),
                       Up(512, 256, dtype=dt, name="up2"),
                       Up(256, 128, dtype=dt, name="up3"),
                       Up(128, 64, dtype=dt, name="up4")]
                for k in range(max(0, min(n_stages - 5, 4))):
                    h = ups[k](h, acc[3 - k], train)
                if n_stages >= 10:
                    h = OutConv(64, 1, dtype=dt, name="outc")(h)
                return h

        return Prefix()

    def timed(run):
        def make(n):
            @partial(jax.jit, static_argnums=(2,))
            def loop(variables, x, n):
                def body(i, carry):
                    acc, bs = carry
                    xi = x + i.astype(dt) * 1e-6
                    out, bs = run({"params": variables["params"],
                                   "batch_stats": bs}, xi)
                    return acc + out, bs
                acc, _ = jax.lax.fori_loop(
                    0, n, body, (jnp.float32(0), variables["batch_stats"]))
                return acc
            return loop

        l1, lN = make(1), make(N_LONG)
        float(l1(variables, x, 1)); float(lN(variables, x, N_LONG))

        def t(fn, n):
            t0 = time.perf_counter()
            float(fn(variables, x, n))
            return time.perf_counter() - t0

        t1 = min(t(l1, 1) for _ in range(3))
        tN = min(t(lN, N_LONG) for _ in range(3))
        return (tN - t1) / (N_LONG - 1) * 1e3

    names = ["inc", "down1", "down2", "down3", "down4",
             "up1", "up2", "up3", "up4", "outc"]
    print(f"UNet train-vs-eval forward prefixes, batch {BATCH} "
          f"patch {PATCH} bf16 (one-pass train BN)")
    print(f"{'prefix':10s} {'eval ms':>9s} {'train ms':>9s} "
          f"{'stage ev':>9s} {'stage tr':>9s} {'tr-ev':>7s}")
    cum_e = cum_t = 0.0
    for n_stages in range(1, 11):
        prefix = make_prefix(n_stages)

        def run_eval(v, xi, m=prefix):
            out = m.apply(v, xi, False)
            return out.mean().astype(jnp.float32), v["batch_stats"]

        def run_train(v, xi, m=prefix):
            out, mut = m.apply(v, xi, True, mutable=["batch_stats"])
            return out.mean().astype(jnp.float32), mut["batch_stats"]

        te, tt = timed(run_eval), timed(run_train)
        print(f"+{names[n_stages-1]:9s} {te:9.2f} {tt:9.2f} "
              f"{te-cum_e:9.2f} {tt-cum_t:9.2f} {tt-te:7.2f}", flush=True)
        cum_e, cum_t = te, tt

    # bracket: full model + the production combined loss (fwd+loss)
    from jcfszxc_unet_tpu.train.losses import combined_loss

    def run_loss(v, xi):
        out, mut = model.apply(v, xi, train=True, mutable=["batch_stats"])
        loss, _, _ = combined_loss(out, y, 1)
        return loss.astype(jnp.float32), mut["batch_stats"]

    tl = timed(run_loss)
    print(f"{'full+loss':10s} {'':>9s} {tl:9.2f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
