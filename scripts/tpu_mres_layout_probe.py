#!/usr/bin/env python
"""Layout probe for the narrow-channel full-resolution pathology
(round-3 slow-tail attribution, experiments_record.md).

tpu_mres_block_iso.py showed the full Multiresblock-9 math is 14.0 ms
fwd+bwd of which only 3.2 ms is the convs — the rest is concat/
shortcut/BN passes over tensors with 8-51 channels.  On TPU the minor
dim is padded to 128 lanes, so every HBM/VPU pass over a (B,H,W,C<13)
NHWC tensor moves up to 16x its logical bytes.

Hypothesis: computing the SAME math with W as the minor (lane) dim —
NCHW, W=128 exactly fills the lanes — makes the plumbing passes pay
logical-size traffic only, at the price of convs seeing NCHW
dimension_numbers (XLA transposes internally for the MXU).

Variants (same math as iso probe mode D, 6 train-mode BNs):
  nhwc    baseline: NHWC tensors, NHWC convs
  nchw    NCHW tensors end-to-end, convs via NCHW dimension_numbers
  onepass NHWC but BN stats in one pass (E[x^2]-E[x]^2) - pass saving only

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_mres_layout_probe.py
"""

import os
import time

import numpy as np

B = int(os.environ.get("ISO_BATCH", "128"))
HW = int(os.environ.get("ISO_HW", "128"))
CIN = int(os.environ.get("ISO_CIN", "64"))
FILTERS = int(os.environ.get("ISO_FILTERS", "32"))
N_LONG = int(os.environ.get("ISO_N_LONG", "21"))


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    W = FILTERS * 1.67
    f3, f5, f7 = int(W * 0.167), int(W * 0.333), int(W * 0.5)
    out_f = f3 + f5 + f7
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    x_nhwc = jnp.asarray(rng.rand(B, HW, HW, CIN) - 0.5, dt)
    params = {
        "w1": jnp.asarray(rng.randn(3, 3, CIN, f3) * 0.05, dt),
        "w2": jnp.asarray(rng.randn(3, 3, f3, f5) * 0.05, dt),
        "w3": jnp.asarray(rng.randn(3, 3, f5, f7) * 0.05, dt),
        "ws": jnp.asarray(rng.randn(1, 1, CIN, out_f) * 0.05, dt),
    }
    for nm, c in [("g1", f3), ("g2", f5), ("g3", f7), ("gs", out_f),
                  ("gc", out_f), ("ga", out_f)]:
        params[nm] = jnp.ones((c,), jnp.float32)
        params["b" + nm[1:]] = jnp.zeros((c,), jnp.float32)

    def make_variant(layout, onepass=False):
        # layout: "nhwc" or "nchw".  In nchw, tensors are (B, C, H, W) and
        # convs use NCHW dimension_numbers; BN reduces over (0, 2, 3).
        if layout == "nhwc":
            dn = ("NHWC", "HWIO", "NHWC")
            red = (0, 1, 2)
            cax = -1

            def bcast(v):
                return v
        else:
            dn = ("NCHW", "HWIO", "NCHW")
            red = (0, 2, 3)
            cax = 1

            def bcast(v):
                return v[:, None, None]

        def conv(h, w):
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn)

        def bn(h, g, b):
            hf = h.astype(jnp.float32)
            if onepass:
                mu = hf.mean(axis=red)
                var = (hf * hf).mean(axis=red) - mu * mu
            else:
                mu = hf.mean(axis=red)
                var = ((hf - bcast(mu)) ** 2).mean(axis=red)
            y = ((hf - bcast(mu)) * bcast(jax.lax.rsqrt(var + 1e-5))
                 * bcast(g) + bcast(b))
            return y.astype(h.dtype)

        def fn(p, x):
            a = bn(jnp.maximum(conv(x, p["w1"]), 0), p["g1"], p["b1"])
            b_ = bn(jnp.maximum(conv(a, p["w2"]), 0), p["g2"], p["b2"])
            c = bn(jnp.maximum(conv(b_, p["w3"]), 0), p["g3"], p["b3"])
            s = bn(conv(x, p["ws"]), p["gs"], p["bs"])
            y = bn(jnp.concatenate([a, b_, c], axis=cax), p["gc"], p["bc"])
            y = bn(y + s, p["ga"], p["ba"])
            return jnp.maximum(y, 0).astype(jnp.float32).mean()

        return fn

    def timed(fn, x):
        def make(n):
            @jax.jit
            def r(p, xx):
                def body(i, acc):
                    return acc + fn(p, xx + i.astype(xx.dtype) * 1e-6)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return r

        r1, rN = make(1), make(N_LONG)
        float(r1(params, x)); float(rN(params, x))

        def t(f):
            t0 = time.perf_counter()
            float(f(params, x))
            return time.perf_counter() - t0

        t1 = min(t(r1) for _ in range(3))
        tN = min(t(rN) for _ in range(3))
        return (tN - t1) / (N_LONG - 1) * 1e3

    def gradf(fn):
        return lambda p, x: sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree.leaves(jax.grad(lambda pp: fn(pp, x))(p)))

    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    print(f"m-geometry: {CIN} -> {f3}/{f5}/{f7} (cat {out_f}) @ {HW}^2, "
          f"batch {B}", flush=True)

    # parity nhwc vs nchw (value of loss must agree)
    v_nhwc = float(jax.jit(make_variant("nhwc"))(params, x_nhwc))
    v_nchw = float(jax.jit(make_variant("nchw"))(params, x_nchw))
    print(f"parity: nhwc {v_nhwc:.6f} nchw {v_nchw:.6f} "
          f"(diff {abs(v_nhwc - v_nchw):.2e})", flush=True)

    for name, fn, x in [
        ("nhwc", make_variant("nhwc"), x_nhwc),
        ("nchw", make_variant("nchw"), x_nchw),
        ("nhwc-1pass", make_variant("nhwc", onepass=True), x_nhwc),
        ("nchw-1pass", make_variant("nchw", onepass=True), x_nchw),
    ]:
        f = timed(fn, x)
        g = timed(gradf(fn), x)
        print(f"{name:12s} fwd {f:8.3f} ms   fwd+bwd {g:8.3f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
