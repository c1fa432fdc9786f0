#!/usr/bin/env python
"""Decompose multiresblock9's 52.7 ms in-context train cost (round-3
prefix attribution) — isolated forward convs run at 37-73 TFLOP/s
(tpu_narrow_pack_probe.py), so the MXU is NOT the binding resource; this
probe times grad() of incremental composites to find what is.

Variants at m9 geometry (B=128, 128^2, Cin=64 -> f3/f5/f7 = 8/17/26,
out 51), each timed as fwd-only and as value_and_grad:

  A  conv chain + ReLUs                      (3 convs)
  B  A + 1x1 shortcut + concat + add         (+ concat/add plumbing)
  C  B + 6 BNs in EVAL mode (running stats)  (+ normalize passes)
  D  B + 6 BNs in TRAIN mode (batch stats)   (+ two-pass stats + bwd)
     == the full production Multiresblock math

Deltas: B-A concat/shortcut, C-B normalize, D-C train-BN statistics.
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

    x = jnp.asarray(rng.rand(B, HW, HW, CIN) - 0.5, dt)
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

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn(h, g, b, train):
        hf = h.astype(jnp.float32)
        if train:
            mu = hf.mean(axis=(0, 1, 2))
            var = ((hf - mu) ** 2).mean(axis=(0, 1, 2))
        else:
            mu, var = 0.1 * g, 1.0 + 0.0 * g  # fixed "running" stats
        y = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        return y.astype(h.dtype)

    def variant(p, x, mode):
        a = jnp.maximum(conv(x, p["w1"]), 0)
        if mode >= 2:
            a = bn(a, p["g1"], p["b1"], mode == 3)
        b = jnp.maximum(conv(a, p["w2"]), 0)
        if mode >= 2:
            b = bn(b, p["g2"], p["b2"], mode == 3)
        c = jnp.maximum(conv(b, p["w3"]), 0)
        if mode >= 2:
            c = bn(c, p["g3"], p["b3"], mode == 3)
        if mode == 0:
            return a.mean() + b.mean() + c.mean()
        s = conv(x, p["ws"])
        if mode >= 2:
            s = bn(s, p["gs"], p["bs"], mode == 3)
        y = jnp.concatenate([a, b, c], axis=-1)
        if mode >= 2:
            y = bn(y, p["gc"], p["bc"], mode == 3)
        y = y + s
        if mode >= 2:
            y = bn(y, p["ga"], p["ba"], mode == 3)
        return jnp.maximum(y, 0).astype(jnp.float32).mean()

    def timed(fn):
        def make(n):
            @jax.jit
            def r(p, x):
                def body(i, acc):
                    return acc + fn(p, x + i.astype(x.dtype) * 1e-6)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return r

        r1, rN = make(1), make(N_LONG)
        float(r1(params, x)); float(rN(params, x))
        t1 = min(_t(r1) for _ in range(3))
        tN = min(_t(rN) for _ in range(3))
        return (tN - t1) / (N_LONG - 1) * 1e3

    def _t(fn):
        t0 = time.perf_counter()
        float(fn(params, x))
        return time.perf_counter() - t0

    names = ["A convs", "B +cat/short", "C +evalBN", "D +trainBN(full)"]
    print(f"m-geometry: {CIN} -> {f3}/{f5}/{f7} (cat {out_f}) @ {HW}^2, "
          f"batch {B}")
    for mode in range(4):
        f = timed(lambda p, x, m=mode: variant(p, x, m))
        g = timed(lambda p, x, m=mode: sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree.leaves(
                jax.grad(lambda pp: variant(pp, x, m))(p))))
        print(f"{names[mode]:18s} fwd {f:8.3f} ms   fwd+bwd {g:8.3f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
