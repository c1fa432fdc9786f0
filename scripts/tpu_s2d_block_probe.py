#!/usr/bin/env python
"""Probe: space-to-depth execution space (ops/s2d.py) vs the plain
formulation for the training slow tail's narrow full-res blocks.

Round-3 attribution: multiresblock8+9 = 67% of MultiResUNet's step, the
five x0 nodes = 73% of NestedUNet's, all bound by lane-padding traffic
amplification (8-53 channels pad to 128 lanes -> 2.5-16x physical bytes
per BN/concat/shortcut pass), NOT by the MXU (isolated convs run 37-165
TF/s).  The s2d transform runs the SAME math in (H/2, W/2, 4C) space:
4x the conv FLOPs at ~4x better lane fill (≈flat MXU time at these
padding ceilings) but 4x less physical traffic on every plumbing pass
that dominates the cost.  Exact parity is pinned by tests/test_s2d.py;
this probe carries the hardware verdict, within-run, at three measured
slow-tail geometries:

  m9  Multiresblock composite, 64 -> 8/17/26 (cat 51) @128^2
  m8  Multiresblock composite, 128 -> 17/35/53 (cat 105) @64^2
  x0  NestedUNet-style double conv, 192 -> 32 -> 32 @128^2

Both variants include train-mode one-pass BN batch stats (the production
default) and the s2d variant pays its boundary transforms (s2d at entry,
d2s at exit) — the conservative, single-block accounting.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_s2d_block_probe.py
Env: S2D_BATCH (128), S2D_N (21), S2D_GEOMS (m9,m8,x0), S2D_HW_DIV (1;
set e.g. 8 to shrink spatial extents for CPU smoke runs of this file).
"""

import os
import time

import numpy as np

B = int(os.environ.get("S2D_BATCH", "128"))
N_LONG = int(os.environ.get("S2D_N", "21"))
GEOMS = os.environ.get("S2D_GEOMS", "m9,m8,x0").split(",")
HW_DIV = int(os.environ.get("S2D_HW_DIV", "1"))


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.ops.s2d import (
        bn_stats,
        conv_s2d,
        depth_to_space,
        expand_vector,
        s2d_kernel,
        space_to_depth,
    )
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    dt = jnp.bfloat16

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bn_plain(h, g, b):
        hf = h.astype(jnp.float32)
        mu = hf.mean(axis=(0, 1, 2))
        var = jnp.maximum((hf * hf).mean(axis=(0, 1, 2)) - mu * mu, 0.0)
        y = (hf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        return y.astype(h.dtype)

    def bn_s(h, g, b):
        mu, var = bn_stats(h)
        hf = h.astype(jnp.float32)
        y = ((hf - expand_vector(mu))
             * jax.lax.rsqrt(expand_vector(var) + 1e-5)
             * expand_vector(g) + expand_vector(b))
        return y.astype(h.dtype)

    def build_mres(cin, filters, hw, seed):
        w = filters * 1.67
        f3, f5, f7 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
        out_f = f3 + f5 + f7
        rng = np.random.RandomState(seed)
        p = {
            "w1": jnp.asarray(rng.randn(3, 3, cin, f3) * 0.05, dt),
            "w2": jnp.asarray(rng.randn(3, 3, f3, f5) * 0.05, dt),
            "w3": jnp.asarray(rng.randn(3, 3, f5, f7) * 0.05, dt),
            "ws": jnp.asarray(rng.randn(1, 1, cin, out_f) * 0.05, dt),
        }
        for nm, c in [("g1", f3), ("g2", f5), ("g3", f7), ("gs", out_f),
                      ("gc", out_f)]:
            p[nm] = jnp.ones((c,), jnp.float32)
            p["b" + nm[1:]] = jnp.zeros((c,), jnp.float32)
        x = jnp.asarray(rng.rand(B, hw, hw, cin) - 0.5, dt)

        def plain(p, x):
            a = jnp.maximum(bn_plain(conv(x, p["w1"]), p["g1"], p["b1"]), 0)
            b = jnp.maximum(bn_plain(conv(a, p["w2"]), p["g2"], p["b2"]), 0)
            c = jnp.maximum(bn_plain(conv(b, p["w3"]), p["g3"], p["b3"]), 0)
            s = bn_plain(conv(x, p["ws"]), p["gs"], p["bs"])
            y = jnp.concatenate([a, b, c], axis=-1) + s
            return bn_plain(jnp.maximum(y, 0), p["gc"], p["bc"])

        def s2d(p, x):
            xs = space_to_depth(x)
            a = jnp.maximum(bn_s(conv_s2d(xs, s2d_kernel(p["w1"])),
                                 p["g1"], p["b1"]), 0)
            b = jnp.maximum(bn_s(conv_s2d(a, s2d_kernel(p["w2"])),
                                 p["g2"], p["b2"]), 0)
            c = jnp.maximum(bn_s(conv_s2d(b, s2d_kernel(p["w3"])),
                                 p["g3"], p["b3"]), 0)
            s = bn_s(conv_s2d(xs, s2d_kernel(p["ws"])), p["gs"], p["bs"])
            y = jnp.concatenate([a, b, c], axis=-1) + s
            return depth_to_space(bn_s(jnp.maximum(y, 0), p["gc"], p["bc"]))

        label = f"{cin}->{f3}/{f5}/{f7} @{hw}^2"
        return p, x, plain, s2d, label

    def build_x0(cin, cout, hw, seed):
        rng = np.random.RandomState(seed)
        p = {
            "w1": jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dt),
            "w2": jnp.asarray(rng.randn(3, 3, cout, cout) * 0.05, dt),
            "g1": jnp.ones((cout,), jnp.float32),
            "b1": jnp.zeros((cout,), jnp.float32),
            "g2": jnp.ones((cout,), jnp.float32),
            "b2": jnp.zeros((cout,), jnp.float32),
        }
        x = jnp.asarray(rng.rand(B, hw, hw, cin) - 0.5, dt)

        def plain(p, x):
            a = jnp.maximum(bn_plain(conv(x, p["w1"]), p["g1"], p["b1"]), 0)
            return jnp.maximum(bn_plain(conv(a, p["w2"]), p["g2"], p["b2"]), 0)

        def s2d(p, x):
            xs = space_to_depth(x)
            a = jnp.maximum(bn_s(conv_s2d(xs, s2d_kernel(p["w1"])),
                                 p["g1"], p["b1"]), 0)
            y = jnp.maximum(bn_s(conv_s2d(a, s2d_kernel(p["w2"])),
                                 p["g2"], p["b2"]), 0)
            return depth_to_space(y)

        return p, x, plain, s2d, f"{cin}->{cout}->{cout} @{hw}^2"

    builders = {
        "m9": lambda: build_mres(64, 32, 128 // HW_DIV, 0),
        "m8": lambda: build_mres(128, 64, 64 // HW_DIV, 1),
        "x0": lambda: build_x0(192, 32, 128 // HW_DIV, 2),
    }

    for geom in GEOMS:
        p, x, plain, s2d, label = builders[geom]()

        # one-shot parity check at this geometry (bf16 tolerance).
        # Jitted as ONE program: eager op-by-op dispatch through this
        # image's async relay costs seconds per op and stalled the first
        # run of this probe for >13 minutes before any output.
        @jax.jit
        def _parity(p, x):
            ref = plain(p, x)[:2, :16, :16].astype(jnp.float32)
            got = s2d(p, x)[:2, :16, :16].astype(jnp.float32)
            return jnp.abs(ref - got).max()

        maxd = float(_parity(p, x))

        def timed(fn):
            # ONE executable, traced trip count — relay compiles dominate.
            @jax.jit
            def r(p, x, n):
                def body(i, acc):
                    y = fn(p, x + i.astype(x.dtype) * 1e-6)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            def _t(n):
                t0 = time.perf_counter()
                float(r(p, x, jnp.int32(n)))
                return time.perf_counter() - t0

            _t(1); _t(N_LONG)  # compile + warm
            t1 = min(_t(1) for _ in range(3))
            tN = min(_t(N_LONG) for _ in range(3))
            return (tN - t1) / (N_LONG - 1) * 1e3

        def gradded(fn):
            def g(p, x):
                def scalar(pp):
                    return fn(pp, x).astype(jnp.float32).mean()
                grads = jax.grad(scalar)(p)
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(grads))
            return g

        print(f"[{geom}] {label}  batch {B}  parity maxdiff {maxd:.3e}",
              flush=True)
        for nm, fn in [("plain", plain), ("s2d", s2d)]:
            f = timed(fn)
            fb = timed(gradded(fn))
            print(f"  {nm:6s} fwd {f:8.3f} ms   fwd+bwd {fb:8.3f} ms",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
