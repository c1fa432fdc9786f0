#!/usr/bin/env python
"""Fused-plumbing probe for the Multiresblock tail (VERDICT r3 item 2).

Round-3 attribution: 77% of a Multiresblock's fwd+bwd is concat/
shortcut/BN plumbing, and the tail — BN_c(concat) -> +shortcut ->
BN_a -> ReLU (reference unet_parts.py:703-713) — costs two sequential
train-BN reduction passes because BN_a's statistics need BN_c's
*output* materialized.

The fold: given batch statistics, every BN is per-channel affine, so

    y2   = BN_c(cat) + sh        (sh = the shortcut's post-BN output)
         = alpha_c*cat + beta_c + sh
    E[y2]   = alpha_c*mu_cat + beta_c + mu_sh
    Var[y2] = alpha_c^2*Var[cat] + Var[sh] + 2*alpha_c*Cov[cat, sh]

i.e. ALL statistics both BNs need derive from FIVE reductions over
(cat, sh) — E[cat], E[cat^2], E[sh], E[sh^2], E[cat*sh] — which XLA
fuses into ONE read, after which the whole tail collapses to a single
fused FMA+ReLU: relu(P*cat + Q*sh + R).  That removes the y2
materialization (1 write + 2 reads of a 51-channel tensor the (8,128)
tile pads 2.5x) per block per step.  This is an *algebraic* rewrite XLA
cannot do itself (it doesn't know BN semantics), but once written the
ops are plain XLA — no Pallas, and the backward comes from autodiff of
the folded expression.

Variants (m9 and m8 geometries, batch 128, bf16 activations, f32 stats,
one-pass E[x^2]-E[x]^2 statistics = production TRAIN_BN_ONE_PASS_STATS):

  tailP : production tail (2 sequential stat passes + elementwise)
  tailF : folded tail (1 fused stat pass + 1 FMA)
  blockP/blockF: the full Multiresblock math (3 chained convs + 1x1
    shortcut, each with its own in-Conv2dBatchnorm BN, then the tail)
    so the delta is read in context.

Both variants also return their running-stat reductions (kept live) so
neither side gets a dead-code discount.  fwd and fwd+bwd via grad;
loop-in-jit t(N)-t(1), min of 3, within-run pairs only.
"""

import os
import time

import numpy as np

B = int(os.environ.get("FUSE_BATCH", "128"))
N_LONG = int(os.environ.get("FUSE_N_LONG", "21"))
EPS = 1e-5


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stats1p(hf):
        mu = hf.mean(axis=(0, 1, 2))
        var = jnp.maximum((hf * hf).mean(axis=(0, 1, 2)) - mu * mu, 0.0)
        return mu, var

    def bn_train(h, g, b):
        hf = h.astype(jnp.float32)
        mu, var = stats1p(hf)
        y = (hf - mu) * jax.lax.rsqrt(var + EPS) * g + b
        return y.astype(h.dtype), mu, var

    def tail_P(cat, sh, p):
        """Production: BN_c(cat) -> +sh -> BN_a -> ReLU, bf16 between."""
        yc, mu_c, var_c = bn_train(cat, p["gc"], p["bc"])
        y2 = yc + sh
        ya, mu_a, var_a = bn_train(y2, p["ga"], p["ba"])
        out = jnp.maximum(ya, 0)
        return out, (mu_c, var_c, mu_a, var_a)

    def tail_F(cat, sh, p):
        """Folded: 5 reductions in one pass, then one FMA+ReLU."""
        catf = cat.astype(jnp.float32)
        shf = sh.astype(jnp.float32)
        mu_c = catf.mean(axis=(0, 1, 2))
        m2_c = (catf * catf).mean(axis=(0, 1, 2))
        mu_s = shf.mean(axis=(0, 1, 2))
        m2_s = (shf * shf).mean(axis=(0, 1, 2))
        m_cs = (catf * shf).mean(axis=(0, 1, 2))
        var_c = jnp.maximum(m2_c - mu_c * mu_c, 0.0)
        var_s = jnp.maximum(m2_s - mu_s * mu_s, 0.0)
        cov = m_cs - mu_c * mu_s
        alpha_c = p["gc"] * jax.lax.rsqrt(var_c + EPS)
        beta_c = p["bc"] - mu_c * alpha_c
        mu_a = alpha_c * mu_c + beta_c + mu_s
        var_a = jnp.maximum(
            alpha_c * alpha_c * var_c + var_s + 2.0 * alpha_c * cov, 0.0)
        r_a = jax.lax.rsqrt(var_a + EPS)
        P = p["ga"] * r_a * alpha_c
        Q = p["ga"] * r_a
        R = p["ga"] * r_a * (beta_c - mu_a) + p["ba"]
        out = jnp.maximum(catf * P + shf * Q + R, 0).astype(cat.dtype)
        return out, (mu_c, var_c, mu_a, var_a)

    def make_geometry(cin, filters, hw):
        W = filters * 1.67
        f3, f5, f7 = int(W * 0.167), int(W * 0.333), int(W * 0.5)
        out_f = f3 + f5 + f7
        rng = np.random.RandomState(0)
        dt = jnp.bfloat16
        x = jnp.asarray(rng.rand(B, hw, hw, cin) - 0.5, dt)
        p = {
            "w1": jnp.asarray(rng.randn(3, 3, cin, f3) * 0.05, dt),
            "w2": jnp.asarray(rng.randn(3, 3, f3, f5) * 0.05, dt),
            "w3": jnp.asarray(rng.randn(3, 3, f5, f7) * 0.05, dt),
            "ws": jnp.asarray(rng.randn(1, 1, cin, out_f) * 0.05, dt),
        }
        for nm, c in [("g1", f3), ("g2", f5), ("g3", f7), ("gs", out_f),
                      ("gc", out_f), ("ga", out_f)]:
            p[nm] = jnp.ones((c,), jnp.float32) * 1.1
            p["b" + nm[1:]] = jnp.zeros((c,), jnp.float32) + 0.05
        return x, p, (cin, f3, f5, f7, out_f, hw)

    def block(p, x, tail):
        """Full Multiresblock math with in-conv train BNs (as production
        Conv2dBatchnorm does) feeding the probed tail."""
        sh, _, _ = bn_train(conv(x, p["ws"]), p["gs"], p["bs"])
        a, _, _ = bn_train(conv(x, p["w1"]), p["g1"], p["b1"])
        a = jnp.maximum(a, 0)
        b, _, _ = bn_train(conv(a, p["w2"]), p["g2"], p["b2"])
        b = jnp.maximum(b, 0)
        c, _, _ = bn_train(conv(b, p["w3"]), p["g3"], p["b3"])
        c = jnp.maximum(c, 0)
        cat = jnp.concatenate([a, b, c], axis=-1)
        out, stats = tail(cat, sh, p)
        return out, stats

    def live(out_stats):
        out, stats = out_stats
        return (out.astype(jnp.float32).mean()
                + sum(s.sum() for s in stats) * 1e-12)

    def timed(fn, p, x):
        """x may be an array or a tuple of arrays (first one perturbed
        per iteration); everything is a jit ARGUMENT — closure-captured
        tensors become compile-request constants and blow the relay's
        request-size limit (HTTP 413, measured)."""
        from functools import partial

        @partial(jax.jit, static_argnums=(2,))
        def loop(p, x, n):
            def body(i, acc):
                if isinstance(x, tuple):
                    xi = (x[0] + i.astype(x[0].dtype) * 1e-6,) + x[1:]
                else:
                    xi = x + i.astype(x.dtype) * 1e-6
                return acc + fn(p, xi)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(p, x, 1)); float(loop(p, x, N_LONG))

        def t(n):
            t0 = time.perf_counter()
            float(loop(p, x, n))
            return time.perf_counter() - t0

        t1 = min(t(1) for _ in range(3))
        tN = min(t(N_LONG) for _ in range(3))
        return (tN - t1) / (N_LONG - 1) * 1e3

    for label, cin, filters, hw in [("m9", 64, 32, 128),
                                    ("m8", 128, 64, 64)]:
        x, p, geo = make_geometry(cin, filters, hw)
        print(f"[{label}] {geo[0]} -> {geo[1]}/{geo[2]}/{geo[3]} "
              f"(cat {geo[4]}) @ {geo[5]}^2, batch {B}")

        # numerical agreement first (same params, same input)
        oP = block(p, x, tail_P)[0]
        oF = block(p, x, tail_F)[0]
        diff = float(jnp.max(jnp.abs(oP.astype(jnp.float32)
                                     - oF.astype(jnp.float32))))
        print(f"  max|blockP - blockF| = {diff:.3e} (bf16 out)")

        for name, tail in [("tailP", tail_P), ("tailF", tail_F)]:
            # tail-only: inputs precomputed once (cat, sh as block makes)
            sh0, _, _ = bn_train(conv(x, p["ws"]), p["gs"], p["bs"])
            a0 = jnp.maximum(bn_train(conv(x, p["w1"]),
                                      p["g1"], p["b1"])[0], 0)
            b0 = jnp.maximum(bn_train(conv(a0, p["w2"]),
                                      p["g2"], p["b2"])[0], 0)
            c0 = jnp.maximum(bn_train(conv(b0, p["w3"]),
                                      p["g3"], p["b3"])[0], 0)
            cat0 = jnp.concatenate([a0, b0, c0], axis=-1)

            def f_fwd(p, xs, tail=tail):
                return live(tail(xs[0], xs[1], p))

            tf = timed(f_fwd, p, (cat0, sh0))
            tg = timed(lambda p, xs, tail=tail: sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(
                    jax.grad(lambda pp: live(tail(xs[0], xs[1], pp)))(p))),
                p, (cat0, sh0))
            print(f"  {name}  fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms",
                  flush=True)

        for name, tail in [("blockP", tail_P), ("blockF", tail_F)]:
            tf = timed(lambda p, xi, tail=tail: live(block(p, xi, tail)),
                       p, x)
            tg = timed(lambda p, xi, tail=tail: sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(
                    jax.grad(lambda pp: live(block(pp, xi, tail)))(p))),
                p, x)
            print(f"  {name} fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
