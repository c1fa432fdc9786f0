#!/usr/bin/env python
"""Isolate NestedUNet's x0_4 node (its most expensive: 13.2 ms in-context)
to localize the cost: raw narrow conv is 1.8 ms isolated, so where do the
other ~11 ms go?  Variants, all algebraically identical:

  A. cat(5 inputs) -> conv(192->32)+bias -> BN -> ReLU -> conv(32->32)...
  B. split: sum_i conv(t_i, W_i) + bias -> ... (no concat materialized)
  C. same as A but inputs pre-concatenated (one 192-ch tensor argument)

If C is fast but A is slow, the cost is consuming five 32-ch
(lane-padded) producers; if A is fast in isolation, the in-context cost
is an XLA scheduling artifact of the full grid.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_nested_node_iso.py
"""

import time

import numpy as np

B, HW, N_LONG = 64, 128, 11


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                b = tuple(t + i.astype(t.dtype) * 1e-6 for t in a)
                return acc + fn(*b).mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    r1, rN = make(1), make(N_LONG)
    float(r1(*args)); float(rN(*args))
    t0 = time.perf_counter(); float(r1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rN(*args)); tN = time.perf_counter() - t0
    return (tN - t1) / (N_LONG - 1) * 1e3


def main():
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w1 = jnp.asarray(rng.rand(3, 3, 192, 32) * 0.1, jnp.bfloat16)
    b1 = jnp.asarray(rng.rand(32) * 0.1, jnp.bfloat16)
    s1 = jnp.asarray(rng.rand(32) * 0.1 + 1, jnp.bfloat16)  # folded BN scale
    o1 = jnp.asarray(rng.rand(32) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.rand(3, 3, 32, 32) * 0.1, jnp.bfloat16)
    b2 = jnp.asarray(rng.rand(32) * 0.1, jnp.bfloat16)

    def tail(h):
        h = jnp.maximum(h * s1 + o1, 0)
        h = conv(h, w2) + b2
        return jnp.maximum(h * s1 + o1, 0)

    def node_cat(*ts):
        h = conv(jnp.concatenate(ts, axis=-1), w1) + b1
        return tail(h)

    def node_packed(big):
        h = conv(big, w1) + b1
        return tail(h)

    # five 32-ch producers (64-ch for the upsampled one in the real model,
    # but keep 32x6? -> real widths: 4x32 + 64 = 192)
    ts32 = [jnp.asarray(rng.rand(B, HW, HW, 32), jnp.bfloat16)
            for _ in range(4)]
    t64 = jnp.asarray(rng.rand(B, HW, HW, 64), jnp.bfloat16)
    big = jnp.concatenate(ts32 + [t64], axis=-1)

    print(f"A cat(4x32+64)->dc : {timed(node_cat, *ts32, t64):7.2f} ms")
    def node_split_real(*ts):
        offs = [0, 32, 64, 96, 128, 192]
        h = sum(conv(t, lax.slice_in_dim(w1, offs[i], offs[i + 1], axis=2))
                for i, t in enumerate(ts)) + b1
        return tail(h)
    print(f"B split-kernel     : {timed(node_split_real, *ts32, t64):7.2f} ms")
    print(f"C packed 192 input : {timed(node_packed, big):7.2f} ms")


if __name__ == "__main__":
    main()
