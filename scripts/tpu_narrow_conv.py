#!/usr/bin/env python
"""Wide-input -> narrow-output 3x3 convs (NestedUNet's top grid row) on
the v5e: is the measured pathology the narrow output, and does padding
the filter bank to full MXU width (then slicing) beat it?

Prefix profiling showed conv nodes at 128^2 scaling superlinearly with
input channels at fixed 32-ch output: 96->32 2.9 ms, 128->32 3.3 ms,
160->32 6.4 ms, 192->32 13.2 ms (batch 64) — far below even the
32/128-lane ceiling.  Candidate fix: zero-pad the output filters to 128
channels (compile-time constant), conv, slice — 4x the FLOPs but full
lanes and possibly a different (MXU) emitter path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_narrow_conv.py
"""

import time
from functools import partial

import numpy as np

B, HW, N_LONG = 64, 128, 11


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                b = (a[0] + i.astype(a[0].dtype) * 1e-6,) + a[1:]
                return acc + fn(*b).mean().astype(jnp.float32)
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
    from jax import lax

    rng = np.random.RandomState(0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for cin in [96, 128, 160, 192]:
        x = jnp.asarray(rng.rand(B, HW, HW, cin), jnp.bfloat16)
        w32 = jnp.asarray(rng.rand(3, 3, cin, 32) * 0.1, jnp.bfloat16)
        w128 = jnp.asarray(rng.rand(3, 3, cin, 128) * 0.1, jnp.bfloat16)
        wpad = jnp.zeros((3, 3, cin, 128), jnp.bfloat16).at[..., :32].set(w32)

        t_narrow = timed(lambda t: conv(t, w32), x)
        t_wide = timed(lambda t: conv(t, w128), x)
        t_pad = timed(lambda t: conv(t, wpad)[..., :32], x)
        gflop32 = 2 * 9 * cin * 32 * HW * HW * B / 1e9
        print(f"  {cin}->32 @128^2 b64: narrow {t_narrow:6.2f} ms "
              f"({gflop32 / t_narrow:6.1f} TFLOP/s-real)   "
              f"wide-128 {t_wide:6.2f} ms   pad+slice {t_pad:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
