#!/usr/bin/env python
"""Probe: can a Pallas conv formulated as ONE deep im2col matmul beat the
round-2 kernel's 47 TFLOP/s — the gate for the fused decoder up-stage
kernel (VERDICT r2 weak #2)?

Round-2's conv kernel expressed the 3x3 conv as NINE K=Cin matmuls; at
the decoder's 64-ch stages that is K=64 — half the MXU's 128-deep
systolic array — and it measured 47 TFLOP/s vs XLA's 122-153 on the same
stages.  Hypothesis: building the im2col block in VMEM (9 shifted vector
copies) and issuing ONE (TH*W, 9*Cin) @ (9*Cin, Cout) matmul (K=576)
feeds the MXU properly.

Measures, at up4's first-conv geometry (B x 128 x 128, 128 -> 64):
  * XLA native conv (the bar),
  * round-2 9-matmul kernel,
  * im2col kernel (this probe).
Loop-in-jit difference timing as everywhere in this repo.
"""

import functools
import os
import time

import numpy as np

B = int(os.environ.get("PROBE_BATCH", "64"))
H = W = int(os.environ.get("PROBE_HW", "128"))
CIN = int(os.environ.get("PROBE_CIN", "128"))
COUT = int(os.environ.get("PROBE_COUT", "64"))
TH = int(os.environ.get("PROBE_TH", "8"))
N_LONG = int(os.environ.get("PROBE_N_LONG", "51"))


def make_imcol_kernel(th, width, cin, cout):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, w_ref, o_ref):
        # x_ref: (1, th+2, width+2, cin) halo'd rows; w_ref: (9*cin, cout)
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(
                    x_ref[0, dy:dy + th, dx:dx + width, :].reshape(
                        th * width, cin))
        lhs = jnp.concatenate(cols, axis=1)  # (th*width, 9*cin)
        acc = jnp.dot(lhs, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[0] = jnp.maximum(acc, 0.0).reshape(
            th, width, cout).astype(o_ref.dtype)

    def run(x, w):
        b, h, width_, cin_ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        wt = w.reshape(9 * cin_, cout)  # (dy,dx,ci) raveled to match cols
        return pl.pallas_call(
            kernel,
            grid=(b, h // th),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(th + 2),
                     pl.Element(width_ + 2), pl.Element(cin_)),
                    lambda nb, i: (nb, i * th, 0, 0),
                ),
                pl.BlockSpec((9 * cin_, cout), lambda nb, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, th, width_, cout), lambda nb, i: (nb, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, width_, cout), x.dtype),
        )(xp, wt)

    return run


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def r(*a):
            def body(i, acc):
                b = (a[0] + i.astype(a[0].dtype) * 1e-6,) + a[1:]
                return acc + jnp.mean(fn(*b).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return r

    r1, rN = make(1), make(N_LONG)
    float(r1(*args)); float(rN(*args))
    t0 = time.perf_counter(); float(r1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(rN(*args)); tN = time.perf_counter() - t0
    return (tN - t1) / (N_LONG - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.ops.pallas.conv_fused import (
        conv3x3_affine_relu_pallas,
        conv3x3_affine_relu_xla,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, CIN) - 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, CIN, COUT) - 0.5, jnp.bfloat16) * 0.1
    one = jnp.ones((COUT,), jnp.bfloat16)
    zero = jnp.zeros((COUT,), jnp.bfloat16)

    flops = 2 * B * H * W * COUT * 9 * CIN / 1e9  # GFLOP

    imcol = make_imcol_kernel(TH, W, CIN, COUT)

    # parity first
    want = np.asarray(conv3x3_affine_relu_xla(x, w, one, zero)).astype(np.float32)
    got = np.asarray(imcol(x, w)).astype(np.float32)
    err = np.abs(want - got).max()
    print(f"imcol parity maxdiff {err:.3e}")

    for name, fn, args in [
        ("xla   ", lambda x: conv3x3_affine_relu_xla(x, w, one, zero), (x,)),
        ("9matml", lambda x: conv3x3_affine_relu_pallas(x, w, one, zero), (x,)),
        ("imcol ", imcol, (x, w)),
    ]:
        try:
            ms = timed(fn, *args)
            print(f"{name}: {ms:7.3f} ms  {flops / ms:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
