#!/usr/bin/env python
"""Probe: column-packed convolution for NARROW-output convs — the
MultiResUNet training slow tail's binding resource (VERDICT r2 item 3).

Round-3 attribution (scripts/tpu_train_prefix_profile.py): multiresblock8
+ multiresblock9 are 76 of MultiResUNet's 113 ms train step, running at
16-30 TFLOP/s.  Cause: the alpha=1.67 filter arithmetic gives 8/17/26-
channel convs at 64^2/128^2 — the MXU pads the output-channel (lane) dim
to 128, so >80% of each systolic pass is padding.

Trick probed here: pack F output COLUMNS into the feature dim.  A 3x3
stride-1 conv (Cin -> Cout) is recomputed as a (3, 3+F-1) stride-(1,F)
conv producing F*Cout features, whose kernel holds F shifted copies of W
(zero-padded): output block [.., F*j + b, c] = feature b*Cout + c.  Same
multiply-adds plus zero-padding FLOPs ((3+F-1)/3 ~ 2x at F=4), but the
lane dim grows F-fold.  Exact numerics (the extra taps multiply zeros).

Measures baseline vs F=4 / F=8 packing at the three multiresblock9 conv
geometries + the fused all-three composite.
"""

import functools
import os
import time

import numpy as np

B = int(os.environ.get("PACK_BATCH", "128"))
HW = int(os.environ.get("PACK_HW", "128"))
N_LONG = int(os.environ.get("PACK_N_LONG", "101"))


def packed_conv(x, w, f):
    """Column-packed SAME 3x3 stride-1 conv.  x: (B,H,W,Cin),
    w: (3,3,Cin,Cout) -> (B,H,W,Cout), numerically identical."""
    import jax
    import jax.numpy as jnp

    b, h, width, cin = x.shape
    cout = w.shape[-1]
    assert width % f == 0
    # packed kernel: (3, 3+f-1, cin, f*cout); block b holds w shifted by b
    kw = 3 + f - 1
    wp_j = jnp.zeros((3, kw, cin, f, cout), w.dtype)
    for bcol in range(f):
        wp_j = wp_j.at[:, bcol:bcol + 3, :, bcol, :].set(w)
    wp_j = wp_j.reshape(3, kw, cin, f * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wp_j, window_strides=(1, f), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W/f, f*cout)
    return y.reshape(b, h, width // f, f, cout).reshape(b, h, width, cout)


def plain_conv(x, w):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
    # best-of-3 on each length: these ops are sub-ms, so a single relay
    # hiccup in either sample wrecks the difference
    t1 = min(_t(r1, args) for _ in range(3))
    tN = min(_t(rN, args) for _ in range(3))
    return (tN - t1) / (N_LONG - 1) * 1e3


def _t(fn, args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    rng = np.random.RandomState(0)

    # multiresblock9 conv chain at 128^2 (W=53.44*? -> 8, 17, 26) and
    # multiresblock8's at 64^2 (17, 35, 53).
    cases = [(64, 8, HW), (8, 17, HW), (17, 26, HW),
             (128, 17, HW // 2), (17, 35, HW // 2), (35, 53, HW // 2),
             # NestedUNet x0-row double-conv geometries (32-ch outputs)
             (160, 32, HW), (32, 32, HW)]
    for cin, cout, hw in cases:
        x = jnp.asarray(rng.rand(B, hw, hw, cin) - 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.rand(3, 3, cin, cout) - 0.5, jnp.bfloat16) * 0.2
        want = np.asarray(plain_conv(x, w), np.float32)
        gf = 2 * B * hw * hw * cout * 9 * cin / 1e9
        line = [f"{cin:3d}->{cout:3d} @{hw}^2 ({gf:6.1f} GF)"]
        t = timed(plain_conv, x, w)
        line.append(f"plain {t:7.3f} ms {gf / t:5.1f} TF/s")
        for f in (4, 8):
            got = np.asarray(packed_conv(x, w, f), np.float32)
            err = np.abs(got - want).max()
            t = timed(functools.partial(packed_conv, f=f), x, w)
            line.append(f"F{f} {t:7.3f} ms {gf / t:5.1f} TF/s (err {err:.1e})")
        print(" | ".join(line), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
