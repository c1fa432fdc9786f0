#!/usr/bin/env python
"""In-context stage attribution for NestedUNet (UNet++) + an
upsample_nearest micro-check.

NestedUNet sits at ~8% inference MFU even after the bilinear einsum fix;
this times truncated prefixes of its 15-node dense grid (each prefix is a
real fused subgraph; consecutive differences attribute cost in context,
like scripts/tpu_unet_prefix_profile.py does for UNet).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_nested_prefix_profile.py
"""

import time

import numpy as np

B, P, N_LONG = 64, 128, 11


def timed(fn, x):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run1(x):
        def body(i, acc):
            return acc + fn(x + i.astype(x.dtype) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, 1, body, jnp.float32(0))

    @jax.jit
    def runN(x):
        def body(i, acc):
            return acc + fn(x + i.astype(x.dtype) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, N_LONG, body, jnp.float32(0))

    float(run1(x)); float(runN(x))
    t0 = time.perf_counter(); float(run1(x)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(runN(x)); tN = time.perf_counter() - t0
    return (tN - t1) / (N_LONG - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model
    import jcfszxc_unet_tpu.ops.layers as L

    # --- upsample_nearest micro: jnp.repeat vs broadcast-reshape ---
    def nearest_reshape(x, s=2):
        n, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, s, w, s, c))
        return x.reshape(n, h * s, w * s, c)

    xa = jnp.asarray(np.random.RandomState(0).rand(B, 64, 64, 64),
                     jnp.bfloat16)
    print(f"nearest 64->128 @64ch: repeat "
          f"{timed(lambda t: L.upsample_nearest(t, 2).mean(), xa):.3f} ms   "
          f"broadcast-reshape "
          f"{timed(lambda t: nearest_reshape(t).mean(), xa):.3f} ms")

    # --- NestedUNet prefix attribution ---
    model = create_model("UNetPP.NestedUNet", dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).rand(B, P, P, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=False)
    )(jax.random.PRNGKey(0))

    # Rebuild the grid wiring as a truncatable module taking the SAME
    # param tree (submodule names match the model's: conv0_0 ... conv0_4).
    from jcfszxc_unet_tpu.ops.layers import max_pool2d, upsample_bilinear
    import flax.linen as nn
    from jcfszxc_unet_tpu.models.UNetPP import _DoubleConvBias

    nb = [32, 64, 128, 256, 512]
    ORDER = ["x0_0", "x1_0", "x0_1", "x2_0", "x1_1", "x0_2", "x3_0",
             "x2_1", "x1_2", "x0_3", "x4_0", "x3_1", "x2_2", "x1_3", "x0_4"]

    class Prefix(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, x):
            up = lambda t: upsample_bilinear(t, 2, align_corners=True)
            cat = lambda *ts: jnp.concatenate(ts, axis=-1)
            dt = jnp.bfloat16
            dc = lambda name, cin, cout: _DoubleConvBias(
                cin, cout, dtype=dt, name=name)
            vals = {}
            specs = {
                "x0_0": ("conv0_0", 3, nb[0], lambda v: x),
                "x1_0": ("conv1_0", nb[0], nb[1],
                         lambda v: max_pool2d(v["x0_0"])),
                "x0_1": ("conv0_1", nb[0] + nb[1], nb[0],
                         lambda v: cat(v["x0_0"], up(v["x1_0"]))),
                "x2_0": ("conv2_0", nb[1], nb[2],
                         lambda v: max_pool2d(v["x1_0"])),
                "x1_1": ("conv1_1", nb[1] + nb[2], nb[1],
                         lambda v: cat(v["x1_0"], up(v["x2_0"]))),
                "x0_2": ("conv0_2", nb[0] * 2 + nb[1], nb[0],
                         lambda v: cat(v["x0_0"], v["x0_1"], up(v["x1_1"]))),
                "x3_0": ("conv3_0", nb[2], nb[3],
                         lambda v: max_pool2d(v["x2_0"])),
                "x2_1": ("conv2_1", nb[2] + nb[3], nb[2],
                         lambda v: cat(v["x2_0"], up(v["x3_0"]))),
                "x1_2": ("conv1_2", nb[1] * 2 + nb[2], nb[1],
                         lambda v: cat(v["x1_0"], v["x1_1"], up(v["x2_1"]))),
                "x0_3": ("conv0_3", nb[0] * 3 + nb[1], nb[0],
                         lambda v: cat(v["x0_0"], v["x0_1"], v["x0_2"],
                                       up(v["x1_2"]))),
                "x4_0": ("conv4_0", nb[3], nb[4],
                         lambda v: max_pool2d(v["x3_0"])),
                "x3_1": ("conv3_1", nb[3] + nb[4], nb[3],
                         lambda v: cat(v["x3_0"], up(v["x4_0"]))),
                "x2_2": ("conv2_2", nb[2] * 2 + nb[3], nb[2],
                         lambda v: cat(v["x2_0"], v["x2_1"], up(v["x3_1"]))),
                "x1_3": ("conv1_3", nb[1] * 3 + nb[2], nb[1],
                         lambda v: cat(v["x1_0"], v["x1_1"], v["x1_2"],
                                       up(v["x2_2"]))),
                "x0_4": ("conv0_4", nb[0] * 4 + nb[1], nb[0],
                         lambda v: cat(v["x0_0"], v["x0_1"], v["x0_2"],
                                       v["x0_3"], up(v["x1_3"]))),
            }
            acc = jnp.float32(0)
            for k in ORDER[: self.upto]:
                name, cin, cout, src = specs[k]
                vals[k] = dc(name, cin, cout)(src(vals), train=False)
                acc = acc + vals[k].mean().astype(jnp.float32)
            return acc

    params = variables["params"]
    bstats = variables["batch_stats"]
    prev = 0.0
    for upto in range(1, len(ORDER) + 1):
        pref = Prefix(upto)
        fn = lambda t, pref=pref: pref.apply(
            {"params": params, "batch_stats": bstats}, t)
        ms = timed(fn, x)
        print(f"  +{ORDER[upto - 1]:5s}: prefix {ms:7.2f} ms   "
              f"delta {ms - prev:6.2f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
