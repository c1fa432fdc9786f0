#!/usr/bin/env python
"""Layout/fusion experiments against the 33%-MXU headroom on UNet inference
(VERDICT r1 item 3).  Variants measured end-to-end, loop-in-jit, batch 256
bf16 128x128 patches on one chip:

  base    — the production model (models/UNet.py)
  nocat   — concat-free decoder: the first conv of each Up's DoubleConv is
            split conv(skip, Ws) + conv(up, Wu), algebraically identical to
            conv(concat([skip, up]), W) but never materializes the
            concatenated tensor (HBM traffic at 128^2/64^2 is the up3/up4
            suspect, experiments_record.md stage table)
  pad128  — every 64-channel stage widened to 128 by zero-padding weights
            (inference-equivalent math; doubles top-level FLOPs to fill the
            128-wide MXU lanes)
  nocat+pad128
"""

import sys
import time
from functools import partial

import numpy as np

BATCH = 256
PATCH = 128
N_LONG = 21


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.ops.layers import Conv2d, ConvTranspose2d, max_pool2d

    dt = jnp.bfloat16

    class DC(nn.Module):  # DoubleConv, optionally wide
        cin: int
        cout: int

        @nn.compact
        def __call__(self, x):
            x = Conv2d(self.cin, self.cout, 3, padding=1, use_bias=False,
                       dtype=dt)(x)
            x = x * 1.0009765625 + 0.0078125  # stand-in for eval-BN affine
            x = nn.relu(x)
            x = Conv2d(self.cout, self.cout, 3, padding=1, use_bias=False,
                       dtype=dt)(x)
            x = x * 1.0009765625 + 0.0078125
            return nn.relu(x)

    class DCSplit(nn.Module):  # first conv split over (skip, up) inputs
        c_skip: int
        c_up: int
        cout: int

        @nn.compact
        def __call__(self, skip, up):
            a = Conv2d(self.c_skip, self.cout, 3, padding=1, use_bias=False,
                       dtype=dt)(skip)
            b = Conv2d(self.c_up, self.cout, 3, padding=1, use_bias=False,
                       dtype=dt)(up)
            x = a + b
            x = x * 1.0009765625 + 0.0078125
            x = nn.relu(x)
            x = Conv2d(self.cout, self.cout, 3, padding=1, use_bias=False,
                       dtype=dt)(x)
            x = x * 1.0009765625 + 0.0078125
            return nn.relu(x)

    def make_unet(nocat: bool, c0: int):
        cs = [c0, 2 * c0, 4 * c0, 8 * c0, 16 * c0]

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x1 = DC(3, cs[0])(x)
                x2 = DC(cs[0], cs[1])(max_pool2d(x1, 2))
                x3 = DC(cs[1], cs[2])(max_pool2d(x2, 2))
                x4 = DC(cs[2], cs[3])(max_pool2d(x3, 2))
                x5 = DC(cs[3], cs[4])(max_pool2d(x4, 2))
                h = x5
                for skip, c in ((x4, cs[4]), (x3, cs[3]), (x2, cs[2]),
                                (x1, cs[1])):
                    up = ConvTranspose2d(c, c // 2, 2, stride=2, dtype=dt)(h)
                    if nocat:
                        h = DCSplit(c // 2, c // 2, c // 2)(skip, up)
                    else:
                        h = DC(c, c // 2)(
                            jnp.concatenate([skip, up], axis=-1))
                out = Conv2d(cs[0], 1, 1, dtype=dt)(h)
                return jax.nn.sigmoid(out)

        return Net()

    def bench(model, label):
        x = jnp.asarray(
            np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), dt)
        variables = jax.jit(lambda k: model.init(k, x[:1]))(
            jax.random.PRNGKey(0))

        @partial(jax.jit, static_argnums=(2,))
        def loop(variables, x, n):
            def body(i, acc):
                xi = x + i.astype(dt) * 1e-6
                return acc + model.apply(variables, xi).mean().astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(variables, x, 1))
        float(loop(variables, x, N_LONG))
        t0 = time.perf_counter(); float(loop(variables, x, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(variables, x, N_LONG))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N_LONG - 1)
        print(f"{label:16s}: {per * 1e3:7.2f} ms/batch  "
              f"{BATCH / per:9.1f} img/s", flush=True)
        return per

    which = sys.argv[1:] or ["base", "nocat", "pad128", "nocat128"]
    if "base" in which:
        bench(make_unet(False, 64), "base")
    if "nocat" in which:
        bench(make_unet(True, 64), "nocat")
    if "pad128" in which:
        bench(make_unet(False, 128), "pad128")
    if "nocat128" in which:
        bench(make_unet(True, 128), "nocat+pad128")
    if "prod" in which:
        model = create_model("UNet.UNet", dtype=dt)
        x = jnp.asarray(
            np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), dt)
        variables = jax.jit(
            lambda k: model.init({"params": k}, x[:1], train=False)
        )(jax.random.PRNGKey(0))

        @partial(jax.jit, static_argnums=(2,))
        def loop(variables, x, n):
            def body(i, acc):
                xi = x + i.astype(dt) * 1e-6
                out = jax.nn.sigmoid(model.apply(variables, xi, train=False))
                return acc + out.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(variables, x, 1)); float(loop(variables, x, N_LONG))
        t0 = time.perf_counter(); float(loop(variables, x, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(variables, x, N_LONG))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N_LONG - 1)
        print(f"{'prod (BN eval)':16s}: {per * 1e3:7.2f} ms/batch  "
              f"{BATCH / per:9.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
