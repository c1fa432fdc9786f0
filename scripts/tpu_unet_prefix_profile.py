#!/usr/bin/env python
"""In-context stage attribution for UNet inference: time truncated model
prefixes (inc; +down1; ...; +outc) with loop-in-jit and difference
consecutive prefixes.  Unlike the round-1 isolated-stage timings
(scripts/tpu_unet_stages.py) each prefix is a real fused subgraph of the
full model, so consecutive differences attribute time *in context*.
"""

import time
from functools import partial

import numpy as np

BATCH = 256
PATCH = 128
N_LONG = 11


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model

    dt = jnp.bfloat16
    model = create_model("UNet.UNet", dtype=dt)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), dt)
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=False)
    )(jax.random.PRNGKey(0))

    # Rebuild the forward out of the production blocks under the production
    # names so each prefix reuses the full model's params.
    def forward_upto(variables, x, n_stages):
        import flax.linen as nn

        from jcfszxc_unet_tpu.ops.blocks import DoubleConv, Down, OutConv, Up

        class Prefix(nn.Module):
            @nn.compact
            def __call__(self, x):
                acc = [DoubleConv(3, 64, dtype=dt, name="inc")(x, False)]
                downs = [Down(64, 128, dtype=dt, name="down1"),
                         Down(128, 256, dtype=dt, name="down2"),
                         Down(256, 512, dtype=dt, name="down3"),
                         Down(512, 1024, dtype=dt, name="down4")]
                for k in range(min(n_stages - 1, 4)):
                    acc.append(downs[k](acc[-1], False))
                h = acc[-1]
                ups = [Up(1024, 512, dtype=dt, name="up1"),
                       Up(512, 256, dtype=dt, name="up2"),
                       Up(256, 128, dtype=dt, name="up3"),
                       Up(128, 64, dtype=dt, name="up4")]
                for k in range(max(0, min(n_stages - 5, 4))):
                    h = ups[k](h, acc[3 - k], False)
                if n_stages >= 10:
                    h = OutConv(64, 1, dtype=dt, name="outc")(h)
                return h

        return Prefix().apply(variables, x)

    names = ["inc", "down1", "down2", "down3", "down4",
             "up1", "up2", "up3", "up4", "outc"]
    times = []
    for n_stages in range(1, 11):
        @partial(jax.jit, static_argnums=(2,))
        def loop(variables, x, n, n_stages=n_stages):
            def body(i, acc):
                xi = x + i.astype(dt) * 1e-6
                out = forward_upto(variables, xi, n_stages)
                return acc + out.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(variables, x, 1))
        float(loop(variables, x, N_LONG))
        t0 = time.perf_counter(); float(loop(variables, x, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(variables, x, N_LONG))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N_LONG - 1)
        times.append(per)
        delta = per - (times[-2] if len(times) > 1 else 0.0)
        print(f"prefix +{names[n_stages-1]:6s}: cum {per*1e3:7.2f} ms  "
              f"stage {delta*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
