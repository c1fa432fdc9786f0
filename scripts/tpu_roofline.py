#!/usr/bin/env python
"""Roofline placement for the zoo's inference forwards.

MFU alone understates how close a conv net with thin channels runs to
its *hardware* limit: the binding resource is often HBM bandwidth, not
the MXU.  For each model's jitted eval forward, this reports

    t_mxu  = FLOPs / peak_bf16            (compute bound)
    t_hbm  = bytes accessed / peak_BW     (bandwidth bound)
    t_roof = max(t_mxu, t_hbm)            (speed-of-light)
    SoL%   = t_roof / t_measured

FLOPs and bytes come from XLA's cost analysis of the compiled module
(bytes counts HBM traffic of the fused graph, i.e. after fusion decides
what is materialized).  v5e: 394 TFLOP/s bf16, 819 GB/s HBM.
"""

import os
import time

import numpy as np

BATCH, PATCH = 256, 128
PEAK_FLOPS = 394e12
PEAK_BW = 819e9
N_LONG = 13
MODELS = os.environ.get("ROOFLINE_MODELS", "UNet.UNet").split(",")


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from jcfszxc_unet_tpu.models import create_model

    for name in MODELS:
        kwargs = {"N": PATCH} if name.startswith("BCDUNet.") else {}
        model = create_model(name, dtype=jnp.bfloat16, **kwargs)
        x = jnp.asarray(
            np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3),
            jnp.bfloat16)
        variables = jax.jit(
            lambda k: model.init({"params": k}, x[:1], train=False)
        )(jax.random.PRNGKey(0))

        fwd = jax.jit(lambda v, xi: jax.nn.sigmoid(
            model.apply(v, xi, train=False).astype(jnp.float32)))
        ca = fwd.lower(variables, x).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))

        @partial(jax.jit, static_argnums=(2,))
        def bench_loop(variables, x, n, fwd=fwd):
            def body(i, acc):
                xi = x + i.astype(jnp.bfloat16) * 1e-6
                return acc + fwd(variables, xi).mean()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(bench_loop(variables, x, 1))
        float(bench_loop(variables, x, N_LONG))
        t0 = time.perf_counter(); float(bench_loop(variables, x, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(bench_loop(variables, x, N_LONG))
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N_LONG - 1)

        t_mxu = flops / PEAK_FLOPS
        t_hbm = byts / PEAK_BW
        t_roof = max(t_mxu, t_hbm)
        bound = "compute" if t_mxu >= t_hbm else "bandwidth"
        print(f"{name}: measured {per*1e3:.2f} ms | t_mxu {t_mxu*1e3:.2f} "
              f"t_hbm {t_hbm*1e3:.2f} ms ({bound}-bound) | "
              f"SoL {t_roof/per*100:.0f}% | MFU {flops/per/PEAK_FLOPS*100:.0f}% "
              f"| {flops/1e9/BATCH:.1f} GFLOP/img {byts/1e6/BATCH:.2f} MB/img "
              f"| {BATCH/per:.0f} img/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
