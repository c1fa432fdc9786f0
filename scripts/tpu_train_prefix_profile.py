#!/usr/bin/env python
"""In-context fwd+bwd stage attribution for the training slow tail
(VERDICT r2 item 3: MultiResUNet 6.8% / NestedUNet 8.7% / MCUNet 14.3% /
FRUNet 14.9% training MFU at batch 128 — where does the backward go?).

Method — the training analogue of scripts/tpu_unet_prefix_profile.py:
for each top-level stage k (in execution order) build the CUMULATIVE loss
  L_k = sum_{j<=k} mean(intermediate_j)
on the train-mode forward (capture_intermediates; batch_stats mutable) and
time grad(L_k) with the loop-in-jit difference methodology.  The cumulative
sum makes consecutive ancestor sets strictly nested even on grid/dense-skip
dataflows (a bare mean(intermediate_k) is NOT nested across parallel
branches), so t(k) - t(k-1) attributes stage k's OWN fwd+bwd cost in the
context of the fused whole.  XLA dead-code-eliminates everything not an
ancestor of the prefix loss.  Per-prefix FLOPs from XLA cost analysis give
each stage's effective TFLOP/s against the 394 TFLOP/s bf16 peak.

Usage:
  PROFILE_MODEL=UNetPP.NestedUNet PYTHONPATH=/root/.axon_site:/root/repo \
      python scripts/tpu_train_prefix_profile.py
"""

import os
import time

import numpy as np

BATCH = int(os.environ.get("PROFILE_BATCH", "128"))
PATCH = int(os.environ.get("PROFILE_PATCH", "128"))
N_LONG = int(os.environ.get("PROFILE_N_LONG", "6"))
PEAK_TFLOPS = 394.0

STAGES = {
    "UNetPP.NestedUNet": [
        "conv0_0", "conv1_0", "conv0_1", "conv2_0", "conv1_1", "conv0_2",
        "conv3_0", "conv2_1", "conv1_2", "conv0_3", "conv4_0", "conv3_1",
        "conv2_2", "conv1_3", "conv0_4", "final",
    ],
    "MultiResUNet.MultiResUNet": [
        "multiresblock1", "multiresblock2", "multiresblock3",
        "multiresblock4", "multiresblock5", "multiresblock6",
        "multiresblock7", "multiresblock8", "multiresblock9", "conv_final",
    ],
    # Variant with the skip-path Respath chains attributed separately:
    # each respath is placed right after its source block, so the m8/m9
    # deltas no longer swallow respath2/respath1 (4 resp. units of
    # full/half-res narrow convs + 2 train BNs each).
    "MultiResUNet.MultiResUNet+respath": [
        "multiresblock1", "respath1", "multiresblock2", "respath2",
        "multiresblock3", "respath3", "multiresblock4", "respath4",
        "multiresblock5", "multiresblock6", "multiresblock7",
        "multiresblock8", "multiresblock9", "conv_final",
    ],
    "MCUNet.MCUNet": [
        "in_conv", "cbam1", "down1", "cbam2", "down2", "cbam3", "down3",
        "cbam4", "down4", "up1", "up2", "up3", "up4", "out_conv",
    ],
    "FRUNet.FRUNet": [
        "block1_3", "block1_2", "block2_2", "block1_1", "block2_1",
        "block3_1", "block10", "block20", "block30", "block40", "block11",
        "block21", "block31", "block12", "block22", "block13", "final5",
    ],
    "UNet.UNet": [
        "inc", "down1", "down2", "down3", "down4",
        "up1", "up2", "up3", "up4", "outc",
    ],
}


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    name = os.environ.get("PROFILE_MODEL", "UNetPP.NestedUNet")
    stages = STAGES[name]
    name = name.split("+")[0]  # stage-list variants share the model
    dt = jnp.bfloat16
    kwargs = {"N": PATCH} if name.startswith("BCDUNet.") else {}
    model = create_model(name, dtype=dt, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), dt)
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=True)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    print("init done", flush=True)

    def node_mean(tree, path):
        node = tree["intermediates"]
        for seg in path.split("."):
            node = node[seg]
        leaves = jax.tree.leaves(node["__call__"][0])
        return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)

    def make_prefix_grad(k):
        wanted = stages[: k + 1]
        wset = set(wanted)
        # Filtered capture: sow only the stage outputs we read (capturing
        # every submodule costs real sow/traffic through the relay).
        filt = lambda mdl, method: mdl.name in wset

        def loss(params, x):
            _, tree = model.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                capture_intermediates=filt,
                mutable=["intermediates", "batch_stats"])
            return sum(node_mean(tree, p) for p in wanted)

        def step(params, x):
            g = jax.grad(loss)(params, x)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))

        return step

    def timed(fn):
        def make(n):
            @jax.jit
            def run(params, x):
                def body(i, acc):
                    xi = x + i.astype(x.dtype) * 1e-6
                    return acc + fn(params, xi)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return run

        # AOT-compile r1 once and reuse the SAME executable for both cost
        # analysis and execution (a separate .lower().compile() would pay
        # a third remote compile per prefix).
        r1c = make(1).lower(params, x).compile()
        rN = make(N_LONG)
        flops = None
        try:
            ca = r1c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        float(r1c(params, x)); float(rN(params, x))
        t0 = time.perf_counter(); float(r1c(params, x))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(rN(params, x))
        tN = time.perf_counter() - t0
        return (tN - t1) / (N_LONG - 1) * 1e3, flops

    print(f"{name} train-mode grad prefixes, batch {BATCH}, patch {PATCH}")
    prev_t, prev_f = 0.0, 0.0
    for k, st in enumerate(stages):
        ms, flops = timed(make_prefix_grad(k))
        f = (flops or 0.0) / 1e9
        d_ms = ms - prev_t
        d_f = f - prev_f
        eff = (d_f / d_ms) if d_ms > 0 else float("nan")  # GFLOP/ms=TFLOP/s
        print(f"  +{st:16s} cum {ms:8.2f} ms {f:9.1f} GFLOP | "
              f"stage {d_ms:7.2f} ms {d_f:8.1f} GFLOP  {eff:6.1f} TFLOP/s",
              flush=True)
        prev_t, prev_f = ms, f
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
