#!/usr/bin/env python
"""Benchmark: DRIVE-patch inference throughput of the flagship UNet on one
TPU chip.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Protocol: UNet.UNet (31M params), bf16 compute / f32 params, NHWC
128x128x3 patches (the reference's training patch size, train.py:466),
batch 256, jitted forward + sigmoid.

Methodology note: this image reaches the TPU through an async relay where
``block_until_ready`` returns before remote execution and per-call
round-trips cost seconds.  Timing therefore chains N forwards *inside one
jitted program* (``lax.fori_loop`` with an input perturbation to defeat
loop-invariant hoisting) and fetches a single scalar; per-iteration time is
(t(N) - t(1)) / (N - 1), which cancels dispatch/transfer overhead and
measures on-chip throughput.

vs_baseline: the reference publishes no throughput numbers anywhere
(SURVEY.md §6).  The denominator is an *estimate* of the PyTorch
reference's single-GPU inference throughput: UNet at 128^2 is ~20
GFLOP/image; a V100/3090-class research GPU under AMP sustains roughly
10 TFLOP/s on this conv mix -> ~500 images/sec.  BASELINE.md's north star
asks for >=10x per chip.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import os

REF_BASELINE_IMG_PER_SEC = 500.0  # estimated PyTorch single-GPU (see above)

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
# BENCH_PATCH exists only for CPU smoke tests of this file (compile time);
# the driver always runs the 128 default (the reference patch size).
PATCH = int(os.environ.get("BENCH_PATCH", "128"))
N_LONG = int(os.environ.get("BENCH_N", "21"))

# Training half of the workload (train.py:47-416 is the reference's primary
# loop): the PRODUCTION train step — on-device patch sampling + fwd/bwd +
# RMSprop + NaN guard — at the batch-128 operating point the round-2 sweep
# found optimal (experiments_record.md), timed by the same loop-in-jit
# difference methodology (an epoch of N chained steps in one lax.scan).
TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "128"))
# 21 chained steps (~1.4 s device time at batch 128) — the dynamic trip
# count reuses one executable, so a longer chain costs pure runtime and
# divides the relay's per-call jitter by 20 instead of 5 (observed
# run-to-run spread at N=6 was ~6%: 1,679 vs 1,869 patches/s).  The env
# override exists for cheap CPU smoke runs of this code path.
TRAIN_N_LONG = int(os.environ.get("BENCH_TRAIN_N", "21"))
PEAK_TFLOPS = 394.0


def main():
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model

    try:
        from jcfszxc_unet_tpu.utils.cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()  # no-op on CPU
    except Exception:
        pass

    dev = jax.devices()[0]
    model = create_model("UNet.UNet", dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, PATCH, PATCH, 3), jnp.bfloat16
    )
    variables = jax.jit(
        lambda k: model.init({"params": k}, x[:1], train=False)
    )(jax.random.PRNGKey(0))

    @partial(jax.jit, static_argnums=(2,))
    def bench_loop(variables, x, n):
        def body(i, acc):
            xi = x + i.astype(jnp.bfloat16) * 1e-6  # defeat LICM/CSE
            out = jax.nn.sigmoid(model.apply(variables, xi, train=False))
            return acc + out.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # Warm up / compile both loop lengths; float() forces a real sync.
    float(bench_loop(variables, x, 1))
    float(bench_loop(variables, x, N_LONG))

    t0 = time.perf_counter()
    float(bench_loop(variables, x, 1))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench_loop(variables, x, N_LONG))
    t_long = time.perf_counter() - t0

    per_iter = (t_long - t_short) / (N_LONG - 1)
    ips = BATCH / per_iter

    # Hardware-grounded utilization alongside the soft vs-baseline ratio:
    # FLOPs from XLA's own cost analysis of the compiled forward, against
    # the chip's 394 TFLOP/s bf16 peak (measured XLA conv ceiling here is
    # 385 TFLOP/s, experiments_record.md).
    mfu = None
    try:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        ca = fwd.lower(variables, x).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = round(flops / per_iter / 394e12 * 100.0, 1)
    except Exception:
        pass

    result = {
        "metric": f"UNet 128x128 patch inference on {dev.device_kind}",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_BASELINE_IMG_PER_SEC, 2),
    }
    if mfu is not None:
        result["mfu_pct"] = mfu

    try:
        tpps, tmfu = train_bench(jax, jnp)
        result["train_patches_per_sec"] = round(tpps, 1)
        if tmfu is not None:
            result["train_mfu_pct"] = round(tmfu, 1)
    except Exception:
        pass  # the headline inference line must survive a train-bench fault
    try:
        zoo = zoo_bench(jax, jnp)
        if zoo:
            result["zoo_img_per_sec"] = zoo
            result["zoo_min_img_per_sec"] = round(min(zoo.values()), 1)
    except Exception:
        pass  # likewise
    try:
        zt = zoo_train_bench(jax, jnp)
        if zt:
            result["zoo_train_patches_per_sec"] = zt
            result["zoo_min_train_patches_per_sec"] = round(
                min(zt.values()), 1)
    except Exception:
        pass  # likewise
    print(json.dumps(result))


# Slow-tail visibility (round-4 ask): the headline tracks only UNet, so a
# regression in the ConvLSTM gate split, the nested dense-skip plumbing or
# the Multiresblock one-pass BN would be invisible to the driver bench.
# Measure inference throughput for one model per slow-tail archetype and
# report the per-model map plus the min.  Smaller batch/N than the
# headline: three extra compiles ride the driver's bench budget.
ZOO_MODELS = (
    ("MultiResUNet.MultiResUNet", {}),
    ("UNetPP.NestedUNet", {}),
    ("BCDUNet.BCDU_net_D3", {"N": PATCH}),
)
ZOO_BATCH = int(os.environ.get("BENCH_ZOO_BATCH", "64"))
ZOO_N_LONG = int(os.environ.get("BENCH_ZOO_N", "6"))


def zoo_bench(jax, jnp):
    """Per-archetype inference img/s (batch 64), fori_loop methodology."""
    from functools import partial

    from jcfszxc_unet_tpu.models import create_model

    out = {}
    for name, kwargs in ZOO_MODELS:
        try:
            model = create_model(name, dtype=jnp.bfloat16, **kwargs)
            x = jnp.asarray(
                np.random.RandomState(0).rand(ZOO_BATCH, PATCH, PATCH, 3),
                jnp.bfloat16)
            variables = jax.jit(
                lambda k, m=model: m.init({"params": k}, x[:1], train=False)
            )(jax.random.PRNGKey(0))

            @partial(jax.jit, static_argnums=(2,))
            def loop(variables, x, n, m=model):
                def body(i, acc):
                    xi = x + i.astype(jnp.bfloat16) * 1e-6
                    y = jax.nn.sigmoid(m.apply(variables, xi, train=False))
                    return acc + y.mean().astype(jnp.float32)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            float(loop(variables, x, 1))
            float(loop(variables, x, ZOO_N_LONG))
            t0 = time.perf_counter()
            float(loop(variables, x, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(variables, x, ZOO_N_LONG))
            t2 = time.perf_counter() - t0
            per = (t2 - t1) / (ZOO_N_LONG - 1)
            out[name.split(".")[-1]] = round(ZOO_BATCH / per, 1)
        except Exception:
            continue  # one model's fault must not hide the others
    return out


def _train_step_seconds(jax, jnp, model_name, model_kwargs, batch, n_long,
                        want_flops=False):
    """Per-step seconds of the PRODUCTION train step (on-device sampling +
    make_batch_step_fn: fwd/bwd + RMSprop + NaN guard) for one model,
    chained inside ONE jitted fori_loop whose trip count is a TRACED
    scalar — one compile serves both the n=1 and n=N timing calls (two
    separately-compiled scans measured >25 min of remote compile through
    this image's relay).  Returns (seconds_per_step, flops_or_None)."""
    from jcfszxc_unet_tpu.data.sampler import build_train_sample_map, sample_batch
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.optim import make_optimizer
    from jcfszxc_unet_tpu.train.state import create_train_state
    from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn

    rng = np.random.RandomState(0)
    pool_hw = 256
    images = jnp.asarray(rng.rand(2, pool_hw, pool_hw, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, pool_hw, pool_hw, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(build_train_sample_map(
        np.ones((2, pool_hw, pool_hw), np.float32), PATCH // 2))

    model = create_model(model_name, dtype=jnp.bfloat16, **model_kwargs)
    tx = make_optimizer(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
    batch_step = make_batch_step_fn(model, tx, n_classes=model.n_classes,
                                    compute_dtype=jnp.bfloat16)

    @jax.jit
    def run_n(state, n, key):
        def body(i, carry):
            state, total = carry
            k_sample, k_drop = jax.random.split(jax.random.fold_in(key, i))
            imgs, labs = sample_batch(k_sample, images, labels, smap,
                                      batch, PATCH)
            state, loss, ok = batch_step(state, imgs, labs, k_drop)
            return state, total + loss
        state, total = jax.lax.fori_loop(0, n, body, (state, jnp.zeros(())))
        return state, total

    flops = None
    if want_flops:
        try:
            ca = run_n.lower(state, jnp.int32(1),
                             jax.random.PRNGKey(1)).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass

    def run(n):
        _, total = run_n(state, jnp.int32(n), jax.random.PRNGKey(1))
        return float(total)

    run(1)
    run(n_long)  # compile (one executable) + warm
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n_long)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - 1), flops


def train_bench(jax, jnp):
    """UNet production-train-step throughput (patches/s) + MFU, batch 128
    (train.py:47-416 is the reference's primary loop)."""
    per, flops = _train_step_seconds(jax, jnp, "UNet.UNet", {},
                                     TRAIN_BATCH, TRAIN_N_LONG,
                                     want_flops=True)
    mfu = flops / per / (PEAK_TFLOPS * 1e12) * 100.0 if flops else None
    return TRAIN_BATCH / per, mfu


# Driver-visible zoo TRAIN throughput (VERDICT r4 item 5): the train-side
# slow tail was only measured in scripts/ (tpu_zoo_train_bench.py), so a
# train-step regression in the ConvLSTM gate split, the dense-skip
# plumbing, the one-pass BN or the full-res grid would never reach
# BENCH_r*.json.  One model per archetype, production step, smaller
# batch/N than the headline (four extra fwd+bwd compiles ride the
# driver's bench budget; the persistent compile cache amortizes repeats).
ZOO_TRAIN_MODELS = (
    ("MultiResUNet.MultiResUNet", {}),
    ("UNetPP.NestedUNet", {}),
    ("BCDUNet.BCDU_net_D3", {"N": PATCH}),
    ("FRUNet.FRUNet", {}),
)
ZOO_TRAIN_BATCH = int(os.environ.get("BENCH_ZOO_TRAIN_BATCH", "64"))
ZOO_TRAIN_N_LONG = int(os.environ.get("BENCH_ZOO_TRAIN_N", "6"))


def zoo_train_bench(jax, jnp):
    """Per-archetype production train-step patches/s (batch 64)."""
    out = {}
    for name, kwargs in ZOO_TRAIN_MODELS:
        try:
            per, _ = _train_step_seconds(jax, jnp, name, kwargs,
                                         ZOO_TRAIN_BATCH, ZOO_TRAIN_N_LONG)
            out[name.split(".")[-1]] = round(ZOO_TRAIN_BATCH / per, 1)
        except Exception:
            continue  # one model's fault must not hide the others
    return out


if __name__ == "__main__":
    main()
