#!/usr/bin/env python
"""Bilinear-upsample formulations on the real chip: gather-based vs
constant-matrix einsum (MXU), in isolation at NestedUNet's shapes and
end-to-end on NestedUNet/MCUNet inference.

NestedUNet (the zoo's slowest inference model, ~5% MFU) runs 10 bilinear
2x upsamples per forward, half of them at high resolution; the gather
form is pure HBM traffic while the einsum form rides the MXU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_bilinear_forms.py
"""

import time

import numpy as np

N_LONG = 11
BATCH = 64


def timed(fn, *args):
    """Loop-in-jit ms/iter; input perturbed inside the loop to defeat LICM
    (relay methodology, experiments_record.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run1(*a):
        def body(i, acc):
            b = (a[0] + i.astype(a[0].dtype) * 1e-6,) + a[1:]
            return acc + fn(*b).mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, 1, body, jnp.float32(0))

    @jax.jit
    def runN(*a):
        def body(i, acc):
            b = (a[0] + i.astype(a[0].dtype) * 1e-6,) + a[1:]
            return acc + fn(*b).mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, N_LONG, body, jnp.float32(0))

    float(run1(*args)); float(runN(*args))
    t0 = time.perf_counter(); float(run1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(runN(*args)); tN = time.perf_counter() - t0
    return (tN - t1) / (N_LONG - 1) * 1e3  # ms per iter


def main():
    import jax
    import jax.numpy as jnp

    import jcfszxc_unet_tpu.ops.layers as L

    # --- isolated op at NestedUNet top-grid shapes (bf16, batch 64) ---
    rng = np.random.RandomState(0)
    print("isolated 2x align-corners upsample (bf16, batch 64):")
    for h, c in [(64, 64), (64, 128), (32, 128), (32, 256), (16, 256)]:
        x = jnp.asarray(rng.rand(BATCH, h, h, c), jnp.bfloat16)
        g = timed(lambda t: L.upsample_bilinear_matmul(t, 2, True), x)
        # force the gather form regardless of the (now matmul) default
        L.BILINEAR_VIA_MATMUL = False
        s = timed(lambda t: L.upsample_bilinear(t, 2, True), x)
        L.BILINEAR_VIA_MATMUL = True
        print(f"  {h}x{h}x{c}: gather {s:7.3f} ms   einsum {g:7.3f} ms")

    # --- end-to-end: NestedUNet + MCUNet inference, both forms ---
    from jcfszxc_unet_tpu.models import create_model

    for name in ["UNetPP.NestedUNet", "MCUNet.MCUNet"]:
        model = create_model(name, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.rand(BATCH, 128, 128, 3), jnp.bfloat16)
        variables = jax.jit(
            lambda k: model.init({"params": k}, x[:1], train=False)
        )(jax.random.PRNGKey(0))

        for form in ["gather", "einsum"]:
            L.BILINEAR_VIA_MATMUL = form == "einsum"
            ms = timed(
                lambda t: model.apply(variables, t, train=False).astype(
                    jnp.float32), x)
            print(f"{name} [{form}]: {ms:7.2f} ms/batch "
                  f"{BATCH / ms * 1e3:8.0f} img/s")
        L.BILINEAR_VIA_MATMUL = False


if __name__ == "__main__":
    main()
