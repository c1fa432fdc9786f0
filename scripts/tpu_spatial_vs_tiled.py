#!/usr/bin/env python
"""Hardware measurement: --spatial (whole-image forward, H axis sharded
over the mesh — one chip here, so no halo traffic) vs the default tiled
eval path (patch grid -> chunked forward -> stitch) at DRIVE geometry.

VERDICT r2 weak #4 asked for one hardware number for the shipped
--spatial flag.  On a single v5e the spatial path degenerates to a
whole-image forward; the tiled path is the production protocol
(evaluate.py:200-307 semantics).  Loop-in-jit difference timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_spatial_vs_tiled.py
"""

import time

import numpy as np

N_IMAGES = 20          # the DRIVE test split size
H, W = 584, 565
N_LONG = 11


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

    from jcfszxc_unet_tpu.eval.tiling import tiled_predict
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.parallel.mesh import make_mesh
    from jcfszxc_unet_tpu.parallel.spatial import make_spatial_forward

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(N_IMAGES, H, W, 3), jnp.bfloat16)

    model = create_model("UNet.UNet", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                           train=False)

    mesh = make_mesh(1)
    spatial = make_spatial_forward(
        model, variables, mesh, divisor=16, compute_dtype=jnp.bfloat16)

    def spatial_all(imgs):
        return jax.lax.map(lambda im: spatial(im[None])[0], imgs)

    def patch_forward(batch):
        out = model.apply(variables, batch.astype(jnp.bfloat16), train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    def tiled_all(imgs):
        return tiled_predict(patch_forward, imgs, patch_size=512)

    for name, fn in [("tiled  (patch 512)", tiled_all),
                     ("spatial whole-image", spatial_all)]:
        try:
            ms = timed(fn, images)
            print(f"{name}: {ms:8.2f} ms / {N_IMAGES} imgs "
                  f"= {N_IMAGES / ms * 1e3:6.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
