"""Compile+run every model in the zoo on the real TPU chip (forward, bf16).
Evidence that all 16 architectures lower through Mosaic/XLA on hardware."""
import time
import numpy as np, jax, jax.numpy as jnp
from jcfszxc_unet_tpu.models import MODEL_REGISTRY, create_model

x32 = np.random.RandomState(0).rand(2, 64, 64, 3)
for name in MODEL_REGISTRY:
    kwargs = {"N": 64} if name.startswith("BCDUNet.") else {}
    model = create_model(name, dtype=jnp.bfloat16, **kwargs)
    x = jnp.asarray(x32, jnp.bfloat16)
    t0 = time.time()
    try:
        v = jax.jit(lambda k: model.init({"params": k}, x, train=False))(
            jax.random.PRNGKey(0))
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        s = float(jnp.sum(out.astype(jnp.float32)))  # force sync
        ok = np.isfinite(s)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        print(f"{name}: OK shape={tuple(out.shape)} params={n_params:,} "
              f"finite={ok} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
print("DONE", flush=True)
