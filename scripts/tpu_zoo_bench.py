"""Per-model inference throughput on the real chip (bf16, 128x128 patches,
batch 64 to bound compile memory for the big models). Loop-in-jit timing."""
import os, time, functools
import numpy as np, jax, jax.numpy as jnp
from jcfszxc_unet_tpu.models import MODEL_REGISTRY, create_model

B, P, N = 64, 128, 11
ONLY = [m for m in os.environ.get("ZOO_BENCH_MODELS", "").split(",") if m]
x = jnp.asarray(np.random.RandomState(0).rand(B, P, P, 3), jnp.bfloat16)

for name in (ONLY or MODEL_REGISTRY):
    kwargs = {"N": P} if name.startswith("BCDUNet.") else {}
    try:
        model = create_model(name, dtype=jnp.bfloat16, **kwargs)
        v = jax.jit(lambda k: model.init({"params": k}, x[:1], train=False))(
            jax.random.PRNGKey(0))

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(v, x, n):
            def body(i, acc):
                o = model.apply(v, x + i.astype(x.dtype) * 1e-6, train=False)
                return acc + o.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(v, x, 1)); float(loop(v, x, N))
        t0 = time.perf_counter(); float(loop(v, x, 1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(v, x, N)); t2 = time.perf_counter() - t0
        per = (t2 - t1) / (N - 1)
        print(f"{name}: {per*1e3:.2f} ms/batch  {B/per:.0f} img/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
print("DONE", flush=True)
