"""Stage-level timing of UNet inference on the real chip — locates where
the ~33% end-to-end MXU utilization goes (groundwork for targeted fusion
work).  Times each encoder/decoder stage shape in isolation (bf16,
batch 256) with loop-in-jit methodology and reports achieved TFLOP/s."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.ops.blocks import DoubleConv, Down, OutConv, Up

B = 256
N = 21


def timeit(fn, *args):
    @functools.partial(jax.jit, static_argnums=(0,))
    def loop(n, *a):
        def body(i, acc):
            out = fn(*a)
            first = a[0] + i.astype(a[0].dtype) * 1e-6  # defeat LICM
            out = fn(first, *a[1:])
            return acc + out.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(1, *args))
    float(loop(N, *args))
    t0 = time.perf_counter(); float(loop(1, *args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(N, *args)); t2 = time.perf_counter() - t0
    return (t2 - t1) / (N - 1)


def conv_flops(h, w, cin, cout, k=3):
    return 2 * B * h * w * cin * cout * k * k


def main():
    rng = np.random.RandomState(0)
    stages = [
        ("inc 128² 3→64", DoubleConv(3, 64, dtype=jnp.bfloat16), (128, 3),
         conv_flops(128, 128, 3, 64) + conv_flops(128, 128, 64, 64)),
        ("down1 64² 64→128", Down(64, 128, dtype=jnp.bfloat16), (128, 64),
         conv_flops(64, 64, 64, 128) + conv_flops(64, 64, 128, 128)),
        ("down2 32² 128→256", Down(128, 256, dtype=jnp.bfloat16), (64, 128),
         conv_flops(32, 32, 128, 256) + conv_flops(32, 32, 256, 256)),
        ("down3 16² 256→512", Down(256, 512, dtype=jnp.bfloat16), (32, 256),
         conv_flops(16, 16, 256, 512) + conv_flops(16, 16, 512, 512)),
        ("down4 8² 512→1024", Down(512, 1024, dtype=jnp.bfloat16), (16, 512),
         conv_flops(8, 8, 512, 1024) + conv_flops(8, 8, 1024, 1024)),
    ]
    total = 0.0
    for name, mod, (hw, cin), flops in stages:
        x = jnp.asarray(rng.rand(B, hw, hw, cin), jnp.bfloat16)
        v = jax.jit(lambda k, m=mod, xx=x: m.init({"params": k}, xx, False))(
            jax.random.PRNGKey(0))
        fn = lambda xx, vv=v, m=mod: m.apply(vv, xx, False)
        per = timeit(fn, x)
        total += per
        print(f"{name}: {per*1e3:.2f} ms  {flops/per/1e12:.0f} TFLOP/s", flush=True)

    # decoder stages (Up takes two inputs)
    ups = [
        ("up1 8→16² 1024→512", Up(1024, 512, dtype=jnp.bfloat16), 8, 1024),
        ("up2 16→32² 512→256", Up(512, 256, dtype=jnp.bfloat16), 16, 512),
        ("up3 32→64² 256→128", Up(256, 128, dtype=jnp.bfloat16), 32, 256),
        ("up4 64→128² 128→64", Up(128, 64, dtype=jnp.bfloat16), 64, 128),
    ]
    for name, mod, hw, cin in ups:
        x1 = jnp.asarray(rng.rand(B, hw, hw, cin), jnp.bfloat16)
        x2 = jnp.asarray(rng.rand(B, hw * 2, hw * 2, cin // 2), jnp.bfloat16)
        v = jax.jit(lambda k, m=mod: m.init({"params": k}, x1, x2, False))(
            jax.random.PRNGKey(0))
        fn = lambda a, b, vv=v, m=mod: m.apply(vv, a, b, False)
        per = timeit(fn, x1, x2)
        total += per
        h2 = hw * 2
        flops = (2 * B * h2 * h2 * cin * (cin // 2) * 4  # convT k2
                 + conv_flops(h2, h2, cin, cin // 2) + conv_flops(h2, h2, cin // 2, cin // 2))
        print(f"{name}: {per*1e3:.2f} ms  {flops/per/1e12:.0f} TFLOP/s", flush=True)

    x = jnp.asarray(rng.rand(B, 128, 128, 64), jnp.bfloat16)
    mod = OutConv(64, 1, dtype=jnp.bfloat16)
    v = jax.jit(lambda k: mod.init({"params": k}, x))(jax.random.PRNGKey(0))
    per = timeit(lambda xx: mod.apply(v, xx), x)
    total += per
    print(f"outc 1x1: {per*1e3:.2f} ms", flush=True)
    print(f"stage total {total*1e3:.1f} ms (full model measured ~39.7 ms @B=256)",
          flush=True)


if __name__ == "__main__":
    main()
