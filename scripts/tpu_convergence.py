"""Convergence validation on the real chip: synthetic vessel-like dataset
(random-walk curves brightened in the green channel), UNet, reference
training protocol at a workable LR. Dice must climb well above chance."""
import numpy as np, jax, jax.numpy as jnp
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.train.optim import make_optimizer
from jcfszxc_unet_tpu.train.state import create_train_state
from jcfszxc_unet_tpu.train.trainer import (build_val_patches, make_epoch_fn,
                                            make_val_fn)
from jcfszxc_unet_tpu.data.sampler import (build_grid_sample_map,
                                           build_train_sample_map)

def synth_vessels(rng, n, h, w):
    imgs = rng.rand(n, h, w, 3).astype(np.float32) * 0.25 + 0.3
    labs = np.zeros((n, h, w), np.float32)
    for i in range(n):
        for _ in range(12):  # 12 random-walk vessels per image
            y, x = rng.randint(0, h), rng.randint(0, w)
            dy, dx = rng.randn(2)
            for _ in range(300):
                dy += rng.randn() * 0.3; dx += rng.randn() * 0.3
                nrm = max(np.hypot(dy, dx), 1e-3)
                y = int(np.clip(y + 2*dy/nrm, 0, h-1))
                x = int(np.clip(x + 2*dx/nrm, 0, w-1))
                labs[i, max(y-1,0):y+2, max(x-1,0):x+2] = 1.0
        imgs[i, :, :, 1] += labs[i] * 0.35  # vessels visible in green
    return np.clip(imgs, 0, 1), labs

rng = np.random.RandomState(0)
imgs, labs = synth_vessels(rng, 10, 256, 256)
train_i, val_i = imgs[:8], imgs[8:]
train_l, val_l = labs[:8], labs[8:]

PATCH, BATCH, STEPS = 64, 32, 100
smap = jnp.asarray(build_train_sample_map(np.ones_like(train_l), PATCH//2))
vmap_grid = build_grid_sample_map(2, 256, 256, PATCH//2)
vi, vl = build_val_patches(val_i, val_l[..., None], vmap_grid, PATCH)

model = create_model("UNet.UNet", dtype=jnp.bfloat16)
tx = make_optimizer(1e-4)  # workable LR for a short synthetic run
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
epoch_fn = make_epoch_fn(model, tx, n_classes=1, batch_size=BATCH,
                         patch_size=PATCH, steps=STEPS,
                         compute_dtype=jnp.bfloat16)
val_fn = make_val_fn(model, patch_size=PATCH, compute_dtype=jnp.bfloat16)

ti = jnp.asarray(train_i); tl = jnp.asarray(train_l[..., None])
key = jax.random.PRNGKey(1)
for epoch in range(1, 11):
    key, k = jax.random.split(key)
    state, m = epoch_fn(state, ti, tl, smap, k)
    metrics, _ = val_fn(state.params, state.batch_stats, vi, vl)
    print(f"epoch {epoch}: loss {float(m['epoch_loss'])/STEPS:.4f} "
          f"val_dice {float(metrics['dice']):.4f}", flush=True)
print("DONE", flush=True)
