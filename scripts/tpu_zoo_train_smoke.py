"""One full training step (fwd+bwd+RMSprop) for every model on the real
chip — hardware evidence that the whole zoo TRAINS, not just infers."""
import time
import numpy as np, jax, jax.numpy as jnp
from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
from jcfszxc_unet_tpu.models import MODEL_REGISTRY, create_model
from jcfszxc_unet_tpu.train.optim import make_optimizer
from jcfszxc_unet_tpu.train.state import create_train_state
from jcfszxc_unet_tpu.train.trainer import make_epoch_fn

rng = np.random.RandomState(0)
PATCH = 64  # /32-divisible for SegNet; BCDU needs /8
images = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)
labels = jnp.asarray((rng.rand(2, 96, 96, 1) > 0.8), jnp.float32)
smap = jnp.asarray(build_train_sample_map(np.ones((2, 96, 96), np.float32), PATCH // 2))

for name in MODEL_REGISTRY:
    kwargs = {"N": PATCH} if name.startswith("BCDUNet.") else {}
    t0 = time.time()
    try:
        model = create_model(name, dtype=jnp.bfloat16, **kwargs)
        tx = make_optimizer(1e-5)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, PATCH, PATCH, 3), jnp.bfloat16))
        epoch_fn = make_epoch_fn(model, tx, n_classes=model.n_classes,
                                 batch_size=4, patch_size=PATCH, steps=1,
                                 compute_dtype=jnp.bfloat16)
        state, m = epoch_fn(state, images, labels, smap, jax.random.PRNGKey(1))
        loss = float(m["epoch_loss"]); sk = int(m["skipped"])
        print(f"{name}: TRAIN OK loss={loss:.4f} skipped={sk} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
print("DONE", flush=True)
