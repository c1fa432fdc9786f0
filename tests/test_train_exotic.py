"""One full training step (fwd+bwd+update) through the architecturally
exotic models — exercises gradients through argmax unpooling (SegNet),
ConvLSTM recurrence (BCDU), the 17-node grid + channel dropout (FRUNet),
and DenseUNet's n_classes=128 defect path (CrossEntropy branch whose loss
contribution is identically 0 for 1-channel logits, so only the dice term
trains)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.train.losses import combined_loss
from jcfszxc_unet_tpu.train.optim import make_optimizer
from jcfszxc_unet_tpu.train.state import create_train_state
from jcfszxc_unet_tpu.train.trainer import make_epoch_fn

# (name, kwargs, patch size) — SegNet needs /32-divisible patches.
CASES = [
    ("SegNet.SegNet", {}, 32),
    ("BCDUNet.BCDU_net_D1", {"N": 16}, 16),
    ("FRUNet.FRUNet", {}, 16),
    ("DenseUNet.DenseUNet", {}, 16),
]


@pytest.mark.parametrize("name,kwargs,patch", CASES)
def test_one_training_step(name, kwargs, patch):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 48, 48, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 48, 48), np.float32), patch // 2)
    )
    model = create_model(name, **kwargs)
    tx = make_optimizer(1e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3))
    )
    epoch_fn = make_epoch_fn(
        model, tx, n_classes=model.n_classes, batch_size=2,
        patch_size=patch, steps=1,
    )
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = epoch_fn(state, images, labels, smap, jax.random.PRNGKey(1))
    loss = float(metrics["epoch_loss"])
    assert np.isfinite(loss) and int(metrics["skipped"]) == 0
    # parameters moved (gradients flowed through the exotic ops)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params))
    )
    assert moved, f"{name}: no parameter changed after a training step"


def test_denseunet_ce_branch_is_zero():
    """n_classes=128 trips the CE branch; with 1-channel logits the CE term
    must be exactly 0, leaving loss = 0.5 * dice (train.py:124 + 267-278)."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 16, 16, 1), jnp.float32)
    target = jnp.asarray((rng.rand(2, 16, 16, 1) > 0.5), jnp.float32)
    loss, bce, dice = combined_loss(logits, target, n_classes=128)
    assert float(bce) == pytest.approx(0.0, abs=1e-7)
    assert float(loss) == pytest.approx(0.5 * float(dice), rel=1e-6)


def test_augmented_epoch_runs_and_diverges_from_plain():
    """--augment: the dihedral-8 patch augmentation runs inside the jitted
    epoch, keeps the loss finite, and actually changes the trajectory
    (different batches than the un-augmented RNG stream)."""
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 48, 48, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 48, 48), np.float32), 8))
    model = create_model("RetinaLiteNet.TransFuseNet")
    tx = make_optimizer(1e-3)

    def run(augment):
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        fn = make_epoch_fn(model, tx, n_classes=model.n_classes,
                           batch_size=8, patch_size=16, steps=2,
                           augment=augment)
        state, metrics = fn(state, images, labels, smap, jax.random.PRNGKey(5))
        return float(metrics["epoch_loss"]), state

    loss_plain, _ = run(False)
    loss_aug, state_aug = run(True)
    assert np.isfinite(loss_aug) and loss_aug > 0
    assert loss_aug != loss_plain
    assert all(np.all(np.isfinite(p)) for p in jax.tree.leaves(state_aug.params))
