"""Golden-value tests for the loss/metric numerics.

Expected values are checked against the reference formulas
(utils/dice_score.py) both by hand-computed cases and by an independent
torch-CPU re-evaluation of the same math (torch is only a test oracle here).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jcfszxc_unet_tpu.train import losses


def _torch_dice_coeff(inputs, target, reduce_batch_first=False):
    inputs = torch.clamp(inputs, 0.0, 1.0)
    sum_dim = (-1, -2) if inputs.dim() == 2 or not reduce_batch_first else (-1, -2, -3)
    inter = 2 * (inputs * target).sum(dim=sum_dim)
    sets_sum = inputs.sum(dim=sum_dim) + target.sum(dim=sum_dim)
    epsilon = 1e-5
    sets_sum = torch.where(sets_sum < epsilon, inter, sets_sum)
    return ((inter + epsilon) / (sets_sum + epsilon)).mean()


class TestDiceCoeff:
    def test_perfect_match(self):
        x = jnp.ones((2, 8, 8))
        assert losses.dice_coeff(x, x) == pytest.approx(1.0, abs=1e-6)

    def test_no_overlap(self):
        a = jnp.zeros((4, 4)).at[0, :].set(1.0)
        b = jnp.zeros((4, 4)).at[2, :].set(1.0)
        # inter=0, sets_sum=8 -> (0+1e-5)/(8+1e-5)
        assert losses.dice_coeff(a, b) == pytest.approx(1e-5 / (8 + 1e-5), rel=1e-5)

    def test_empty_mask_guard(self):
        a = jnp.zeros((4, 4))
        # sets_sum < eps -> replaced by inter=0 -> dice = eps/eps = 1
        assert losses.dice_coeff(a, a) == pytest.approx(1.0, abs=1e-6)

    def test_batched_no_reduce(self):
        rng = np.random.RandomState(0)
        a = rng.rand(3, 1, 8, 8).astype(np.float32)
        b = (rng.rand(3, 1, 8, 8) > 0.5).astype(np.float32)
        got = losses.dice_coeff(jnp.asarray(a), jnp.asarray(b))
        want = _torch_dice_coeff(torch.from_numpy(a), torch.from_numpy(b))
        assert float(got) == pytest.approx(float(want), rel=1e-5)

    def test_reduce_batch_first(self):
        rng = np.random.RandomState(1)
        a = rng.rand(5, 8, 8).astype(np.float32)
        b = (rng.rand(5, 8, 8) > 0.5).astype(np.float32)
        got = losses.dice_coeff(jnp.asarray(a), jnp.asarray(b), reduce_batch_first=True)
        want = _torch_dice_coeff(
            torch.from_numpy(a), torch.from_numpy(b), reduce_batch_first=True
        )
        assert float(got) == pytest.approx(float(want), rel=1e-5)

    def test_clamp_applied(self):
        a = jnp.full((4, 4), 2.0)  # clamps to 1
        b = jnp.ones((4, 4))
        assert losses.dice_coeff(a, b) == pytest.approx(1.0, abs=1e-6)


class TestDiceLoss:
    def test_matches_torch_formula(self):
        rng = np.random.RandomState(2)
        a = rng.rand(4, 8, 8).astype(np.float32)
        b = (rng.rand(4, 8, 8) > 0.5).astype(np.float32)
        got = losses.dice_loss(jnp.asarray(a), jnp.asarray(b))
        ta = torch.clamp(torch.from_numpy(a), 1e-7, 1 - 1e-7)
        want = 1 - _torch_dice_coeff(ta, torch.from_numpy(b), reduce_batch_first=True)
        assert float(got) == pytest.approx(float(want), rel=1e-5)


class TestBCE:
    def test_matches_torch(self):
        rng = np.random.RandomState(3)
        logits = rng.randn(2, 8, 8, 1).astype(np.float32) * 3
        target = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
        got = losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(target))
        want = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(target)
        )
        assert float(got) == pytest.approx(float(want), rel=1e-5)


class TestSoftCE:
    def test_single_channel_is_zero(self):
        # DenseUNet defect path: 1-channel CE == 0 (log_softmax == 0)
        logits = jnp.asarray(np.random.RandomState(4).randn(2, 4, 4, 1), jnp.float32)
        target = jnp.ones((2, 4, 4, 1))
        assert float(losses.soft_cross_entropy(logits, target)) == pytest.approx(0.0, abs=1e-6)

    def test_multichannel_matches_torch(self):
        rng = np.random.RandomState(5)
        logits = rng.randn(2, 4, 4, 3).astype(np.float32)
        target = rng.rand(2, 4, 4, 3).astype(np.float32)
        got = losses.soft_cross_entropy(jnp.asarray(logits), jnp.asarray(target))
        # torch CE expects NCHW
        tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(target).permute(0, 3, 1, 2)
        want = torch.nn.functional.cross_entropy(tl, tt)
        assert float(got) == pytest.approx(float(want), rel=1e-5)


class TestCombined:
    def test_half_bce_half_dice(self):
        rng = np.random.RandomState(6)
        logits = jnp.asarray(rng.randn(2, 8, 8, 1), jnp.float32)
        target = jnp.asarray((rng.rand(2, 8, 8, 1) > 0.5), jnp.float32)
        loss, bce, d = losses.combined_loss(logits, target, n_classes=1)
        assert float(loss) == pytest.approx(0.5 * float(bce) + 0.5 * float(d), rel=1e-6)
