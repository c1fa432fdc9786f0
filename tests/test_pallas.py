"""Pallas kernel parity tests (interpret mode on the CPU backend): every
kernel must match its pure-XLA fallback to float tolerance.  Hardware
parity + perf comparisons are run separately on the real chip (see
ops/pallas/conv_fused.py PERF NOTE)."""

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.ops.pallas.conv_fused import (
    conv3x3_affine_relu,
    conv3x3_affine_relu_pallas,
    conv3x3_affine_relu_xla,
)
from jcfszxc_unet_tpu.ops.pallas.dice_fused import (
    dice_coeff_hard,
    dice_sums_pallas,
    dice_sums_xla,
)
from jcfszxc_unet_tpu.train.losses import dice_coeff


class TestConvFused:
    def test_kernel_matches_xla(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 16, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 128) * 0.1, jnp.float32)
        scale = jnp.asarray(rng.rand(128), jnp.float32)
        shift = jnp.asarray(rng.randn(128) * 0.1, jnp.float32)
        got = conv3x3_affine_relu_pallas(x, w, scale, shift, interpret=True)
        want = conv3x3_affine_relu_xla(x, w, scale, shift)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_no_relu(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 128) * 0.1, jnp.float32)
        scale = jnp.ones((128,))
        shift = jnp.zeros((128,))
        got = conv3x3_affine_relu_pallas(x, w, scale, shift, relu=False,
                                         interpret=True)
        want = conv3x3_affine_relu_xla(x, w, scale, shift, relu=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        assert float(got.min()) < 0  # relu really off

    def test_dispatcher_default_is_xla(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 4, 4, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 128) * 0.1, jnp.float32)
        s, sh = jnp.ones((128,)), jnp.zeros((128,))
        got = conv3x3_affine_relu(x, w, s, sh)
        want = conv3x3_affine_relu_xla(x, w, s, sh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestDiceFused:
    def test_sums_match_xla(self):
        rng = np.random.RandomState(3)
        p = jnp.asarray(rng.rand(4, 16, 16) * 1.2 - 0.1, jnp.float32)  # exercise clamp
        t = jnp.asarray((rng.rand(4, 16, 16) > 0.5), jnp.float32)
        gi, gp, gt = dice_sums_pallas(p, t, interpret=True)
        wi, wp, wt = dice_sums_xla(p, t)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), rtol=1e-5)

    def test_dice_matches_reference_formula(self):
        rng = np.random.RandomState(4)
        p = jnp.asarray(rng.rand(3, 8, 8), jnp.float32)
        t = jnp.asarray((rng.rand(3, 8, 8) > 0.5), jnp.float32)
        got = dice_coeff_hard(p, t, use_pallas=True, interpret=True)
        want = dice_coeff(p, t, reduce_batch_first=False)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
