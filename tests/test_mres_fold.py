"""MRES_TAIL_FOLD — the Multiresblock folded tail (round 4).

The fold replaces the SOURCE of the tail's second train-BN statistics
(a reduction over the materialized y2 = BN_c(cat)+shortcut) with exact
per-channel algebra over one fused reduction pass; the elementwise
normalize chain is unchanged.  Pinned invariants:

  * f32: folded vs plain Multiresblock outputs and running-stat updates
    agree to f32 round-off (the algebra is exact; only summation
    association differs).
  * bf16: outputs agree to bf16 round-off (the plain path measures BN_a
    stats over the bf16-rounded y2; the fold derives them exactly).
  * identical parameter/variable tree (it's the same two BatchNorm2d
    modules either way).
  * a 3-step gradient trajectory through MultiResUNet stays within the
    trajectory-parity tolerance class.
  * eval mode and the s2d path are byte-identical (the fold gates on
    train and phase_groups == 1).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.ops import layers
from jcfszxc_unet_tpu.ops.blocks import Multiresblock


def _mk(dtype, train=True, fold=True, hw=16, cin=16, filters=32, seed=0):
    old = layers.MRES_TAIL_FOLD
    layers.MRES_TAIL_FOLD = fold
    try:
        m = Multiresblock(cin, filters, dtype=dtype)
        x = jnp.asarray(
            np.random.RandomState(seed).randn(4, hw, hw, cin) * 0.5, dtype)
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out, mut = m.apply(variables, x, train=train,
                           mutable=["batch_stats"])
        return out, mut["batch_stats"], variables
    finally:
        layers.MRES_TAIL_FOLD = old


def test_f32_fold_matches_plain_outputs_and_running_stats():
    out_f, bs_f, _ = _mk(jnp.float32, fold=True)
    out_p, bs_p, _ = _mk(jnp.float32, fold=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-6)
    for (kf, vf), (kp, vp) in zip(
            sorted(flax.traverse_util.flatten_dict(bs_f).items()),
            sorted(flax.traverse_util.flatten_dict(bs_p).items())):
        assert kf == kp
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vp),
                                   rtol=2e-5, atol=2e-6, err_msg=str(kf))


def test_bf16_fold_matches_plain_to_rounding():
    out_f, _, _ = _mk(jnp.bfloat16, fold=True)
    out_p, _, _ = _mk(jnp.bfloat16, fold=False)
    a = np.asarray(out_f, np.float32)
    b = np.asarray(out_p, np.float32)
    # post-BN activations are O(1); 2 bf16 ulps at |x|<=8 is 0.125
    assert np.max(np.abs(a - b)) < 0.13
    assert np.mean(np.abs(a - b)) < 5e-3


def test_identical_variable_tree():
    _, _, v_f = _mk(jnp.float32, fold=True)
    _, _, v_p = _mk(jnp.float32, fold=False)
    tf = set(flax.traverse_util.flatten_dict(v_f["params"]))
    tp = set(flax.traverse_util.flatten_dict(v_p["params"]))
    assert tf == tp


def test_eval_mode_is_identical_regardless_of_flag():
    out_f, _, _ = _mk(jnp.float32, train=False, fold=True)
    out_p, _, _ = _mk(jnp.float32, train=False, fold=False)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_p))


def test_s2d_path_unaffected_by_flag():
    # phase_groups > 1 must take the plain tail either way; compute both
    # flag settings in one test so the comparison cannot depend on
    # parametrize ordering (pytest-randomly / -k selection safe)
    def run(fold):
        old = layers.MRES_TAIL_FOLD
        layers.MRES_TAIL_FOLD = fold
        try:
            m = Multiresblock(16, 32, dtype=jnp.float32, s2d=True)
            x = jnp.asarray(
                np.random.RandomState(0).randn(2, 16, 16, 16) * 0.5,
                jnp.float32)
            variables = m.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False)
            out, _ = m.apply(variables, x, train=True,
                             mutable=["batch_stats"])
            return np.asarray(out)
        finally:
            layers.MRES_TAIL_FOLD = old

    np.testing.assert_array_equal(run(True), run(False))


def test_three_step_gradient_trajectory_stays_close():
    """Production-shaped SGD steps through a small MultiResUNet: fold vs
    plain parameter trajectories stay in the trajectory-parity tolerance
    class (f32)."""
    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train.losses import combined_loss

    def run(fold):
        old = layers.MRES_TAIL_FOLD
        layers.MRES_TAIL_FOLD = fold
        try:
            model = create_model("MultiResUNet.MultiResUNet",
                                 dtype=jnp.float32)
            x = jnp.asarray(
                np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
            t = jnp.asarray(
                (np.random.RandomState(1).rand(2, 32, 32, 1) > 0.8),
                jnp.float32)
            variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                                   train=False)
            params, bs = variables["params"], variables["batch_stats"]

            @jax.jit
            def step(params, bs):
                def loss_fn(p):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": bs}, x, train=True,
                        mutable=["batch_stats"])
                    loss, _, _ = combined_loss(out, t, 1)
                    return loss, mut["batch_stats"]

                (loss, bs2), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params = jax.tree.map(lambda p, gr: p - 1e-2 * gr, params, g)
                return params, bs2, loss

            losses = []
            for _ in range(3):
                params, bs, loss = step(params, bs)
                losses.append(float(loss))
            return losses, params
        finally:
            layers.MRES_TAIL_FOLD = old

    lf, pf = run(True)
    lp, pp = run(False)
    np.testing.assert_allclose(lf, lp, rtol=1e-4)
    # rel tolerance alone is too strict for near-zero parameters, where
    # 3 steps of f32 round-off amplification dominates (measured max abs
    # violation 1.5e-5 at |param| ~ 1e-4); atol covers that band.
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=3e-5)
