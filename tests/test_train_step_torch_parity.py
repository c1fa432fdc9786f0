"""End-to-end training-math parity: the production train step
(train/trainer.py make_batch_step_fn — forward, ½BCE+½Dice, clip(1.0),
RMSprop) against the reference's exact hot-loop math (train.py:255-301)
executed by torch on the *actual* reference models with transplanted
weights and identical batches, across three dataflow archetypes (UNet,
SegNet, MultiResUNet).  f32, no AMP (CPU torch has no autocast effect).

The torch oracle uses the reference's own loss module
(/root/reference/utils/dice_score.py) — not a re-creation.

What is asserted, and why these tolerances:
  * per-step loss over 3 steps at the reference default lr=1e-6 matches to
    <1e-5 — the loss composition, backward, clip, optimizer and BN-stat
    flow all feed into this;
  * eval-mode gradients match torch to f32 noise (BN backward through
    *batch* statistics is an ill-conditioned cancellation: measured against
    a float64 ground truth, torch-f32 itself is ~5e-3 off on the
    smallest-gradient tensors and our f32 ~1e-2 — same noise class, so
    train-mode gradients are asserted at the noise-class level and
    eval-mode gradients at the tight level);
  * final parameter deltas after 3 steps agree in relative L2;
  * all BN running stats agree after 3 steps.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jcfszxc_unet_tpu.compat.torch_mapping import state_dict_to_variables
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.train.losses import combined_loss
from jcfszxc_unet_tpu.train.optim import make_optimizer
from jcfszxc_unet_tpu.train.state import TrainState
from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn

from . import reference_oracle

pytestmark = pytest.mark.skipif(
    not reference_oracle.reference_available(),
    reason="reference tree not present",
)

SZ, B, STEPS, LR = 32, 2, 3, 1e-6  # reference-default lr (train.py:437)


def _load_reference_dice():
    path = os.path.join(reference_oracle.REFERENCE_ROOT,
                        "utils", "dice_score.py")
    spec = importlib.util.spec_from_file_location("ref_dice_score", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_loss(tm, crit, ref_dice, xt, yt):
    """The reference loss composition, train.py:255-278 (alpha = 0.5).
    ``crit`` is BCEWithLogitsLoss, or CrossEntropyLoss when the model
    reports n_classes > 1 (train.py:124 — DenseUNet's n_classes=128
    defect; with one logit channel the soft-target CE is identically 0)."""
    pred = tm(xt)
    bce = crit(pred, yt)
    d = ref_dice.dice_loss(torch.sigmoid(pred).squeeze(1), yt.squeeze(1),
                           multiclass=False)
    return 0.5 * bce + 0.5 * d


def _setup(name="UNet.UNet"):
    ref_dice = _load_reference_dice()
    torch.manual_seed(5)
    kwargs = {"N": SZ} if name.startswith("BCDUNet.") else {}
    tm = reference_oracle.make_reference_model(name, **kwargs)
    fm = create_model(name, **kwargs)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)), True))
    v0 = state_dict_to_variables(name, tm.state_dict(), template)
    return ref_dice, tm, fm, template, v0


def _batch(rng):
    x = rng.rand(B, SZ, SZ, 3).astype(np.float32)
    y = (rng.rand(B, SZ, SZ, 1) > 0.7).astype(np.float32)
    return x, y


# Dropout-free archetypes spanning the zoo's dataflow space: the canonical
# conv UNet; SegNet, whose argmax-unpool index routing must also be
# differentiated correctly (gradients flow only to the argmax positions);
# MultiResUNet, the densest BN usage (Conv2d_batchnorm everywhere + dual-BN
# Multiresblock tails) and the worst-conditioned numerics in the zoo.
#
# SegNet runs in float64: its argmax routing makes the f32 trajectory
# *chaotic*, not merely noisy — sub-ulp framework differences flip pooling
# winners and re-route whole gradient paths (measured: f32 loss drift
# ~1e-3 and param-delta rel ~0.5 by step 3, while f64 tracks torch-double
# to ~2e-7).  f64 is the only precision at which "the training math is
# identical" is a falsifiable statement for a discontinuous dataflow.
# Every distinct forward/loss mechanism in the zoo has a trajectory case:
#   UNet          — canonical conv encoder/decoder (plain-conv archetype)
#   SegNet        — argmax pool/unpool index routing (gradients flow only
#                   to winner positions; f64, see below)
#   MultiResUNet  — densest BN usage, worst-conditioned numerics
#   AttentionUNet — additive attention gates (unet_parts.py:149-176); f64:
#                   the gate's sigmoid·x modulation amplifies f32 BN-
#                   backward noise past the f32 loss tolerance (measured
#                   1.2e-4 by step 2), while f64 tracks torch-double to
#                   <1e-9 — the sharper falsifiable form
#   R2UNet        — recurrent shared-weight conv backward
#                   (unet_parts.py:114-146: grads sum over the unroll);
#                   f64 for the same reason (f32 drift 1e-4, f64 <1e-9)
#   BCDU_net_D1   — ConvLSTM backward through the 2-step time axis
#                   (unet_parts.py:809-869); its Dropout(0.5) is
#                   neutralized on BOTH sides (torch submodule .eval(),
#                   JAX ops.layers.dropout_disabled) — masks are
#                   RNG-coupled across frameworks, everything else is
#                   deterministic and falsifiable
#   FRUNet        — 17-node full-resolution grid + Dropout2d neutralized
#                   the same way (the reference's best-Dice model)
#   TransFuseNet  — MultiheadAttention bottleneck backward
#                   (RetinaLiteNet.py:72-80) + double-sigmoid head
#   DenseUNet     — the n_classes=128 CrossEntropy loss branch
#                   (train.py:124): soft-target CE over ONE logit channel
#                   is identically 0, so only the Dice half trains
#
# SegNet runs in float64: its argmax routing makes the f32 trajectory
# *chaotic*, not merely noisy — sub-ulp framework differences flip pooling
# winners and re-route whole gradient paths (measured: f32 loss drift
# ~1e-3 and param-delta rel ~0.5 by step 3, while f64 tracks torch-double
# to ~2e-7).  f64 is the only precision at which "the training math is
# identical" is a falsifiable statement for a discontinuous dataflow.
@pytest.mark.parametrize("name,x64,loss_tol,delta_tol,neutralize", [
    ("UNet.UNet", False, 1e-5, 0.1, False),
    ("SegNet.SegNet", True, 1e-5, 0.01, False),
    ("MultiResUNet.MultiResUNet", False, 5e-5, 0.1, False),
    ("AttentionUNet.AttentionUNet", True, 1e-8, 1e-4, False),
    ("R2UNet.R2UNet", True, 1e-8, 1e-4, False),
    ("BCDUNet.BCDU_net_D1", False, 1e-5, 0.1, True),
    ("FRUNet.FRUNet", False, 1e-5, 0.1, True),
    ("RetinaLiteNet.TransFuseNet", False, 1e-5, 0.1, False),
    ("DenseUNet.DenseUNet", False, 1e-5, 0.1, False),
])
def test_three_step_trajectory_matches_torch(name, x64, loss_tol, delta_tol,
                                             neutralize):
    import contextlib

    from jcfszxc_unet_tpu.ops.layers import dropout_disabled

    ctx = jax.enable_x64() if x64 else contextlib.nullcontext()
    dctx = dropout_disabled() if neutralize else contextlib.nullcontext()
    with ctx, dctx:
        _run_trajectory(name, x64, loss_tol, delta_tol, neutralize)


def _run_trajectory(name, x64, loss_tol, delta_tol, neutralize=False):
    ref_dice, tm, fm, template, v0 = _setup(name)
    if x64:
        tm = tm.double()
        v0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          v0)
    p0 = jax.tree.map(np.array, v0["params"])

    tm.train()
    if neutralize:
        from .test_reference_import_parity import neutralize_torch_dropout

        assert neutralize_torch_dropout(tm) > 0
    # criterion selection mirrors train.py:124 (n_classes > 1 -> CE)
    n_classes = int(tm.n_classes)
    crit = (torch.nn.CrossEntropyLoss() if n_classes > 1
            else torch.nn.BCEWithLogitsLoss())
    # reference optimizer config, train.py:107-112 (lr from argparse default)
    opt = torch.optim.RMSprop(tm.parameters(), lr=LR, weight_decay=1e-8,
                              momentum=0.999, foreach=False)

    tx = make_optimizer(LR, weight_decay=1e-8, momentum=0.999)
    state = TrainState(params=v0["params"], batch_stats=v0["batch_stats"],
                       opt_state=tx.init(v0["params"]),
                       step=jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_batch_step_fn(fm, tx, n_classes=n_classes))

    rng = np.random.RandomState(3)
    fdt = np.float64 if x64 else np.float32
    for s in range(STEPS):
        x, y = _batch(rng)
        x, y = x.astype(fdt), y.astype(fdt)  # f32 -> f64 is exact
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        loss_t = _torch_loss(tm, crit, ref_dice, xt, yt)
        opt.zero_grad(set_to_none=True)
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt.step()

        state, loss_j, ok = step_fn(state, jnp.asarray(x), jnp.asarray(y),
                                    jax.random.PRNGKey(s))
        assert bool(ok)
        loss_t = float(loss_t.detach())
        assert abs(float(loss_j) - loss_t) < loss_tol, (
            s, float(loss_j), loss_t)

    # Updated parameters: compare the 3-step deltas in relative L2.
    vT = state_dict_to_variables(name, tm.state_dict(), template)
    num = den = 0.0
    for (pt, t), (pj, j), (_, z) in zip(
            jax.tree_util.tree_leaves_with_path(vT["params"]),
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(p0)):
        assert pt == pj
        dt = np.asarray(t) - np.asarray(z)
        dj = np.asarray(j) - np.asarray(z)
        num += float(np.sum((dt - dj) ** 2))
        den += float(np.sum(dt ** 2))
    assert den > 0.0
    rel = (num / den) ** 0.5
    assert rel < delta_tol, rel  # UNet measured ~0.045: f32 BN-backward noise

    # BN running stats must track torch through all 3 train-mode forwards.
    for (pt, t), (pj, j) in zip(
            jax.tree_util.tree_leaves_with_path(vT["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(state.batch_stats)):
        assert pt == pj
        np.testing.assert_allclose(np.asarray(j), np.asarray(t),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(pt))


def test_gradients_match_torch():
    """Backward parity on the first step: eval-mode (frozen BN) gradients to
    f32 noise; train-mode (batch-stat BN) gradients to the measured shared
    noise class (see module docstring)."""
    ref_dice, tm, fm, template, v0 = _setup()
    crit = torch.nn.BCEWithLogitsLoss()
    rng = np.random.RandomState(3)
    x, y = _batch(rng)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)

    for mode, tol in [("eval", 1e-3), ("train", 5e-2)]:
        getattr(tm, mode)()
        for p in tm.parameters():
            p.grad = None
        loss_t = _torch_loss(tm, crit, ref_dice, xt, yt)
        loss_t.backward()
        tgrads = {k: p.grad.detach().clone()
                  for k, p in tm.named_parameters()}
        # grads transform onto the flax tree exactly like the weights do;
        # running stats are only included to satisfy the mapper's coverage
        stats_sd = {k: v for k, v in tm.state_dict().items()
                    if "running" in k}
        gt = state_dict_to_variables("UNet.UNet", {**tgrads, **stats_sd},
                                     template)

        train_flag = mode == "train"

        def loss_fn(params):
            out = fm.apply(
                {"params": params, "batch_stats": v0["batch_stats"]},
                jnp.asarray(x), train=train_flag,
                mutable=["batch_stats"] if train_flag else False)
            if train_flag:
                out = out[0]
            return combined_loss(out, jnp.asarray(y), 1)[0]

        jgrads = jax.jit(jax.grad(loss_fn))(v0["params"])
        gmax = max(float(np.abs(np.asarray(t)).max())
                   for _, t in jax.tree_util.tree_leaves_with_path(
                       gt["params"]))
        for (pt, t), (pj, j) in zip(
                jax.tree_util.tree_leaves_with_path(gt["params"]),
                jax.tree_util.tree_leaves_with_path(jgrads)):
            assert pt == pj
            t = np.asarray(t)
            j = np.asarray(j)
            if np.abs(t).max() < 1e-6 * gmax:
                continue  # zero-gradient tensor: pure noise either way
            rel = float(np.linalg.norm(t - j)
                        / (np.linalg.norm(t) + 1e-30))
            assert rel < tol, (mode, jax.tree_util.keystr(pt), rel)


def test_barunet_ba_module_backward_matches_torch():
    """BA-module backward (BABasicBlock: channel+spatial attention fusion
    over matmul poolings + SE shortcut, unet_parts.py:233-280) — the one
    zoo mechanism the trajectory matrix above cannot host: BARUNet's
    softmax over ONE output channel is constant 1.0, so the production
    loss passes zero gradient to every parameter.  Pin the backward on a
    BCE loss over the PRE-softmax head (Conv_1x1 output) instead, with
    dropout neutralized on both sides (the BABasicBlock Dropout(0.5),
    unet_parts.py:271), comparing the full parameter-gradient tree to the
    executed reference in relative L2."""
    from jcfszxc_unet_tpu.ops.layers import dropout_disabled
    from jcfszxc_unet_tpu.train.losses import bce_with_logits

    from .test_reference_import_parity import neutralize_torch_dropout

    name = "BARUNet.BARUNet"
    torch.manual_seed(5)
    tm = reference_oracle.make_reference_model(name)
    fm = create_model(name)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)), True))
    v0 = state_dict_to_variables(name, tm.state_dict(), template)

    tm.train()
    assert neutralize_torch_dropout(tm) > 0
    captured = {}
    tm.Conv_1x1.register_forward_hook(
        lambda m, i, o: captured.__setitem__("head", o))

    rng = np.random.RandomState(3)
    x, y = _batch(rng)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    tm(xt)
    loss_t = torch.nn.BCEWithLogitsLoss()(captured["head"], yt)
    loss_t.backward()

    tgrads = {k: p.grad.detach().clone() for k, p in tm.named_parameters()
              if p.grad is not None}
    stats_sd = {k: v for k, v in tm.state_dict().items() if "running" in k}
    gT = state_dict_to_variables(name, {**tgrads, **stats_sd},
                                 template)["params"]

    with dropout_disabled():
        def loss_fn(params):
            _, mut = fm.apply(
                {"params": params, "batch_stats": v0["batch_stats"]},
                jnp.asarray(x), True,
                capture_intermediates=True,
                mutable=["intermediates", "batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            pre = mut["intermediates"]["Conv_1x1"]["__call__"][0]
            return bce_with_logits(pre, jnp.asarray(y))

        loss_j, gJ = jax.value_and_grad(loss_fn)(v0["params"])

    loss_t = float(loss_t.detach())
    assert abs(float(loss_j) - loss_t) < 1e-5, (float(loss_j), loss_t)
    num = den = 0.0
    for (pt, t), (pj, j) in zip(
            jax.tree_util.tree_leaves_with_path(gT),
            jax.tree_util.tree_leaves_with_path(gJ)):
        assert pt == pj
        num += float(np.sum((np.asarray(t) - np.asarray(j)) ** 2))
        den += float(np.sum(np.asarray(t) ** 2))
    assert den > 0.0
    rel = (num / den) ** 0.5
    assert rel < 0.1, rel  # f32 BN-backward noise class (module docstring)
