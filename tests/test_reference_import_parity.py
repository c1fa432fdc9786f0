"""Whole-model parity for ALL 16 models against the *actual* reference
PyTorch modules (/root/reference, loaded via tests/reference_oracle.py),
through the generic torch->Flax weight importer (compat/torch_mapping.py).

For each model:
  1. build the reference nn.Module (random torch init),
  2. perturb its BatchNorm running stats with two train-mode forwards
     (so eval-mode parity exercises transplanted *stats*, not just (0,1)),
  3. map state_dict -> Flax variables with the importer,
  4. compare eval-mode outputs (reference eval path = evaluate.py:421's
     torch.load -> model(batch)),
  5. models whose outputs are constant/saturated by reference defects
     (BARUNet/BIARUNet softmax over 1 channel, BARUNet.py:83; BCDUNet's
     saturating sigmoid head) additionally compare the pre-activation head
     via hooks/capture_intermediates — pinning the full dataflow,
  6. dropout-free models also run ONE train-mode forward on both sides and
     compare every updated BN running stat — train-mode statistics flow
     (momentum 0.1, unbiased var) matches torch exactly.

Also pins all 16 param counts against the instantiated reference modules
(minus the reference's documented dead parameters, EXPECTED_UNUSED).
"""



import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jcfszxc_unet_tpu.compat.torch_mapping import (
    EXPECTED_UNUSED,
    state_dict_to_variables,
)
from jcfszxc_unet_tpu.models import create_model

from . import reference_oracle

pytestmark = pytest.mark.skipif(
    not reference_oracle.reference_available(),
    reason="reference tree not present",
)

SZ = 32

# (registry name, ctor kwargs, has active train-mode dropout, head path for
#  pre-activation comparison or None)
CASES = [
    ("UNet.UNet", {}, False, None),
    ("AttentionUNet.AttentionUNet", {}, False, None),
    ("R2UNet.R2UNet", {}, False, None),
    ("R2AttentionUNet.R2AttentionUNet", {}, False, None),
    ("BARUNet.BARUNet", {}, True, "Conv_1x1"),
    ("BIARUNet.BIARUNet", {}, True, "Conv_1x1"),
    ("DenseUNet.DenseUNet", {}, False, None),
    ("MCUNet.MCUNet", {}, False, None),
    ("ResUNet.ResUNet", {}, False, None),
    ("FRUNet.FRUNet", {}, True, None),
    ("MultiResUNet.MultiResUNet", {}, False, None),
    ("SegNet.SegNet", {}, False, None),
    ("BCDUNet.BCDU_net_D3", {"N": SZ}, True, "decoder.conv9"),
    ("BCDUNet.BCDU_net_D1", {"N": SZ}, True, "decoder.conv9"),
    ("RetinaLiteNet.TransFuseNet", {}, False, None),
    ("UNetPP.NestedUNet", {}, False, None),
]

IDS = [c[0] for c in CASES]


def _build_pair(name, kwargs, seed=0):
    torch.manual_seed(seed)
    tm = reference_oracle.make_reference_model(name, **kwargs)
    tm.train()
    with torch.no_grad():
        for i in range(2):
            tm(torch.from_numpy(
                np.random.RandomState(10 + i)
                .randn(2, 3, SZ, SZ).astype(np.float32)))
    tm.eval()
    fm = create_model(name, **kwargs)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)), True))
    variables = state_dict_to_variables(name, tm.state_dict(), template)
    return tm, fm, variables


def _flax_intermediate(inters, dotted):
    node = inters["intermediates"]
    for seg in dotted.split("."):
        node = node[seg]
    return np.asarray(node["__call__"][0])


@pytest.mark.parametrize("name,kwargs,has_dropout,head", CASES, ids=IDS)
def test_eval_forward_matches_reference(name, kwargs, has_dropout, head):
    tm, fm, variables = _build_pair(name, kwargs)
    x_np = np.random.RandomState(1).rand(2, SZ, SZ, 3).astype(np.float32)

    captured = {}
    if head is not None:
        torch_mod = tm
        for seg in head.split(".")[-1:]:  # reference module is flat
            torch_mod = getattr(torch_mod, seg)
        torch_mod.register_forward_hook(
            lambda m, i, o: captured.__setitem__("head", o))

    with torch.no_grad():
        want = tm(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    if isinstance(want, (tuple, list)):
        want = want[0]
    want = want.permute(0, 2, 3, 1).numpy()

    if head is None:
        got = np.asarray(
            jax.jit(lambda v, x: fm.apply(v, x, False))(
                variables, jnp.asarray(x_np)))
        scale = np.max(np.abs(want)) + 1e-12
        np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)
    else:
        # Constant/saturating heads: compare the pre-activation tensor.
        got, inters = fm.apply(variables, jnp.asarray(x_np), False,
                               capture_intermediates=True,
                               mutable=["intermediates"])
        got = np.asarray(got)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-3)
        pre = _flax_intermediate(inters, head)
        want_pre = captured["head"].permute(0, 2, 3, 1).numpy()
        scale = np.max(np.abs(want_pre)) + 1e-12
        np.testing.assert_allclose(pre, want_pre, atol=2e-4 * scale, rtol=2e-3)


def neutralize_torch_dropout(tm):
    """Put every dropout submodule of a train-mode reference model in
    .eval() (BN stays .train()) — the torch mirror of our
    ops.layers.dropout_disabled parity mode.  Returns the count silenced."""
    import torch.nn as tnn

    n = 0
    for m in tm.modules():
        if isinstance(m, (tnn.Dropout, tnn.Dropout2d, tnn.Dropout3d)):
            m.eval()
            n += 1
    return n


@pytest.mark.parametrize("name,kwargs,has_dropout,head", CASES, ids=IDS)
def test_train_mode_bn_stats_match_reference(name, kwargs, has_dropout, head):
    """One train-mode forward on identical batches must produce identical
    updated running stats on every BN in the model — this pins the complete
    intermediate dataflow (any diverging activation would diverge its BN's
    batch mean/var) plus the torch momentum/unbiased-var conventions.

    Dropout models run with dropout neutralized on BOTH sides (torch
    dropout submodules .eval() inside a .train() model; JAX under
    ops.layers.dropout_disabled): masks are RNG-coupled and cannot match
    across frameworks, but with them silenced the full train-mode dataflow
    and BN-statistics flow of all 16 models is falsifiable."""
    from jcfszxc_unet_tpu.ops.layers import dropout_disabled

    tm, fm, variables = _build_pair(name, kwargs, seed=3)
    x_np = np.random.RandomState(7).rand(2, SZ, SZ, 3).astype(np.float32)

    tm.train()
    if has_dropout:
        assert neutralize_torch_dropout(tm) > 0
    with torch.no_grad():
        tm(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    tm.eval()

    with dropout_disabled():
        _, updated = fm.apply(variables, jnp.asarray(x_np), True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(0)})

    # Re-map the post-step torch state_dict; its batch_stats must equal ours.
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)), True))
    want = state_dict_to_variables(name, tm.state_dict(), template)

    flat_got = jax.tree_util.tree_leaves_with_path(updated["batch_stats"])
    flat_want = jax.tree_util.tree_leaves_with_path(want["batch_stats"])
    assert len(flat_got) == len(flat_want) and len(flat_got) > 0
    for (pg, g), (pw, w) in zip(flat_got, flat_want):
        assert pg == pw
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pg))


@pytest.mark.parametrize("name,kwargs,has_dropout,head", CASES, ids=IDS)
def test_param_count_matches_reference(name, kwargs, has_dropout, head):
    torch.manual_seed(0)
    tm = reference_oracle.make_reference_model(name, **kwargs)
    torch_count = sum(p.numel() for p in tm.parameters())
    dead = 0
    if EXPECTED_UNUSED.get(name):
        # dead = reference parameters our mapping legitimately leaves behind
        # (weight/bias only — running stats are not in parameters())
        sd = tm.state_dict()
        fm = create_model(name, **kwargs)
        template = jax.eval_shape(
            lambda: fm.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SZ, SZ, 3)), True))
        _, info = state_dict_to_variables(name, sd, template,
                                          return_info=True)
        dead = sum(int(sd[k].numel()) for k in info["unused"]
                   if not k.endswith(("running_mean", "running_var")))
    fm = create_model(name, **kwargs)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)), True))
    flax_count = sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(template["params"]))
    assert flax_count == torch_count - dead
