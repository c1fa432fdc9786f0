"""Flax -> torch state_dict export (compat/torch_mapping.variables_to_state_dict
+ compat/torch_export): the inverse of the importer, making checkpoint
interchange two-way.

Coverage:
  1. Import-then-export round-trips the *actual* reference modules'
     state_dicts bit-exactly for all 16 models (the transforms are lossless
     transposes/flips), emitting exactly the keys the forward reads plus
     num_batches_tracked.
  2. Flax-initialized variables (with train-mode-perturbed BN stats) load
     into a fresh reference nn.Module via ``load_state_dict`` and reproduce
     the Flax eval forward — the actual "eject path" use case.
  3. The .pth written by the export CLI loads back through our own .pth
     importer (full circle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jcfszxc_unet_tpu.compat.torch_mapping import (
    EXPECTED_UNUSED,
    state_dict_to_variables,
    variables_to_state_dict,
)
from jcfszxc_unet_tpu.models import create_model

from . import reference_oracle
from .test_reference_import_parity import CASES, IDS, SZ

pytestmark = pytest.mark.skipif(
    not reference_oracle.reference_available(),
    reason="reference tree not present",
)


@pytest.mark.parametrize("name,kwargs,has_dropout,head", CASES, ids=IDS)
def test_import_export_round_trip_is_bit_exact(name, kwargs, has_dropout,
                                               head):
    torch.manual_seed(0)
    tm = reference_oracle.make_reference_model(name, **kwargs)
    tm.train()
    with torch.no_grad():  # perturb BN running stats so they carry signal
        tm(torch.from_numpy(
            np.random.RandomState(5).randn(2, 3, SZ, SZ).astype(np.float32)))
    sd = {k: v.detach().cpu().numpy().copy() for k, v in tm.state_dict().items()}

    fm = create_model(name, **kwargs)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, SZ, SZ, 3)),
                        True))
    variables, info = state_dict_to_variables(name, tm.state_dict(), template,
                                              return_info=True)
    back = variables_to_state_dict(name, variables)

    # Exported keys == consumed keys + one num_batches_tracked per BN.
    nbt = {k for k in back if k.endswith("num_batches_tracked")}
    assert set(back) - nbt == info["consumed"]
    for k in nbt:
        assert k in sd  # every emitted tracker exists on the torch side
    # Every consumed leaf round-trips losslessly.
    for k in info["consumed"]:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
        assert back[k].dtype == sd[k].dtype, k


@pytest.mark.parametrize("name,kwargs,strict", [
    ("UNet.UNet", {}, True),
    ("FRUNet.FRUNet", {}, False),  # dead reference params -> strict=False
])
def test_flax_weights_load_into_reference_module(name, kwargs, strict,
                                                 tmp_path):
    """The eject path: Flax-trained variables -> .pth -> reference module
    reproduces the Flax eval forward."""
    fm = create_model(name, **kwargs)
    variables = fm.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, SZ, SZ, 3), jnp.float32), True)
    # Perturb BN running stats with one train-mode forward so exported
    # statistics are non-trivial.
    x_stats = jnp.asarray(
        np.random.RandomState(8).rand(2, SZ, SZ, 3).astype(np.float32))
    _, mut = fm.apply(variables, x_stats, True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(9)})
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}

    from jcfszxc_unet_tpu.compat.torch_export import export_torch_state_dict

    pth = str(tmp_path / "ejected.pth")
    export_torch_state_dict(name, jax.tree.map(np.asarray, variables), pth)

    torch.manual_seed(1)
    tm = reference_oracle.make_reference_model(name, **kwargs)
    sd = torch.load(pth, weights_only=True)
    result = tm.load_state_dict(sd, strict=strict)
    if not strict:
        # Only the reference's documented dead parameters may be missing.
        import re
        allowed = [re.compile(p) for p in EXPECTED_UNUSED.get(name, ())]
        for k in result.missing_keys:
            assert (any(p.search(k) for p in allowed)
                    or k.endswith("num_batches_tracked")), k
        assert not result.unexpected_keys
    tm.eval()

    x_np = np.random.RandomState(2).rand(2, SZ, SZ, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    if isinstance(want, (tuple, list)):
        want = want[0]
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(jax.jit(lambda v, x: fm.apply(v, x, False))(
        variables, jnp.asarray(x_np)))
    scale = np.max(np.abs(want)) + 1e-12
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


def test_export_cli_full_circle(tmp_path):
    """ckpt -> (CLI) .pth -> our own .pth importer -> identical params."""
    from jcfszxc_unet_tpu.compat import torch_export
    from jcfszxc_unet_tpu.compat.torch_import import (
        load_pth_state_dict,
        variables_from_state_dict,
    )
    from jcfszxc_unet_tpu.train.checkpoint import save_model

    name = "UNet.UNet"
    fm = create_model(name)
    variables = fm.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 16, 16, 3), jnp.float32), True)
    variables = jax.tree.map(np.asarray, variables)
    ckpt = str(tmp_path / "m.ckpt")
    save_model(ckpt, name, {}, variables["params"], variables["batch_stats"])

    pth = str(tmp_path / "m.pth")
    torch_export.main(["--ckpt", ckpt, "--out", pth])

    sd = load_pth_state_dict(pth)
    _, back = variables_from_state_dict(name, sd, input_hw=16)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
