"""--logit-head (additive, off by default): the five reference-defect
models expose their pre-activation head so they can actually learn
through the CLI (VERDICT r3 item 9).

Pinned invariants:
  * default (logit_head absent/False) forward is byte-identical to the
    reference-parity behavior (the parity suites cover that; here we pin
    that activation(logit_head output) == default output on the SAME
    parameter tree — i.e. the flag only peels the activation off).
  * the parameter tree is identical, so checkpoints compose.
  * registry helper lists exactly the five.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jcfszxc_unet_tpu.models import create_model, logit_head_capable

FIVE = [
    "BARUNet.BARUNet",
    "BCDUNet.BCDU_net_D1",
    "BCDUNet.BCDU_net_D3",
    "BIARUNet.BIARUNet",
    "RetinaLiteNet.TransFuseNet",
]
# channel-softmax models (constant 1.0 at out_ch=1) vs sigmoid models
SOFTMAX = {"BARUNet.BARUNet", "BIARUNet.BIARUNet"}


def test_registry_helper_lists_exactly_the_five_defect_models():
    assert logit_head_capable() == FIVE


@pytest.mark.parametrize("name", FIVE)
def test_logit_head_peels_only_the_activation(name):
    kw = {"N": 16} if name.startswith("BCDUNet.") else {}
    plain = create_model(name, **kw)
    logit = create_model(name, logit_head=True, **kw)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)

    # identical parameter tree: the logit-head module accepts the plain
    # module's variables as-is
    out_plain = plain.apply(variables, x, train=False)
    out_logit = logit.apply(variables, x, train=False)

    assert out_logit.shape == out_plain.shape
    if name in SOFTMAX:
        # reference defect: softmax over 1 channel == constant 1.0
        np.testing.assert_allclose(np.asarray(out_plain), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(out_logit, axis=-1)),
            np.asarray(out_plain), atol=1e-6)
        # and the pre-activation head actually carries signal
        assert float(jnp.std(out_logit)) > 0
    else:
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(out_logit)),
            np.asarray(out_plain), rtol=1e-5, atol=1e-6)


def test_train_cli_rejects_logit_head_on_logit_models(tmp_path, monkeypatch):
    from jcfszxc_unet_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="not supported by UNet.UNet"):
        train_cli.main(["--model", "UNet.UNet", "--logit-head"])


def test_logit_head_checkpoint_roundtrip(tmp_path):
    """model_kwargs carry logit_head so evaluate.py reconstructs it."""
    from jcfszxc_unet_tpu.train import checkpoint as ckpt

    model = create_model("RetinaLiteNet.TransFuseNet", logit_head=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    path = str(tmp_path / "m.ckpt")
    ckpt.save_model(path, "RetinaLiteNet.TransFuseNet",
                    {"logit_head": True}, variables["params"],
                    variables.get("batch_stats", {}))
    model2, variables2, config = ckpt.load_model_any(path)
    assert config["model_kwargs"].get("logit_head") is True
    assert getattr(model2, "logit_head", False) is True
    out1 = model.apply(variables, x, train=False)
    out2 = model2.apply(
        {"params": variables2["params"],
         "batch_stats": variables2.get("batch_stats", {})}, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
