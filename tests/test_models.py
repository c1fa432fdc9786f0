"""Model-zoo contract tests: init + forward on small inputs, output shape,
dtype, per-model output-activation contract (logits vs sigmoid vs softmax,
incl. the BARUNet/BIARUNet constant-softmax quirk), and the n_channels /
n_classes attribute contract (incl. the DenseUNet n_classes=128 defect)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jcfszxc_unet_tpu.models import MODEL_REGISTRY, create_model, resolve_model

# (name, ctor kwargs, output activation contract)
CASES = [
    ("UNet.UNet", {}, "logits"),
    ("AttentionUNet.AttentionUNet", {}, "logits"),
    ("R2UNet.R2UNet", {}, "logits"),
    ("R2AttentionUNet.R2AttentionUNet", {}, "logits"),
    ("BARUNet.BARUNet", {}, "softmax1"),
    ("BIARUNet.BIARUNet", {}, "softmax1"),
    ("DenseUNet.DenseUNet", {}, "logits"),
    ("MCUNet.MCUNet", {}, "logits"),
    ("ResUNet.ResUNet", {}, "sigmoid"),
    ("FRUNet.FRUNet", {}, "logits"),
    ("MultiResUNet.MultiResUNet", {}, "logits"),
    ("SegNet.SegNet", {}, "logits"),
    ("BCDUNet.BCDU_net_D3", {"N": 32}, "sigmoid"),
    ("BCDUNet.BCDU_net_D1", {"N": 32}, "sigmoid"),
    ("RetinaLiteNet.TransFuseNet", {}, "sigmoid"),
    ("UNetPP.NestedUNet", {}, "sigmoid"),
]


def _init_and_forward(name, kwargs, train):
    model = create_model(name, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)

    # jit init/apply: eager per-op dispatch is pathologically slow for
    # 60+-layer graphs on the CPU test backend (and caches persistently).
    @jax.jit
    def init(key):
        rngs = {"params": key, "dropout": jax.random.fold_in(key, 1)}
        return model.init(rngs, x, train=False)

    variables = init(jax.random.PRNGKey(0))
    if train:

        @jax.jit
        def fwd_train(variables, x):
            return model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )

        out, _ = fwd_train(variables, x)
    else:
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    return model, out


@pytest.mark.parametrize("name,kwargs,act", CASES)
def test_forward_eval(name, kwargs, act):
    model, out = _init_and_forward(name, kwargs, train=False)
    assert out.shape == (2, 32, 32, 1), (name, out.shape)
    assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out)))
    if act == "sigmoid":
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    elif act == "softmax1":
        # 1-channel softmax is identically 1 (reference BARUNet.py:83 quirk)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
    elif act == "logits":
        # logits should not be confined to [0, 1] for random init — weak
        # sanity only: finite values of either sign allowed.
        pass


@pytest.mark.parametrize(
    "name,kwargs,act",
    [c for c in CASES if c[0] in ("UNet.UNet", "SegNet.SegNet", "BCDUNet.BCDU_net_D1")],
)
def test_forward_train_mode(name, kwargs, act):
    _, out = _init_and_forward(name, kwargs, train=True)
    assert out.shape == (2, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_attribute_contract():
    assert create_model("UNet.UNet").n_channels == 3
    assert create_model("UNet.UNet").n_classes == 1
    # DenseUNet defect: n_classes reports `filters` (reference DenseUNet.py:39)
    assert create_model("DenseUNet.DenseUNet").n_classes == 128
    assert create_model("RetinaLiteNet.TransFuseNet").n_classes == 1


def test_registry_complete():
    assert len(MODEL_REGISTRY) == 16
    assert resolve_model("UNet") is MODEL_REGISTRY["UNet.UNet"]
    with pytest.raises(KeyError):
        resolve_model("NopeNet")


def test_multiresunet_channel_arithmetic():
    # int() truncation arithmetic (reference MultiResUNet.py:37-41)
    from jcfszxc_unet_tpu.models.MultiResUNet import _mrb_out

    assert _mrb_out(32, 1.67) == int(32 * 1.67 * 0.167) + int(32 * 1.67 * 0.333) + int(32 * 1.67 * 0.5)
    assert _mrb_out(32, 1.67) == 8 + 17 + 26
