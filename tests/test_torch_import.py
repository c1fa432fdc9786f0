"""Reference-checkpoint import: a whole pickled nn.Module saved exactly the
way the reference does (torch.save(model, "best_model.pth"), train.py:374)
must convert into a framework checkpoint that loads and reproduces the
torch model's eval outputs — the drop-in contract of evaluate.py:421.

The .pth is created from the *actual* reference model classes, then
unpickled in a process where those classes resolve to skeletons
(compat/torch_import.py) — exactly a framework user's situation.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.compat.torch_import import (
    import_torch_checkpoint,
    load_pth_state_dict,
)
from jcfszxc_unet_tpu.train.checkpoint import load_model

from . import reference_oracle

pytestmark = pytest.mark.skipif(
    not reference_oracle.reference_available(),
    reason="reference tree not present",
)


def _save_reference_pth(tmp_path, name, **kwargs):
    torch.manual_seed(11)
    tm = reference_oracle.make_reference_model(name, **kwargs)
    tm.train()
    with torch.no_grad():  # non-trivial BN running stats
        tm(torch.randn(2, 3, 32, 32))
    tm.eval()
    pth = tmp_path / "best_model.pth"
    with reference_oracle.reference_modules_registered():
        torch.save(tm, str(pth))
    return tm, str(pth)


@pytest.mark.parametrize("name", ["UNet.UNet", "SegNet.SegNet"])
def test_pth_roundtrip_matches_torch_eval(tmp_path, name):
    tm, pth = _save_reference_pth(tmp_path, name)
    out = str(tmp_path / "imported.ckpt")
    import_torch_checkpoint(pth, name, out, input_hw=32)

    model, variables, config = load_model(out)
    assert config["model_name"] == name

    x_np = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(jax.jit(lambda v, x: model.apply(v, x, False))(
        variables, jnp.asarray(x_np)))
    scale = np.max(np.abs(want)) + 1e-12
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


def test_predictor_accepts_pth(tmp_path):
    """Predictor.from_checkpoint has the same dual .ckpt/.pth acceptance as
    the evaluate CLI (checkpoint.load_model_any)."""
    from jcfszxc_unet_tpu.eval.predictor import Predictor

    tm, pth = _save_reference_pth(tmp_path, "UNet.UNet")
    p = Predictor.from_checkpoint(pth, compute_dtype=jnp.float32,
                                  patch_size=32)
    x_np = np.random.RandomState(4).rand(2, 32, 32, 3).astype(np.float32)
    probs = np.asarray(p.predict_patches(x_np))
    with torch.no_grad():
        want = torch.sigmoid(tm(torch.from_numpy(x_np).permute(0, 3, 1, 2)))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(probs, want, atol=2e-4, rtol=2e-3)


def test_pth_loads_without_reference_classes(tmp_path):
    """The skeleton unpickler must work even when the pickled module's
    classes are NOT importable (module path points nowhere)."""
    torch.manual_seed(1)
    tm = reference_oracle.make_reference_model("UNet.UNet")
    pth = tmp_path / "m.pth"
    with reference_oracle.reference_modules_registered():
        torch.save(tm, str(pth))
    sd = load_pth_state_dict(str(pth))
    assert "inc.double_conv.0.weight" in sd
    assert sd["inc.double_conv.0.weight"].shape == (64, 3, 3, 3)


def test_evaluate_cli_accepts_pth_directly(tmp_path, monkeypatch):
    """evaluate.py -m best_model.pth — the reference's own artifact — runs
    the full tiled-eval pipeline (evaluate.py:421 drop-in contract)."""
    from jcfszxc_unet_tpu.cli import evaluate as eval_cli
    from jcfszxc_unet_tpu.data.preprocess import preprocess_dataset

    from .test_e2e import make_synthetic_drive

    _, pth = _save_reference_pth(tmp_path, "UNet.UNet")
    root = str(tmp_path / "drive")
    make_synthetic_drive(root)
    monkeypatch.chdir(tmp_path)
    res = preprocess_dataset(dataset_path=root, output_dir="data",
                             save_method="h5")
    eval_cli.main([
        "-m", pth, "-d", res["test"]["output_file"],
        "-o", str(tmp_path / "preds"), "-p", "32", "--dtype", "float32",
        "--devices", "1",
    ])
    assert (tmp_path / "preds" / "prediction_0.png").exists()


def test_state_dict_bundle_accepted(tmp_path):
    """train-demo.py:600-604 saves {'model_state_dict': ...} bundles —
    accepted too."""
    torch.manual_seed(2)
    tm = reference_oracle.make_reference_model("UNet.UNet")
    pth = tmp_path / "bundle.pth"
    torch.save({"model_state_dict": tm.state_dict(), "epoch": 3}, str(pth))
    sd = load_pth_state_dict(str(pth))
    assert "outc.conv.weight" in sd
