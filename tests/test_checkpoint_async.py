"""AsyncCheckpointWriter: ordering, final-state, and error propagation.

The writer overlaps the best-checkpoint device→host fetch with training
(reference blocks on torch.save each improvement, train.py:374); these
tests pin the contract the CLI relies on: after close(), the last
submitted write is on disk, and worker exceptions surface at the call
site instead of being swallowed.
"""

import os

import numpy as np
import pytest

from jcfszxc_unet_tpu.train import checkpoint as ckpt


def test_writes_land_in_submission_order(tmp_path):
    path = str(tmp_path / "best.ckpt")
    with ckpt.AsyncCheckpointWriter() as writer:
        for i in range(4):
            writer.submit(
                ckpt.save_model, path, "UNet.UNet", {},
                {"w": np.full((3,), float(i))}, {},
            )
    # after close, the final submit is the file's content
    _, variables, config = ckpt.load_model(path)
    assert config["model_name"] == "UNet.UNet"
    np.testing.assert_array_equal(variables["params"]["w"], np.full((3,), 3.0))


def test_worker_exception_surfaces_on_next_call(tmp_path):
    def boom():
        raise RuntimeError("disk full")

    writer = ckpt.AsyncCheckpointWriter()
    writer.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        writer.wait()
    # writer remains usable after a failed write
    ok = str(tmp_path / "ok.ckpt")
    writer.submit(ckpt.save_model, ok, "UNet.UNet", {}, {"w": np.ones(2)}, {})
    writer.close()
    assert os.path.exists(ok)


def test_close_waits_for_inflight_write(tmp_path):
    import time

    path = str(tmp_path / "slow.ckpt")

    def slow_save():
        time.sleep(0.2)
        ckpt.save_model(path, "UNet.UNet", {}, {"w": np.zeros(1)}, {})

    writer = ckpt.AsyncCheckpointWriter()
    writer.submit(slow_save)
    writer.close()
    assert os.path.exists(path)


def test_orbax_roundtrip(tmp_path):
    """Orbax directory-checkpoint path (save_orbax/restore_orbax) — the
    production multi-host format next to the single-file default."""
    import jax.numpy as jnp

    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.int32(7)}
    d = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(d, tree)
    got = ckpt.restore_orbax(d)
    np.testing.assert_array_equal(got["params"]["w"], tree["params"]["w"])
    assert int(got["step"]) == 7
    # template-typed restore
    got2 = ckpt.restore_orbax(d, template=tree)
    np.testing.assert_array_equal(got2["params"]["w"], tree["params"]["w"])
