"""Artifact-writer tests: triptych/error-panel/grayscale PNG contracts."""

import numpy as np
from PIL import Image

from jcfszxc_unet_tpu.utils.vis import (
    save_error_panel,
    save_grayscale,
    save_triptych,
    vis_numpy_img,
)


def test_triptych_layout(tmp_path):
    img = np.random.rand(32, 24, 3).astype(np.float32)
    pred = np.random.rand(32, 24).astype(np.float32)
    lab = (np.random.rand(32, 24) > 0.5).astype(np.float32)
    path = str(tmp_path / "t.png")
    save_triptych(img, pred, lab, path)
    out = np.asarray(Image.open(path))
    # 3 panels stacked along height with 2 x 16px separators
    assert out.shape == (32 * 3 + 16 * 2, 24, 3)


def test_error_panel_colors_and_dice(tmp_path):
    img = np.zeros((16, 16, 3), np.float32)
    truth = np.zeros((16, 16), np.float32)
    pred = np.zeros((16, 16), np.float32)
    truth[4:8, 4:8] = 1.0   # FN region (blue)
    pred[8:12, 8:12] = 1.0  # FP region (red)
    truth[0:2, 0:2] = 1.0
    pred[0:2, 0:2] = 1.0    # TP region (green)
    path = str(tmp_path / "e.png")
    dice = save_error_panel(img, truth, pred, path)
    out = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    # compound panel is the last 16 columns
    panel = out[:, -16:, :]
    assert panel[0, 0, 1] > 0.9    # TP green
    assert panel[9, 9, 0] > 0.9    # FP red
    assert panel[5, 5, 2] > 0.9    # FN blue
    # dice = 2*4 / (20 + 20)
    assert abs(dice - 2 * 4 / 40) < 1e-6


def test_grayscale_and_concat(tmp_path):
    m = np.random.rand(8, 8).astype(np.float32)
    save_grayscale(m, str(tmp_path / "g.png"))
    assert np.asarray(Image.open(tmp_path / "g.png")).shape == (8, 8)
    vis_numpy_img([np.random.rand(8, 8, 3)] * 2, str(tmp_path / "c.png"))
    out = np.asarray(Image.open(tmp_path / "c.png"))
    assert out.shape == (8, (8 + 8) * 2, 3)
