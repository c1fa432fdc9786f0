"""PNG artifact writers — same visual contracts as the reference:

  * ``vis_numpy_img`` — horizontal concat of images with 8-px separators,
    1-channel tiled to 3 (reference utils/utils.py:45-69);
  * ``save_triptych`` — the per-epoch image|prediction|label strip
    (reference train.py:398-416) and the per-image eval strip
    (evaluate.py:323-334), with 16-px blank separators;
  * ``save_error_panel`` — TP/FP/FN color-coded panels
    (reference evaluate.py:99-161: green TP, red FP, blue FN).

All functions take NHWC/HWC float arrays in [0,1].
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _to_hwc3(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def _save(arr01: np.ndarray, path: str) -> None:
    assert Image is not None, "PIL required for visualization"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(path)


def vis_numpy_img(imgs: Sequence[np.ndarray], save_path: str,
                  sep: int = 8) -> None:
    """Concat HWC images horizontally with blank separators."""
    imgs = [_to_hwc3(np.asarray(im)) for im in imgs]
    h = imgs[0].shape[0]
    blank = np.zeros((h, sep, 3), imgs[0].dtype)
    parts = []
    for im in imgs:
        parts.extend([im, blank])
    _save(np.concatenate(parts, axis=1), save_path)


def save_triptych(image: np.ndarray, pred: np.ndarray, label: np.ndarray,
                  path: str, sep: int = 16) -> None:
    """image | prediction | label strip with blank separators (stacked along
    height, matching the reference's axis=1 concat of CHW arrays)."""
    image, pred, label = map(_to_hwc3, (image, pred, label))
    w = image.shape[1]
    blank = np.zeros((sep, w, 3), np.float32)
    strip = np.concatenate([image, blank, pred, blank, label], axis=0)
    _save(strip, path)


def save_grayscale(img: np.ndarray, path: str) -> None:
    """Save a single HxW [0,1] map as 8-bit grayscale (reference
    evaluate.py:320-321 demo/ dumps)."""
    assert Image is not None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def save_error_panel(image: np.ndarray, true_mask: np.ndarray,
                     pred_mask: np.ndarray, path: str, sep: int = 16) -> float:
    """image | truth | prediction | compound panel with TP green / FP red /
    FN blue color coding; returns the hard dice of the panel (reference
    evaluate.py:99-161)."""
    image = _to_hwc3(np.asarray(image))
    t = np.asarray(true_mask) > 0.5
    p = np.asarray(pred_mask) > 0.5
    tp, fp, fn = t & p, ~t & p, t & ~p
    h, w = t.shape

    truth_rgb = np.zeros((h, w, 3), np.float32)
    truth_rgb[..., 1] = t.astype(np.float32)
    panel = np.zeros((h, w, 3), np.float32)
    panel[..., 1] = tp
    panel[..., 0] = fp
    panel[..., 2] = fn

    blank = np.zeros((h, sep, 3), np.float32)
    strip = np.concatenate(
        [image, blank, truth_rgb, blank, panel, blank, panel], axis=1
    )
    _save(strip, path)
    inter = (t & p).sum()
    denom = t.sum() + p.sum()
    return float(2.0 * inter / denom) if denom else 0.0
