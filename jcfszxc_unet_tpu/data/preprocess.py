"""DRIVE dataset preprocessing — schema-identical to the reference.

Walks ``<dataset>/{training,test}/`` with ``images/*.tif``,
``mask/<stem>_mask.gif``, ``1st_manual/<id>_manual1.gif`` (reference
preprocess.py:96-111), normalizes float32 /255 (117-119) and writes one file
per split with keys ``images, masks, labels, filenames`` in h5 (default),
pickle or joblib (147-191).

Additive capabilities beyond the reference (north star, BASELINE.md):
grayscale, CLAHE and gamma enhancement options — all off by default so the
default output is bit-compatible with the reference's.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# ---------------------------------------------------------------------------
# Optional enhancement ops (additive vs reference; north star asks for CLAHE
# and gamma which the reference does not implement, preprocess.py:117-119).
# ---------------------------------------------------------------------------


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma of an HxWx3 float image -> HxW."""
    return img @ np.array([0.299, 0.587, 0.114], dtype=img.dtype)


def gamma_correct(img: np.ndarray, gamma: float) -> np.ndarray:
    """Pointwise gamma on a [0,1] float image."""
    return np.clip(img, 0.0, 1.0) ** gamma


def clahe(img: np.ndarray, clip_limit: float = 2.0, n_tiles: int = 8,
          n_bins: int = 256) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization on a [0,1] HxW image.

    Pure-numpy implementation: per-tile clipped-histogram CDFs with bilinear
    interpolation between tile mappings (the standard CLAHE construction).
    """
    h, w = img.shape
    q = np.clip((img * (n_bins - 1)).astype(np.int32), 0, n_bins - 1)
    th, tw = (h + n_tiles - 1) // n_tiles, (w + n_tiles - 1) // n_tiles
    # Per-tile clipped CDF lookup tables.
    luts = np.zeros((n_tiles, n_tiles, n_bins), np.float32)
    for ty in range(n_tiles):
        for tx in range(n_tiles):
            tile = q[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=n_bins).astype(np.float32)
            limit = clip_limit * tile.size / n_bins
            excess = np.maximum(hist - limit, 0.0).sum()
            hist = np.minimum(hist, limit) + excess / n_bins
            cdf = np.cumsum(hist)
            cdf = (cdf - cdf[0]) / max(cdf[-1] - cdf[0], 1e-8)
            luts[ty, tx] = cdf
    # Bilinear interpolation between the four surrounding tile mappings.
    yy = (np.arange(h) + 0.5) / th - 0.5
    xx = (np.arange(w) + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(yy).astype(int), 0, n_tiles - 1)
    x0 = np.clip(np.floor(xx).astype(int), 0, n_tiles - 1)
    y1 = np.clip(y0 + 1, 0, n_tiles - 1)
    x1 = np.clip(x0 + 1, 0, n_tiles - 1)
    fy = np.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xx - x0, 0.0, 1.0)[None, :]
    g = q  # (h, w) bin indices
    v00 = luts[y0[:, None], x0[None, :], g]
    v01 = luts[y0[:, None], x1[None, :], g]
    v10 = luts[y1[:, None], x0[None, :], g]
    v11 = luts[y1[:, None], x1[None, :], g]
    out = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
           + v10 * fy * (1 - fx) + v11 * fy * fx)
    return out.astype(np.float32)


def enhance_image(img: np.ndarray, grayscale: bool = False,
                  use_clahe: bool = False, gamma: Optional[float] = None
                  ) -> np.ndarray:
    """Apply the optional enhancement chain; identity by default."""
    if grayscale:
        g = to_grayscale(img)
        if use_clahe:
            g = clahe(g)
        if gamma is not None:
            g = gamma_correct(g, gamma)
        return np.repeat(g[..., None], 3, axis=-1)
    if use_clahe:
        img = np.stack([clahe(img[..., c]) for c in range(img.shape[-1])], axis=-1)
    if gamma is not None:
        img = gamma_correct(img, gamma)
    return img


# ---------------------------------------------------------------------------
# DRIVE split processing (reference preprocess.py:88-144 semantics)
# ---------------------------------------------------------------------------


def process_data_subset(data_path: str, subset_name: str = "dataset",
                        grayscale: bool = False, use_clahe: bool = False,
                        gamma: Optional[float] = None) -> Dict:
    """Load one DRIVE split into float32 [0,1] arrays.

    Filename conventions per reference preprocess.py:106-111:
    ``images/x.tif`` pairs with ``mask/x_mask.gif`` and
    ``1st_manual/<id>_manual1.gif`` where id = x.split('_')[0].
    """
    assert Image is not None, "PIL required for preprocessing"
    images, masks, labels, filenames = [], [], [], []
    for image_path in sorted(glob.glob(os.path.join(data_path, "images", "*.tif"))):
        image_name = os.path.basename(image_path)
        stem = image_name.split(".")[0]
        mask_file = os.path.join(data_path, "mask", stem + "_mask.gif")
        label_file = os.path.join(
            data_path, "1st_manual", stem.split("_")[0] + "_manual1.gif"
        )
        image = np.asarray(Image.open(image_path), dtype=np.float32) / 255.0
        mask = np.asarray(Image.open(mask_file), dtype=np.float32) / 255.0
        label = np.asarray(Image.open(label_file), dtype=np.float32) / 255.0
        image = enhance_image(image, grayscale, use_clahe, gamma)
        print(
            f"[{subset_name}] {image_name}: image {image.shape}, "
            f"mask {mask.shape}, label {label.shape}"
        )
        images.append(image)
        masks.append(mask)
        labels.append(label)
        filenames.append(image_name)
    return {
        "images": np.array(images),
        "masks": np.array(masks),
        "labels": np.array(labels),
        "filenames": filenames,
    }


def save_data(dataset: Dict, output_dir: str, file_prefix: str,
              save_method: str = "h5") -> str:
    """Persist a split; h5 schema identical to reference preprocess.py:174-184
    (datasets ``images/masks/labels`` + vlen-str ``filenames``)."""
    os.makedirs(output_dir, exist_ok=True)
    if save_method == "h5":
        assert h5py is not None
        output_file = os.path.join(output_dir, file_prefix + ".h5")
        with h5py.File(output_file, "w") as f:
            f.create_dataset("images", data=dataset["images"])
            f.create_dataset("masks", data=dataset["masks"])
            f.create_dataset("labels", data=dataset["labels"])
            dt = h5py.special_dtype(vlen=str)
            f.create_dataset(
                "filenames", data=np.array(dataset["filenames"], dtype=dt)
            )
    elif save_method == "pickle":
        output_file = os.path.join(output_dir, file_prefix + ".pkl")
        with open(output_file, "wb") as f:
            pickle.dump(dataset, f)
    elif save_method == "joblib":
        import joblib

        output_file = os.path.join(output_dir, file_prefix + ".joblib")
        joblib.dump(dataset, output_file, compress=3)
    else:
        raise ValueError(f"Unsupported save method: {save_method}")
    print(f"Saved {len(dataset['images'])} images to {output_file}")
    return output_file


def load_preprocessed_data(file_path: str, load_method: Optional[str] = None) -> Dict:
    """Load a preprocessed split (auto-detect by extension) — reference
    preprocess.py:194-232 / data_loading.py:16-65."""
    if load_method is None:
        if file_path.endswith(".pkl"):
            load_method = "pickle"
        elif file_path.endswith(".joblib"):
            load_method = "joblib"
        elif file_path.endswith(".h5"):
            load_method = "h5"
        else:
            raise ValueError(f"Cannot infer load method from: {file_path}")
    if load_method == "pickle":
        with open(file_path, "rb") as f:
            return pickle.load(f)
    if load_method == "joblib":
        import joblib

        return joblib.load(file_path)
    if load_method == "h5":
        assert h5py is not None
        out = {}
        with h5py.File(file_path, "r") as f:
            out["images"] = f["images"][:]
            out["masks"] = f["masks"][:]
            out["labels"] = f["labels"][:]
            names = f["filenames"][:]
            out["filenames"] = [
                n.decode("utf-8") if isinstance(n, bytes) else n for n in names
            ]
        return out
    raise ValueError(f"Unsupported load method: {load_method}")


def preprocess_dataset(dataset_path: str = "../datasets/drive_eye/",
                       output_dir: str = "data/", save_method: str = "h5",
                       include_test: bool = True, grayscale: bool = False,
                       use_clahe: bool = False, gamma: Optional[float] = None
                       ) -> Dict:
    """Process training (and optionally test) splits — reference
    preprocess.py:18-85 flow, same output filenames."""

    def info(ds, path):
        return {
            "num_samples": len(ds["images"]),
            "image_shape": ds["images"].shape if len(ds["images"]) else None,
            "mask_shape": ds["masks"].shape if len(ds["masks"]) else None,
            "label_shape": ds["labels"].shape if len(ds["labels"]) else None,
            "output_file": path,
        }

    train = process_data_subset(
        os.path.join(dataset_path, "training"), "train", grayscale, use_clahe, gamma
    )
    train_file = save_data(train, output_dir, "train_eye_dataset", save_method)
    result = {"train": info(train, train_file), "test": None}
    if include_test:
        test = process_data_subset(
            os.path.join(dataset_path, "test"), "test", grayscale, use_clahe, gamma
        )
        test_file = save_data(test, output_dir, "test_eye_dataset", save_method)
        result["test"] = info(test, test_file)
    return result
