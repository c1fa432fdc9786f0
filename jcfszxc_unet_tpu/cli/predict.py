"""Single-image inference CLI — serving companion to ``evaluate.py``.

The reference has no way to run a trained model on a plain image file
(its evaluate.py only reads the preprocessed h5 test split,
evaluate.py:176-182).  This CLI wraps ``eval.predictor.Predictor`` so a
deployment can go straight from image files to probability / binary
vessel maps:

    jcfszxc-predict retina.tif -m best_model.ckpt -o out/
    jcfszxc-predict *.tif --mode spatial        # whole-image fast path

Accepts framework ``.ckpt`` and reference ``.pth`` checkpoints alike.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def predict_files(
    paths,
    model_path: str = "best_model.ckpt",
    output_dir: str = "./predictions",
    patch_size: int = 512,
    mode: str = "tiled",
    overlap: float = 0.5,
    threshold: float = 0.5,
    inference_batch_size: int = 32,
    compute_dtype=None,
    tta: bool = False,
):
    """Run inference on image files; writes ``<stem>_prob.png`` and
    ``<stem>_mask.png`` per input.  Returns the list of probability maps.

    ``mode``: ``tiled`` (grid + count-averaged stitch, the evaluate.py
    protocol), ``sliding`` (top-left-anchored windows at stride
    ``patch*(1-overlap)``), or ``spatial`` (whole-image spatially-
    partitioned forward — no tiling; fastest at DRIVE geometry).
    """
    import jax.numpy as jnp
    from PIL import Image

    from jcfszxc_unet_tpu.eval.predictor import Predictor
    from jcfszxc_unet_tpu.utils.vis import save_grayscale

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    if tta and mode == "spatial":
        raise ValueError("--tta needs square patches; use the tiled or "
                         "sliding modes")
    predictor = Predictor.from_checkpoint(
        model_path, compute_dtype=compute_dtype, patch_size=patch_size,
        inference_batch_size=inference_batch_size, tta=tta)

    os.makedirs(output_dir, exist_ok=True)
    prob_maps = []
    for path in paths:
        raw = np.asarray(Image.open(path))
        # Normalize by the input's own integer range (16-bit TIFF scanner
        # output is common for retinal imagery; /255 would blow past 1.0).
        scale = float(np.iinfo(raw.dtype).max) if raw.dtype.kind in "iu" else 1.0
        img = raw.astype(np.float32) / scale
        if img.ndim == 2:  # grayscale input -> replicate to the 3 channels
            img = np.repeat(img[..., None], 3, axis=-1)
        elif img.shape[-1] == 4:  # RGBA -> drop alpha
            img = img[..., :3]
        if mode == "spatial":
            probs = np.asarray(predictor.predict_spatial(img[None]))[0]
        elif mode == "sliding":
            probs = np.asarray(predictor.predict_full_image(
                img, patch_size=patch_size, overlap=overlap,
                batch_size=inference_batch_size))
        else:
            probs = np.asarray(predictor.predict_images(img[None]))[0]
        probs = probs[..., 0] if probs.ndim == 3 else probs
        stem = os.path.splitext(os.path.basename(path))[0]
        save_grayscale(probs, os.path.join(output_dir, f"{stem}_prob.png"))
        save_grayscale((probs > threshold).astype(np.float32),
                       os.path.join(output_dir, f"{stem}_mask.png"))
        logging.info(f"{path}: vessel fraction "
                     f"{float((probs > threshold).mean()):.4f}")
        prob_maps.append(probs)
    return prob_maps


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run a trained model on image files (no h5 needed)"
    )
    parser.add_argument("inputs", nargs="+", help="Image files (tif/png/...)")
    parser.add_argument("--model", "-m", type=str, default="best_model.ckpt",
                        help="Checkpoint path (.ckpt or reference .pth)")
    parser.add_argument("--output-dir", "-o", type=str, default="./predictions",
                        help="Directory for <stem>_prob.png / <stem>_mask.png")
    parser.add_argument("--patch-size", "-p", type=int, default=512,
                        help="Patch size (tiled/sliding modes)")
    parser.add_argument("--mode", choices=["tiled", "sliding", "spatial"],
                        default="tiled", help="Inference protocol")
    parser.add_argument("--overlap", type=float, default=0.5,
                        help="Window overlap (sliding mode)")
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="Binarization threshold for the mask output")
    parser.add_argument("--inference-batch-size", type=int, default=32,
                        help="Patch batch size")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"], help="Compute dtype")
    parser.add_argument("--tta", action="store_true",
                        help="Dihedral-8 test-time augmentation "
                             "(8x compute; tiled/sliding modes)")
    return parser.parse_args(argv)


def main(argv=None):
    import jax.numpy as jnp

    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    predict_files(
        args.inputs,
        model_path=args.model,
        output_dir=args.output_dir,
        patch_size=args.patch_size,
        mode=args.mode,
        overlap=args.overlap,
        threshold=args.threshold,
        inference_batch_size=args.inference_batch_size,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        tta=args.tta,
    )


if __name__ == "__main__":
    main()
