"""Fractal-training CLI (reference: train-demo.py) — the experimental
multi-scale "fractal" trainer: fractal patch sampling, a trainable
input-enhancement CNN, and a box-counting fractal-dimension loss (all
on-device; see jcfszxc_unet_tpu/train/fractal.py).  Same CLI flags as
the reference (train-demo.py:667-735, a clone of train.py's)."""

from __future__ import annotations

import argparse
import logging
import os


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a UNet with fractal optimization"
    )
    parser.add_argument("--data-file", "-d", type=str,
                        default="./data/train_eye_dataset.h5",
                        help="Path to the h5 dataset")
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B",
                        type=int, default=32, help="Batch size")
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float,
                        default=1e-6, help="Learning rate", dest="lr")
    parser.add_argument("--load", "-f", type=str, default=False,
                        help="Load model from a checkpoint file")
    parser.add_argument("--validation", "-v", dest="val", type=float,
                        default=10.0,
                        help="Percent of the data used as validation (0-100)")
    parser.add_argument("--patch-size", "-p", dest="patch_size", type=int,
                        default=128, help="Size of training patches")
    parser.add_argument("--steps", "-s", type=int, default=100,
                        help="Number of steps per epoch")
    parser.add_argument("--seed", type=int, default=42, help="Random seed")
    parser.add_argument("--early-stopping-patience", "-esp",
                        dest="early_stopping_patience", type=int, default=20,
                        help="Epochs with no improvement before stopping")
    parser.add_argument("--model", "-m", type=str, default="UNet.UNet",
                        help="Registry model name")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--max-epochs", type=int, default=0)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from jcfszxc_unet_tpu.models import create_model
    from jcfszxc_unet_tpu.train import checkpoint as ckpt
    from jcfszxc_unet_tpu.train.fractal import train_with_fractal_optimization

    args = get_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    logging.info(f"Using devices: {jax.devices()}")

    from jcfszxc_unet_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.load:
        model, _, cfg = ckpt.load_model(args.load, dtype=compute_dtype)
        model_name = cfg["model_name"]
        logging.info(f"Model loaded from {args.load}")
    else:
        model_name = args.model
        model = create_model(model_name, dtype=compute_dtype)

    logging.info(
        f"Network:\n\t{model.n_channels} input channels\n"
        f"\t{model.n_classes} output channels (classes)\n"
    )
    os.makedirs("visualizations", exist_ok=True)
    train_with_fractal_optimization(
        model=model,
        model_name=model_name,
        input_data=args.data_file,
        steps=args.steps,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        val_percent=args.val / 100,
        patch_size=args.patch_size,
        seed=args.seed,
        early_stopping_patience=args.early_stopping_patience,
        compute_dtype=compute_dtype,
        max_epochs=args.max_epochs or None,
    )


if __name__ == "__main__":
    main()
