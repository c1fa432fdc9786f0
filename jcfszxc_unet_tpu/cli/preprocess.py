"""Preprocessing CLI — drop-in equivalent of the reference's
``preprocess.py`` __main__ (preprocess.py:235-257): process DRIVE train/test
splits, save (h5 default), then smoke-test reload.  Adds flags for the
dataset path, save method, and the optional CLAHE/gamma/grayscale
enhancements (north star additions; off by default)."""

from __future__ import annotations

import argparse

from jcfszxc_unet_tpu.data.preprocess import load_preprocessed_data, preprocess_dataset


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Preprocess the DRIVE dataset")
    parser.add_argument("--dataset-path", type=str, default="../datasets/drive_eye/",
                        help="DRIVE root containing training/ and test/")
    parser.add_argument("--output-dir", type=str, default="data/",
                        help="Output directory for the split files")
    parser.add_argument("--save-method", type=str, default="h5",
                        choices=["h5", "pickle", "joblib"])
    parser.add_argument("--no-test", action="store_true",
                        help="Skip the test split")
    parser.add_argument("--grayscale", action="store_true",
                        help="Convert to grayscale (replicated to 3 channels)")
    parser.add_argument("--clahe", action="store_true",
                        help="Apply CLAHE contrast enhancement")
    parser.add_argument("--gamma", type=float, default=None,
                        help="Apply gamma correction with this exponent")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    info = preprocess_dataset(
        dataset_path=args.dataset_path,
        output_dir=args.output_dir,
        save_method=args.save_method,
        include_test=not args.no_test,
        grayscale=args.grayscale,
        use_clahe=args.clahe,
        gamma=args.gamma,
    )
    print("\nTrain split info:")
    for key, value in info["train"].items():
        print(f"{key}: {value}")
    if info["test"]:
        print("\nTest split info:")
        for key, value in info["test"].items():
            print(f"{key}: {value}")
    # Reload smoke test (reference preprocess.py:249-257)
    print("\nVerifying reload...")
    train = load_preprocessed_data(info["train"]["output_file"])
    print(f"Reloaded train split - images: {len(train['images'])}")
    if info["test"]:
        test = load_preprocessed_data(info["test"]["output_file"])
        print(f"Reloaded test split - images: {len(test['images'])}")


if __name__ == "__main__":
    main()
