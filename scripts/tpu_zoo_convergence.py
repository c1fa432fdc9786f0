#!/usr/bin/env python
"""Zoo convergence beyond UNet (VERDICT r2 item 6): drive the REAL
train.py -> evaluate.py CLIs on a synthetic DRIVE-geometry dataset for
FRUNet (the reference's best-Dice model, train.py:510), SegNet, and
MultiResUNet, and record the dice trajectories + held-out eval Dice/AUC.

Same protocol as the round-2 UNet row (experiments_record.md "Full
drop-in pipeline on hardware"): 6 train + 2 test images at 584x565,
circular FOV, random-walk vessels, `-b 32 -p 128 -s 100 -l 1e-4`.

Usage:
  CONV_MODELS=FRUNet.FRUNet,SegNet.SegNet \
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_zoo_convergence.py
"""

import os
import sys
import tempfile

import numpy as np

# Entries are "Registry.Name[=lr]"; SegNet needs a gentler lr than the
# others — at 1e-4 its activations evolve faster than the BN running
# stats (momentum 0.1) can track, so train-mode learns while eval-mode
# (running-stats) output stays saturated-negative: val dice then reads
# as the empty-patch guard (all-zero predictions score 1.0 on
# vessel-free grid patches), flapping between ~0.76 and ~0.
MODELS = [m for m in os.environ.get(
    "CONV_MODELS",
    "FRUNet.FRUNet,SegNet.SegNet=1e-5,MultiResUNet.MultiResUNet")
    .split(",") if m]
EPOCHS = os.environ.get("CONV_EPOCHS", "6")
DEFAULT_LR = os.environ.get("CONV_LR", "1e-4")
# e.g. CONV_EXTRA="--precise-bn 4" — appended to every train invocation.
EXTRA = os.environ.get("CONV_EXTRA", "").split()


def make_dataset(workdir, n, h, w, stem, seed):
    sys.path.insert(0, "/root/repo")
    from jcfszxc_unet_tpu.data.preprocess import save_data

    rng = np.random.RandomState(seed)
    images = rng.rand(n, h, w, 3).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    fov = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (min(h, w) / 2) ** 2)
    masks = np.repeat(fov[None].astype(np.float32), n, 0)
    labels = np.zeros((n, h, w), np.float32)
    for i in range(n):
        y, x = h // 2, w // 2
        for _ in range(4000):
            labels[i, y, x] = 1.0
            y = int(np.clip(y + rng.randint(-2, 3), 1, h - 2))
            x = int(np.clip(x + rng.randint(-2, 3), 1, w - 2))
        images[i, ..., 1] = np.clip(images[i, ..., 1] + labels[i] * 0.5, 0, 1)
    ds = {"images": images, "masks": masks, "labels": labels,
          "filenames": [f"{i:02d}_{stem}.tif" for i in range(n)]}
    return save_data(ds, os.path.join(workdir, "data"), f"{stem}_eye_dataset")


def main():
    workdir = tempfile.mkdtemp(prefix="zoo_conv_")
    os.chdir(workdir)
    train_h5 = make_dataset(workdir, 6, 584, 565, "train", 0)
    test_h5 = make_dataset(workdir, 2, 584, 565, "test", 9)
    print(f"workdir {workdir}", flush=True)

    from jcfszxc_unet_tpu.cli import evaluate as eval_cli
    from jcfszxc_unet_tpu.cli import train as train_cli

    for spec in MODELS:
        name, _, lr = spec.partition("=")
        lr = lr or DEFAULT_LR
        ckpt = os.path.join(workdir, f"best_{name.split('.')[-1]}.ckpt")
        print(f"\n=== {name}: train (lr {lr}) ===", flush=True)
        train_cli.main([
            "-d", train_h5, "-b", "32", "-p", "128", "-s", "100",
            "-l", lr, "-v", "20", "--max-epochs", EPOCHS,
            "--model", name, "--save-path", ckpt,
        ] + EXTRA)
        print(f"=== {name}: evaluate ===", flush=True)
        eval_cli.main([
            "-m", ckpt, "-d", test_h5,
            "-o", os.path.join(workdir, f"pred_{name.split('.')[-1]}"),
        ])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
