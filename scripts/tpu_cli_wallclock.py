#!/usr/bin/env python
"""End-to-end train-CLI wall-clock on the real chip: sync vs async
checkpoint writes.

Round-1 measurement: on-device training runs at ~1,115 patches/s but the
CLI's wall-clock showed ~60-90 — dominated by the 124 MB best-checkpoint
device→host fetch each improving epoch over the slow relay tunnel.
AsyncCheckpointWriter overlaps that fetch with the next epoch's compute;
this script measures the delta on DRIVE-geometry synthetic data.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_cli_wallclock.py
"""

import os
import sys
import time

import numpy as np


def make_dataset(workdir, n_train=6, h=584, w=565):
    sys.path.insert(0, "/root/repo")
    from jcfszxc_unet_tpu.data.preprocess import save_data

    rng = np.random.RandomState(0)
    images = rng.rand(n_train, h, w, 3).astype(np.float32)
    # circular FOV masks + random-walk "vessels" in the labels
    yy, xx = np.mgrid[:h, :w]
    fov = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (min(h, w) / 2) ** 2)
    masks = np.repeat(fov[None].astype(np.float32), n_train, 0)
    labels = np.zeros((n_train, h, w), np.float32)
    for i in range(n_train):
        y, x = h // 2, w // 2
        for _ in range(4000):
            labels[i, y, x] = 1.0
            y = int(np.clip(y + rng.randint(-2, 3), 1, h - 2))
            x = int(np.clip(x + rng.randint(-2, 3), 1, w - 2))
        images[i, ..., 1] = np.clip(images[i, ..., 1] + labels[i] * 0.5, 0, 1)
    ds = {"images": images, "masks": masks, "labels": labels,
          "filenames": [f"{i:02d}_training.tif" for i in range(n_train)]}
    return save_data(ds, os.path.join(workdir, "data"), "train_eye_dataset")


def run(h5_path, workdir, sync: bool, epochs: int = 5) -> float:
    from jcfszxc_unet_tpu.cli.train import main

    os.chdir(workdir)
    argv = ["-d", h5_path, "-b", "32", "-p", "128", "-s", "100",
            "-l", "1e-4", "-v", "20", "--max-epochs", str(epochs),
            "--save-path", os.path.join(workdir, "best_model.ckpt")]
    if sync:
        argv.append("--sync-checkpoints")
    t0 = time.time()
    main(argv)
    return time.time() - t0


def main():
    import tempfile

    workdir = tempfile.mkdtemp(prefix="cli_wallclock_")
    h5_path = make_dataset(workdir)
    epochs = int(os.environ.get("EPOCHS", "5"))
    results = {}
    # warmup run bears the compile; then alternate to guard relay drift
    for label, sync in [("warmup", True), ("sync", True), ("async", False),
                        ("sync2", True), ("async2", False)]:
        dt = run(h5_path, workdir, sync, epochs)
        results[label] = dt
        print(f"[{label}] {epochs} epochs in {dt:.1f} s "
              f"({epochs * 100 * 32 / dt:.0f} patches/s wall-clock)")
    print(results)


if __name__ == "__main__":
    main()
