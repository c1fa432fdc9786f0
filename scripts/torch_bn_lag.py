#!/usr/bin/env python
"""Is the train-mode/eval-mode dice gap (SegNet collapse, MultiResUNet
plateau) OUR bug or the reference's behavior?  Train the REFERENCE torch
model (loaded from /root/reference, CPU) with the reference's exact training math
(RMSprop(momentum=.999, wd=1e-8), 0.5*BCE + 0.5*dice, clip 1.0 —
train.py:107-301) on synthetic vessel patches at lr=1e-4, and compare
train-mode vs eval-mode predictions along the way.

Observed on the TPU framework (experiments_record.md round 3): at
lr=1e-4 SegNet learns in train mode (batch-stats dice ~0.5) while
eval-mode logits saturate hugely negative — the BN running stats
(momentum 0.1) lag the rapidly evolving activations.  If torch shows the
same signature, the convergence-row failure is inherited dynamics, not a
framework defect.
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/reference")
from reference_oracle import make_reference_model  # noqa: E402  (stubs torchvision/timm)
from utils.dice_score import dice_loss  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "SegNet"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
B, P = 16, 128


def make_batch(rng, n):
    imgs = rng.rand(n, 3, P, P).astype(np.float32)
    labs = np.zeros((n, 1, P, P), np.float32)
    for i in range(n):
        y, x = P // 2, P // 2
        for _ in range(800):
            labs[i, 0, y, x] = 1.0
            y = int(np.clip(y + rng.randint(-2, 3), 1, P - 2))
            x = int(np.clip(x + rng.randint(-2, 3), 1, P - 2))
        imgs[i, 1] = np.clip(imgs[i, 1] + labs[i, 0] * 0.5, 0, 1)
    return torch.from_numpy(imgs), torch.from_numpy(labs)


def dice_at(logits, labs):
    pred = (torch.sigmoid(logits) > 0.5).float()
    inter = (pred * labs).sum()
    return float(2 * inter / (pred.sum() + labs.sum() + 1e-9))


def main():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    if MODEL == "SegNet":
        model = make_reference_model("SegNet.SegNet")
    else:
        model = make_reference_model("MultiResUNet.MultiResUNet")
    opt = torch.optim.RMSprop(
        model.parameters(), lr=LR, weight_decay=1e-8, momentum=0.999)
    crit = torch.nn.BCEWithLogitsLoss()
    probe_x, probe_y = make_batch(np.random.RandomState(99), 8)

    for step in range(1, STEPS + 1):
        model.train()
        x, y = make_batch(rng, B)
        logits = model(x)
        loss = 0.5 * crit(logits, y) + 0.5 * dice_loss(
            torch.sigmoid(logits).squeeze(1), y.squeeze(1),
            multiclass=False)  # train.py:265-278
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if step % 20 == 0 or step == 1:
            model.eval()
            with torch.no_grad():
                ev = model(probe_x)
            model.train()
            with torch.no_grad():
                tr = model(probe_x)
            print(
                f"step {step:3d}  loss {float(loss):.4f}  "
                f"train-mode dice {dice_at(tr, probe_y):.4f}  "
                f"eval-mode dice {dice_at(ev, probe_y):.4f}  "
                f"eval logits mean {float(ev.mean()):9.2f} "
                f"min {float(ev.min()):9.2f}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
