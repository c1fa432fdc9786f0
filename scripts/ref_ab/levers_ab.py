#!/usr/bin/env python
"""Quantify the additive capability levers — ``--augment``,
``--precise-bn``, ``--tta`` — on the SAME A/B protocol the parity matrix
uses (VERDICT r4 item 8): one table of held-out Dice/AUC deltas over the
parity baseline, so the additive features carry measured evidence, not
just flags.

Design: reuses a finished run_ab.py workdir (same h5 pair, same flags:
batch 8, patch 32, 25 steps/epoch, val 25%, esp 8, seed 42).  Training
levers (--augment, --precise-bn K) get their own arm, epoch-capped to
the baseline arm's window so best-checkpoint selection is comparable;
--tta is an eval-time lever applied to the BASELINE checkpoint.  The
--augment arm additionally records the threshold sweep (augmented
training mis-calibrates the output head; the sweep quantifies how much
of any Dice drop is calibration vs ordering — see cli/evaluate.py
--threshold-sweep).

Accuracy parity is hardware-agnostic; arms run on the ambient platform
(the real TPU chip) like the matrix's tpu arms.

Usage:
  python scripts/ref_ab/levers_ab.py --workdir /tmp/ab \
      --model UNet.UNet --lr 1e-6
Writes <workdir>/levers_results.json and prints one row per arm.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = "/root/repo"

EPOCH_RE = re.compile(r"Epoch (\d+) ")


def sh(cmd, cwd, env, log_path, timeout=7200):
    t0 = time.time()
    with open(log_path, "w") as log:
        p = subprocess.run(cmd, cwd=cwd, env=env, stdout=log,
                           stderr=subprocess.STDOUT, timeout=timeout)
    return p.returncode, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ab")
    ap.add_argument("--model", default="UNet.UNet")
    ap.add_argument("--lr", default="1e-6")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--esp", type=int, default=8)
    ap.add_argument("--val", type=float, default=25.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--precise-bn-k", type=int, default=8)
    ap.add_argument("--max-epochs", type=int, default=0,
                    help="epoch cap for every arm (0 = read the baseline "
                         "tpu arm's epoch count from ab_results.json)")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    train_h5 = os.path.join(wd, "prep", "data", "train_eye_dataset.h5")
    test_h5 = os.path.join(wd, "prep", "data", "test_eye_dataset.h5")
    assert os.path.isfile(train_h5), f"run run_ab.py first ({train_h5})"

    mshort = args.model.split(".")[-1]
    base_tag = f"{mshort}_{args.lr}_tpu"
    base_dir = os.path.join(wd, "runs", base_tag)
    base_ckpt = os.path.join(base_dir, "best_model.ckpt")

    cap = args.max_epochs
    if not cap:
        with open(os.path.join(wd, "ab_results.json")) as f:
            rows = json.load(f)
        row = next(r for r in rows if r["tag"] == base_tag)
        cap = row["n_epochs"]
    print(f"epoch window: {cap} (baseline arm {base_tag})")

    env = dict(os.environ)
    amb = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = f"{REPO}:{amb}" if amb else REPO

    def train_arm(tag, extra_flags):
        rundir = os.path.join(wd, "levers", tag)
        ckpt = os.path.join(rundir, "best_model.ckpt")
        if os.path.isfile(ckpt):
            print(f"[{tag}] reusing finished training", flush=True)
            return rundir, ckpt
        os.makedirs(os.path.join(rundir, "visualizations"), exist_ok=True)
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "-d", train_h5, "-b", str(args.batch), "-l", args.lr,
               "-p", str(args.patch), "-s", str(args.steps),
               "-v", str(args.val), "--seed", str(args.seed),
               "-esp", str(args.esp), "--model", args.model,
               "--dtype", "float32", "--max-epochs", str(cap)] + extra_flags
        print(f"[{tag}] training ...", flush=True)
        rc, dt = sh(cmd, rundir, env, os.path.join(rundir, "train.log"))
        assert rc == 0, f"{tag} train rc={rc}"
        print(f"[{tag}] trained ({dt:.0f}s)", flush=True)
        return rundir, ckpt

    def eval_arm(tag, ckpt, extra_flags):
        rundir = os.path.join(wd, "levers", tag)
        os.makedirs(os.path.join(rundir, "demo"), exist_ok=True)
        mj = os.path.join(rundir, f"metrics_{tag}.json")
        cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
               "-m", ckpt, "-d", test_h5, "-o", "predictions",
               "-p", str(args.patch), "--dtype", "float32",
               "--metrics-json", mj] + extra_flags
        rc, dt = sh(cmd, rundir, env, os.path.join(rundir, f"eval_{tag}.log"),
                    timeout=3600)
        assert rc == 0, f"{tag} eval rc={rc}"
        with open(mj) as f:
            return json.load(f)

    results = {}

    # baseline: the matrix's own tpu arm, re-evaluated here for identical
    # metric extraction (incl. AUC + sweep fields)
    assert os.path.isfile(base_ckpt), f"baseline arm missing: {base_ckpt}"
    results["baseline"] = eval_arm("baseline", base_ckpt,
                                   ["--threshold-sweep"])

    # eval-time lever on the SAME weights
    results["baseline+tta"] = eval_arm("tta", base_ckpt, ["--tta"])

    # training levers, same epoch window
    aug_dir, aug_ckpt = train_arm("augment", ["--augment"])
    results["augment"] = eval_arm("augment", aug_ckpt, ["--threshold-sweep"])

    pbn_dir, pbn_ckpt = train_arm(
        "precise_bn", ["--precise-bn", str(args.precise_bn_k)])
    results["precise_bn"] = eval_arm("precise_bn", pbn_ckpt, [])

    base_d = results["baseline"]["mean_dice"]
    base_a = results["baseline"].get("mean_auc")
    print(f"\n{'arm':16s} {'dice':>7s} {'d_dice':>8s} {'auc':>7s} "
          f"{'d_auc':>8s}  best-sweep-cut")
    table = {}
    for arm, rec in results.items():
        d, a = rec["mean_dice"], rec.get("mean_auc")
        sweep = rec.get("threshold_sweep") or {}
        cut = (f"{sweep.get('best_threshold')}:"
               f"{sweep.get('best_dice'):.4f}" if sweep else "-")
        print(f"{arm:16s} {d:7.4f} {d - base_d:+8.4f} "
              f"{a if a is not None else float('nan'):7.4f} "
              f"{(a - base_a) if (a is not None and base_a) else 0:+8.4f}"
              f"  {cut}")
        table[arm] = {"mean_dice": d, "delta_dice": round(d - base_d, 4),
                      "mean_auc": a,
                      "delta_auc": (round(a - base_a, 4)
                                    if a is not None and base_a else None),
                      "sweep_best": sweep or None}

    out = os.path.join(wd, "levers_results.json")
    with open(out, "w") as f:
        json.dump({"model": args.model, "lr": args.lr, "epoch_window": cap,
                   "arms": table}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
