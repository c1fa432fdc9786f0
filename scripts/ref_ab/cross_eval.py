#!/usr/bin/env python
"""Cross-framework evaluation: the SAME trained weights through BOTH
evaluation stacks (reference evaluate.py:164-346 vs our cli/evaluate.py),
on the SAME test h5 — isolating eval-protocol parity from training-RNG
noise (VERDICT r4 item 3).

Two directions per (model, lr) arm pair from a finished run_ab.py sweep:
  A. reference-TRAINED ``best_model.pth`` (whole torch module,
     train.py:374) -> reference evaluate.py AND our evaluate.py (our
     checkpoint loader consumes reference whole-module .pth natively,
     train/checkpoint.load_model_any);
  B. our-TRAINED ``best_model.ckpt`` -> our evaluate.py AND the
     reference's evaluate.py, via compat/torch_export (state_dict .pth)
     + a wrap step that instantiates the REFERENCE class and
     load_state_dict()s it into the whole-module format evaluate.py:421
     consumes — the same --load trick run_ab.py uses for training arms.

Parity metrics per direction:
  * mean Dice printed by each stack (the reference's only output);
  * per-image Dice recomputed IDENTICALLY from each stack's saved
    demo/prediction_{i}.png probability maps (both stacks quantize with
    the same trunc(p*255) rule — reference evaluate.py:320, our
    utils/vis.py:69 — so the comparison is like-for-like);
  * max per-pixel |Delta| between the two stacks' probability maps in
    uint8 levels (the strongest statement: the stitched maps themselves
    agree, not just their summary).

Our arms run fp32 on XLA:CPU (same silicon/precision class as the torch
arms); accuracy parity is platform-agnostic.

Usage:
  python scripts/ref_ab/cross_eval.py --workdir /tmp/ab \
      --tags UNet_1e-4,FRUNet_1e-4,AttentionUNet_1e-6
Writes <workdir>/cross_eval.json and prints one table row per direction.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = "/root/repo"
REF = "/root/reference"
SHIMS = os.path.join(REPO, "scripts", "ref_ab", "shims")

AVG_DICE_RE = re.compile(r"Average Dice Score: ([0-9.]+)")

# registry name -> reference ctor (mirrors run_ab.REF_CTOR)
REF_CTOR = {
    "UNet": "UNet.UNet()",
    "AttentionUNet": "AttentionUNet.AttentionUNet()",
    "FRUNet": "FRUNet.FRUNet()",
    "MultiResUNet": "MultiResUNet.MultiResUNet()",
    "SegNet": "SegNet.SegNet()",
    "DenseUNet": "DenseUNet.DenseUNet()",
    "MCUNet": "MCUNet.MCUNet()",
    "ResUNet": "ResUNet.ResUNet()",
}


def ref_env():
    env = dict(os.environ, PYTHONPATH=f"{SHIMS}:{REF}")
    env.pop("JAX_PLATFORMS", None)
    return env


def our_env():
    return dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")


def run(cmd, cwd, env, log_path, timeout=1800):
    os.makedirs(os.path.join(cwd, "demo"), exist_ok=True)
    with open(log_path, "w") as log:
        p = subprocess.run(cmd, cwd=cwd, env=env, stdout=log,
                           stderr=subprocess.STDOUT, timeout=timeout)
    assert p.returncode == 0, f"rc={p.returncode}: {cmd} (see {log_path})"
    with open(log_path, errors="replace") as f:
        return f.read()


def png_maps(demo_dir):
    """Load demo/prediction_{i}.png + label_{i}.png as uint8 arrays."""
    from PIL import Image

    preds, labels = [], []
    i = 0
    while os.path.isfile(os.path.join(demo_dir, f"prediction_{i}.png")):
        preds.append(np.asarray(Image.open(
            os.path.join(demo_dir, f"prediction_{i}.png"))))
        labels.append(np.asarray(Image.open(
            os.path.join(demo_dir, f"label_{i}.png"))))
        i += 1
    assert preds, f"no prediction PNGs in {demo_dir}"
    return np.stack(preds), np.stack(labels)


def dice_from_png(pred_u8, label_u8):
    """Per-image hard Dice from the uint8 maps, identical rule for both
    stacks: binarize at >127 (= p > 0.5 in the shared trunc(p*255)
    quantization)."""
    out = []
    for p, l in zip(pred_u8, label_u8):
        a = p > 127
        b = l > 127
        inter = np.logical_and(a, b).sum()
        denom = a.sum() + b.sum()
        out.append(float(2 * inter / denom) if denom else 1.0)
    return out


def eval_ref_stack(pth_path, test_h5, outdir, patch):
    """Reference evaluate.py on a whole-module .pth; returns
    (mean_dice, demo_dir)."""
    os.makedirs(outdir, exist_ok=True)
    text = run([sys.executable, os.path.join(REF, "evaluate.py"),
                "-m", pth_path, "-d", test_h5, "-o", "predictions",
                "-p", str(patch)],
               cwd=outdir, env=ref_env(),
               log_path=os.path.join(outdir, "eval.log"))
    m = AVG_DICE_RE.search(text)
    assert m, f"no Average Dice in {outdir}/eval.log"
    return float(m.group(1)), os.path.join(outdir, "demo")


def eval_our_stack(model_path, test_h5, outdir, patch):
    """Our evaluate.py (fp32, XLA:CPU) on a .ckpt or reference .pth;
    returns (mean_dice, per_image_dice, demo_dir)."""
    os.makedirs(outdir, exist_ok=True)
    mj = os.path.join(outdir, "metrics.json")
    run([sys.executable, os.path.join(REPO, "evaluate.py"),
         "-m", model_path, "-d", test_h5, "-o", "predictions",
         "-p", str(patch), "--dtype", "float32", "--metrics-json", mj],
        cwd=outdir, env=our_env(),
        log_path=os.path.join(outdir, "eval.log"))
    with open(mj) as f:
        rec = json.load(f)
    return rec["mean_dice"], rec["per_image_dice"], os.path.join(outdir,
                                                                 "demo")


def wrap_state_dict_as_module(model, sd_path, out_path):
    """Instantiate the REFERENCE class, load_state_dict our exported
    weights, torch.save the whole module (evaluate.py:421's format).
    strict=False covers reference dead params (e.g. FRUNet's unused fuse
    head, FRUNet.py:105) — every parameter the forward reads is present
    (compat/torch_export docstring).  cwd must NOT be /root/repo: for
    ``python -c`` the cwd precedes PYTHONPATH on sys.path, and the
    repo's drop-in ``UNetFamily`` shim would shadow the reference's."""
    code = (
        "import torch\n"
        "from UNetFamily import (UNet, AttentionUNet, FRUNet, MultiResUNet,"
        " SegNet, DenseUNet, MCUNet, ResUNet)\n"
        f"m = {REF_CTOR[model]}\n"
        f"missing, unexpected = m.load_state_dict("
        f"torch.load({sd_path!r}), strict=False)\n"
        "assert not unexpected, f'unexpected keys: {unexpected}'\n"
        f"torch.save(m, {out_path!r})\n"
        "print('wrapped', len(list(m.parameters())), 'param tensors;"
        " missing(dead-ref-params):', missing)\n"
    )
    subprocess.run([sys.executable, "-c", code], env=ref_env(), check=True,
                   cwd=os.path.dirname(out_path))


def compare(tag, direction, mean_a, mean_b, demo_a, demo_b):
    """a = reference stack, b = our stack."""
    pred_a, lab_a = png_maps(demo_a)
    pred_b, lab_b = png_maps(demo_b)
    assert pred_a.shape == pred_b.shape
    np.testing.assert_array_equal(lab_a, lab_b)  # same h5, same labels
    d_a = dice_from_png(pred_a, lab_a)
    d_b = dice_from_png(pred_b, lab_b)
    per_img_delta = [abs(x - y) for x, y in zip(d_a, d_b)]
    row = {
        "tag": tag, "direction": direction,
        "ref_stack_mean_dice": mean_a, "our_stack_mean_dice": mean_b,
        "per_image_dice_ref_stack": d_a, "per_image_dice_our_stack": d_b,
        "per_image_abs_delta": per_img_delta,
        "max_abs_delta_dice": max(per_img_delta),
        "max_abs_delta_prob_u8": int(np.max(np.abs(
            pred_a.astype(np.int16) - pred_b.astype(np.int16)))),
    }
    print(f"{tag:24s} {direction:14s} ref-stack {mean_a:.4f} "
          f"our-stack {mean_b:.4f} max|dDice| {row['max_abs_delta_dice']:.5f} "
          f"max|dprob| {row['max_abs_delta_prob_u8']}/255", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ab")
    ap.add_argument("--tags", default="UNet_1e-4",
                    help="comma list of <Model>_<lr> arm-pair tags from a "
                         "finished run_ab.py sweep in --workdir")
    ap.add_argument("--patch", type=int, default=32)
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    test_h5 = os.path.join(wd, "prep", "data", "test_eye_dataset.h5")
    assert os.path.isfile(test_h5), f"run run_ab.py first ({test_h5})"
    xdir = os.path.join(wd, "cross")
    results = []

    for tag in args.tags.split(","):
        model = tag.split("_")[0]
        ref_pth = os.path.join(wd, "runs", f"{tag}_ref", "best_model.pth")
        our_ckpt = os.path.join(wd, "runs", f"{tag}_tpu", "best_model.ckpt")

        # -- direction A: reference-trained weights through both stacks
        if os.path.isfile(ref_pth):
            base = os.path.join(xdir, tag, "reftrained")
            m_ref, demo_ref = eval_ref_stack(ref_pth, test_h5,
                                             os.path.join(base, "refstack"),
                                             args.patch)
            m_our, _, demo_our = eval_our_stack(ref_pth, test_h5,
                                                os.path.join(base,
                                                             "ourstack"),
                                                args.patch)
            results.append(compare(tag, "ref-trained", m_ref, m_our,
                                   demo_ref, demo_our))
        else:
            print(f"{tag}: no {ref_pth}, skipping direction A")

        # -- direction B: our-trained weights through both stacks
        if os.path.isfile(our_ckpt):
            base = os.path.join(xdir, tag, "ourtrained")
            os.makedirs(base, exist_ok=True)
            sd_pth = os.path.join(base, "exported_sd.pth")
            subprocess.run([sys.executable, "-m",
                            "jcfszxc_unet_tpu.compat.torch_export",
                            "--ckpt", our_ckpt, "--out", sd_pth],
                           env=our_env(), check=True, cwd=REPO)
            mod_pth = os.path.join(base, "exported_module.pth")
            wrap_state_dict_as_module(model, sd_pth, mod_pth)
            m_ref, demo_ref = eval_ref_stack(mod_pth, test_h5,
                                             os.path.join(base, "refstack"),
                                             args.patch)
            m_our, _, demo_our = eval_our_stack(our_ckpt, test_h5,
                                                os.path.join(base,
                                                             "ourstack"),
                                                args.patch)
            results.append(compare(tag, "our-trained", m_ref, m_our,
                                   demo_ref, demo_our))
        else:
            print(f"{tag}: no {our_ckpt}, skipping direction B")

    out = os.path.join(wd, "cross_eval.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
