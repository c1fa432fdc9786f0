"""On-device evaluation metrics: per-image Dice (reference parity) and
ROC-AUC (additive capability per BASELINE.md north star — the reference
reports Dice only, evaluate.py:336-346).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.train.losses import dice_coeff  # noqa: F401  (re-export)


def binary_dice(pred_binary: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image hard Dice as the reference computes it at eval time
    (evaluate.py:336-344): dice_coeff on a single (H, W) map."""
    return dice_coeff(pred_binary, target, reduce_batch_first=False)


def roc_auc(
    scores: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    n_bins: int = 8192,
) -> jnp.ndarray:
    """Histogram-based ROC-AUC of probability ``scores`` in [0,1] against
    binary ``targets``, restricted to ``mask`` (FOV) pixels.

    Fully vectorized/jit-able (no data-dependent shapes): bins scores into
    ``n_bins`` buckets, accumulates positive/negative histograms with
    segment sums, and integrates the ROC curve by trapezoid.  Resolution
    error is O(1/n_bins) — negligible at 8192 bins for 0.33 Mpx images.
    """
    scores = jnp.clip(scores.astype(jnp.float32).ravel(), 0.0, 1.0)
    targets = (targets.astype(jnp.float32).ravel() > 0.5).astype(jnp.float32)
    if mask is None:
        weights = jnp.ones_like(scores)
    else:
        weights = (mask.astype(jnp.float32).ravel() > 0).astype(jnp.float32)
    bins = jnp.clip((scores * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1)
    pos_hist = jax.ops.segment_sum(weights * targets, bins, num_segments=n_bins)
    neg_hist = jax.ops.segment_sum(weights * (1 - targets), bins, num_segments=n_bins)
    # Sweep threshold from high to low: cumulative TP/FP from the top bin.
    tp = jnp.cumsum(pos_hist[::-1])
    fp = jnp.cumsum(neg_hist[::-1])
    n_pos = tp[-1]
    n_neg = fp[-1]
    tpr = tp / jnp.maximum(n_pos, 1.0)
    fpr = fp / jnp.maximum(n_neg, 1.0)
    tpr = jnp.concatenate([jnp.zeros((1,)), tpr])
    fpr = jnp.concatenate([jnp.zeros((1,)), fpr])
    auc = jnp.sum((fpr[1:] - fpr[:-1]) * (tpr[1:] + tpr[:-1]) / 2.0)
    # Degenerate cases (no positives or no negatives) -> 0.5 like sklearn nan-guard
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)


def confusion_counts(pred_binary, target, mask=None):
    """TP/FP/FN/TN counts (basis for accuracy/sensitivity/specificity)."""
    p = pred_binary.astype(jnp.float32)
    t = (target > 0.5).astype(jnp.float32)
    w = jnp.ones_like(p) if mask is None else (mask > 0).astype(jnp.float32)
    tp = jnp.sum(w * p * t)
    fp = jnp.sum(w * p * (1 - t))
    fn = jnp.sum(w * (1 - p) * t)
    tn = jnp.sum(w * (1 - p) * (1 - t))
    return tp, fp, fn, tn


def classification_metrics(pred_binary, target, mask=None):
    """Accuracy / sensitivity (recall) / specificity over ``mask`` (FOV)
    pixels — the standard DRIVE-literature companion metrics to Dice/AUC
    (additive: the reference reports Dice only, evaluate.py:336-346).

    Degenerate denominators (no FOV pixels, no positives, no negatives)
    yield 0.0 for the affected metric rather than NaN.
    """
    tp, fp, fn, tn = confusion_counts(pred_binary, target, mask)

    def _safe(num, den):
        return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)

    accuracy = _safe(tp + tn, tp + fp + fn + tn)
    sensitivity = _safe(tp, tp + fn)
    specificity = _safe(tn, tn + fp)
    return accuracy, sensitivity, specificity
