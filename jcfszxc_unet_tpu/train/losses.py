"""On-device loss and metric numerics.

Faithful JAX re-expressions of the reference formulas:
  * dice_coeff / multiclass_dice_coeff / dice_loss —
    reference: utils/dice_score.py:13-59 (incl. the [0,1] input clamp, the
    epsilon hard-override to 1e-5, and the empty-mask guard sets_sum<-inter)
  * BCE-with-logits — reference train.py:124 (nn.BCEWithLogitsLoss)
  * soft-target cross-entropy — reference train.py:124's
    ``nn.CrossEntropyLoss`` branch taken when ``model.n_classes > 1``
    (DenseUNet's n_classes=128 defect trips it; with a single logit channel
    log_softmax == 0 so the loss is identically 0 — preserved here)
  * combined ½·BCE + ½·Dice — reference train.py:267-278
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_coeff(
    inputs: jnp.ndarray,
    target: jnp.ndarray,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Soft Dice coefficient, mean-reduced.

    Mirrors reference utils/dice_score.py:13-38: clamps inputs to [0,1];
    reduces over (-1,-2) per-sample (or (-1,-2,-3) when ``reduce_batch_first``
    and ndim >= 3); epsilon is hard-overridden to 1e-5 as in the reference
    (line 32); empty-mask guard replaces sets_sum with inter.
    """
    assert inputs.shape == target.shape, (inputs.shape, target.shape)
    assert inputs.ndim == 3 or not reduce_batch_first

    inputs = jnp.clip(inputs, 0.0, 1.0)
    sum_dim = (-1, -2) if inputs.ndim == 2 or not reduce_batch_first else (-1, -2, -3)

    inter = 2 * jnp.sum(inputs * target, axis=sum_dim)
    sets_sum = jnp.sum(inputs, axis=sum_dim) + jnp.sum(target, axis=sum_dim)

    epsilon = 1e-5  # reference overrides the argument (dice_score.py:32)
    sets_sum = jnp.where(sets_sum < epsilon, inter, sets_sum)

    dice = (inter + epsilon) / (sets_sum + epsilon)
    return jnp.mean(dice)


def multiclass_dice_coeff(
    inputs: jnp.ndarray,
    target: jnp.ndarray,
    reduce_batch_first: bool = False,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Flatten (B, C, ...) -> (B*C, ...) then dice (ref dice_score.py:41-50)."""
    return dice_coeff(
        inputs.reshape((-1,) + inputs.shape[2:]),
        target.reshape((-1,) + target.shape[2:]),
        reduce_batch_first,
        epsilon,
    )


def dice_loss(
    inputs: jnp.ndarray, target: jnp.ndarray, multiclass: bool = False
) -> jnp.ndarray:
    """1 - dice of clamped probabilities (ref dice_score.py:53-59)."""
    inputs = jnp.clip(inputs, 1e-7, 1.0 - 1e-7)
    fn = multiclass_dice_coeff if multiclass else dice_coeff
    return 1.0 - fn(inputs, target, reduce_batch_first=True)


def _at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Promote low-precision (bf16) inputs to f32 for loss math while
    preserving f64 — the x64 trajectory-parity tests need the loss computed
    at full input precision to make "the training math is identical" a
    falsifiable statement (a hard f32 cast floors the comparison at ~1e-7)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean binary cross-entropy on logits
    (torch nn.BCEWithLogitsLoss equivalent, ref train.py:124, 267)."""
    logits = _at_least_f32(logits)
    target = target.astype(logits.dtype)
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(loss)


def soft_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss with probability targets of the same shape,
    channel axis -1 (NHWC).  Mean over batch and spatial positions."""
    logits = _at_least_f32(logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_pos = -jnp.sum(target.astype(logits.dtype) * logp, axis=-1)
    return jnp.mean(per_pos)


def combined_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    n_classes: int = 1,
    alpha: float = 0.5,
):
    """The reference's training objective (train.py:255-278) on NHWC tensors.

    Applies sigmoid on top of the raw model output unconditionally — exactly
    as train.py:264 does even for models whose forward already ends in
    sigmoid/softmax (the double-squash is part of the behavioral contract).

    Returns (loss, bce, dice).
    """
    logits = _at_least_f32(logits)
    target = target.astype(logits.dtype)
    probs = jax.nn.sigmoid(logits)
    if n_classes > 1:
        bce = soft_cross_entropy(logits, target)
    else:
        bce = bce_with_logits(logits, target)
    # train.py:270-274 squeezes the channel dim before dice.
    d = dice_loss(jnp.squeeze(probs, axis=-1), jnp.squeeze(target, axis=-1))
    loss = alpha * bce + (1.0 - alpha) * d
    return loss, bce, d
