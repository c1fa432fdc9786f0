"""Training engine — the TPU-native re-expression of the reference's
``train_model`` (train.py:47-416).

Differences in *mechanism* (same behavior):
  * The reference's per-step host loop (numpy patch slicing + H2D copy,
    train.py:201-253) becomes an on-device ``lax.scan`` over the whole
    epoch: sampling, patch gather, forward/backward and the optimizer
    update all run inside ONE jitted program per epoch.
  * CUDA AMP + GradScaler (train.py:123) becomes bf16 compute with f32
    params — no loss scaling needed on TPU.
  * The NaN guards that `continue` past bad steps (train.py:259-294) become
    a branchless ``jnp.where`` that keeps the previous params/opt-state
    when the loss is non-finite (batch-stats still update, matching torch
    where BN stats mutate during the forward that preceded the skip).
  * Validation (train.py:313-353) runs the full val patch set in fixed-size
    chunks under one jit (the reference does one giant forward) — the
    metric is identical because eval-mode BN is per-sample deterministic.

Data-parallel scaling: pass a ``jax.sharding.Mesh``; the batch is
constrained to the ``data`` axis and XLA inserts the gradient all-reduce
over ICI (SURVEY.md §2.5).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from jcfszxc_unet_tpu.data.sampler import (
    augment_batch,
    extract_patches,
    sample_batch,
)
from jcfszxc_unet_tpu.train.losses import combined_loss, dice_coeff
from jcfszxc_unet_tpu.train.state import TrainState


def _shard_batch(x, mesh):
    if mesh is None:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_batch_step_fn(
    model,
    tx: optax.GradientTransformation,
    *,
    n_classes: int,
    compute_dtype=jnp.float32,
    mesh=None,
    remat: bool = False,
) -> Callable:
    """Build the core per-batch update: (state, imgs, labs, k_drop) ->
    (new_state, loss, ok).

    This is the exact math of the reference hot loop (train.py:255-301):
    train-mode forward -> loss = 1/2 BCE(logits) + 1/2 dice(sigmoid) ->
    clip_by_global_norm(1.0) -> RMSprop update (clip+RMSprop live inside
    ``tx``, train/optim.py), with the NaN step-skip guard expressed
    branchlessly.  Exposed separately from the epoch scan so tests can
    drive it on explicit batches (torch trajectory parity).
    """

    def train_step(state: TrainState, imgs, labs, k_drop):
        imgs = _shard_batch(imgs.astype(compute_dtype), mesh)
        labs = _shard_batch(labs, mesh)

        def forward(params, batch_stats, imgs, k_drop):
            variables = {"params": params, "batch_stats": batch_stats}
            return model.apply(
                variables, imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )

        if remat:
            # Rematerialize activations in the backward pass: trades FLOPs
            # for HBM, enabling larger batches/patches (jax.checkpoint).
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            out, mut = forward(params, state.batch_stats, imgs, k_drop)
            loss, bce, d = combined_loss(out, labs, n_classes)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard (reference train.py:259-294): skip the parameter update
        # but keep the BN-stat update the forward already produced.
        ok = jnp.isfinite(loss)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        new_state = TrainState(
            params=keep(new_params, state.params),
            batch_stats=new_bs,
            opt_state=keep(new_opt, state.opt_state),
            step=state.step + 1,
        )
        return new_state, jnp.where(ok, loss, 0.0), ok

    return train_step


def make_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    *,
    n_classes: int,
    batch_size: int,
    patch_size: int,
    steps: int,
    compute_dtype=jnp.float32,
    mesh=None,
    remat: bool = False,
    augment: bool = False,
) -> Callable:
    """Build the jitted epoch function: (state, images, labels, sample_map,
    key) -> (state, {"epoch_loss": sum-of-kept-losses, "skipped": count}).

    epoch_loss follows reference semantics: skipped (NaN) steps contribute
    nothing but the divisor stays ``steps`` (train.py:303, 392).

    ``augment=True`` adds per-sample random dihedral-8 flips/rotations to
    every sampled patch (additive; off = reference parity protocol).
    """
    batch_step = make_batch_step_fn(
        model, tx, n_classes=n_classes, compute_dtype=compute_dtype,
        mesh=mesh, remat=remat,
    )

    def train_step(state: TrainState, key, images, labels, sample_map):
        if augment:
            k_sample, k_aug, k_drop = jax.random.split(key, 3)
        else:
            # 2-way split preserved so augment=False reproduces the exact
            # historical RNG stream (trajectory reproducibility).
            k_sample, k_drop = jax.random.split(key)
        imgs, labs = sample_batch(
            k_sample, images, labels, sample_map, batch_size, patch_size
        )
        if augment:
            imgs, labs = augment_batch(k_aug, imgs, labs)
        return batch_step(state, imgs, labs, k_drop)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, images, labels, sample_map, key):
        keys = jax.random.split(key, steps)

        def body(carry, k):
            state, total, skipped = carry
            state, loss, ok = train_step(state, k, images, labels, sample_map)
            return (state, total + loss, skipped + (1 - ok.astype(jnp.int32))), None

        (state, total, skipped), _ = jax.lax.scan(
            body, (state, jnp.zeros(()), jnp.zeros((), jnp.int32)), keys
        )
        return state, {"epoch_loss": total, "skipped": skipped}

    return epoch_fn


def make_precise_bn_fn(
    model,
    *,
    batch_size: int,
    patch_size: int,
    k_batches: int,
    compute_dtype=jnp.float32,
    mesh=None,
    momentum: float = 0.1,
) -> Callable:
    """Build a jitted BN-recalibration pass ("precise BN"): re-estimate the
    BN running statistics as the arithmetic mean of PURE per-batch
    statistics over ``k_batches`` freshly sampled training batches.

    Why: at production learning rates the EMA running stats (torch
    momentum 0.1) lag the activation drift badly enough in some zoo
    models that eval-mode logits saturate while train-mode learns —
    measured on SegNet and MultiResUNet, and reproduced with the
    reference's own torch modules (experiments_record.md round 3,
    scripts/torch_bn_lag.py).  This is the standard fix; it is an
    ADDITIVE capability (CLI ``--precise-bn K``), off by default so the
    reference's exact EMA semantics stay the parity behavior.

    Mechanism: every train-mode forward applies
    ``running <- (1-m)*base + m*batch`` per BN (torch convention; m=0.1
    for every BN in the zoo).  Running all K forwards from the SAME base
    tree and averaging the K updated trees S_i gives
    ``mean_i S_i = (1-m)*base + m*mean_i B_i``, so the mean of the pure
    batch statistics is recovered exactly:
    ``(mean_i S_i - (1-m)*base) / m``.

    Returns fn(params, batch_stats, images, labels, sample_map, key)
    -> new batch_stats.
    """

    @jax.jit
    def precise_bn_fn(params, batch_stats, images, labels, sample_map, key):
        if not jax.tree_util.tree_leaves(batch_stats):
            return batch_stats  # no BN layers — nothing to recalibrate

        def body(acc, k):
            k_sample, k_drop = jax.random.split(k)
            imgs, _ = sample_batch(
                k_sample, images, labels, sample_map, batch_size, patch_size
            )
            imgs = _shard_batch(imgs.astype(compute_dtype), mesh)
            _, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            return jax.tree.map(jnp.add, acc, mut["batch_stats"]), None

        zeros = jax.tree.map(jnp.zeros_like, batch_stats)
        acc, _ = jax.lax.scan(
            body, zeros, jax.random.split(key, k_batches)
        )
        m = momentum
        return jax.tree.map(
            lambda a, base: (a / k_batches - (1.0 - m) * base) / m,
            acc, batch_stats,
        )

    return precise_bn_fn


def make_val_fn(
    model,
    *,
    patch_size: int,
    chunk_size: int = 64,
    compute_dtype=jnp.float32,
    mesh=None,
) -> Callable:
    """Build the jitted validation function:
    (params, batch_stats, val_imgs (V,P,P,C), val_labs (V,P,P,1)) ->
    (metrics dict, sigmoid probabilities (V,P,P,1)).

    Metrics mirror train.py:348-367 exactly, including the fg/bg naming
    quirk: ``dice`` == ``dice_bg`` is the >0.5-binarized dice vs labels;
    ``dice_fg`` binarizes at <=0.5 against (1 - labels); ``dice_avg`` is
    their mean.
    """

    def forward_chunk(variables, chunk):
        out = model.apply(variables, chunk.astype(compute_dtype), train=False)
        return jax.nn.sigmoid(out.astype(jnp.float32))

    @jax.jit
    def val_fn(params, batch_stats, val_imgs, val_labs):
        variables = {"params": params, "batch_stats": batch_stats}
        total = val_imgs.shape[0]
        if total == 0:
            # Empty validation split (val_percent rounds to zero images):
            # report zero dice rather than crashing (the reference would
            # crash on np.stack of an empty patch list, train.py:334).
            zero = jnp.zeros(())
            return (
                {"dice": zero, "dice_bg": zero, "dice_fg": zero,
                 "dice_avg": zero},
                jnp.zeros_like(val_labs, jnp.float32),
            )
        bs = min(chunk_size, total)
        n_chunks = -(-total // bs)
        pad = n_chunks * bs - total
        imgs = val_imgs
        if pad:
            imgs = jnp.concatenate([imgs, imgs[:pad]], axis=0)
        chunks = imgs.reshape(n_chunks, bs, *imgs.shape[1:])
        probs = jax.lax.map(
            lambda c: forward_chunk(variables, _shard_batch(c, mesh)), chunks
        )
        probs = probs.reshape(n_chunks * bs, *probs.shape[2:])[:total]

        labs = val_labs.astype(jnp.float32)
        # (V,P,P,1) -> (V,P,P): same reduction as the reference's NCHW
        # (V,1,P,P) per-(sample,channel) dice with C=1.
        p = jnp.squeeze(probs, -1)
        t = jnp.squeeze(labs, -1)
        binary = (p > 0.5).astype(jnp.float32)
        dice = dice_coeff(binary, t, reduce_batch_first=False)
        binary_fg = (p <= 0.5).astype(jnp.float32)
        dice_fg = dice_coeff(binary_fg, 1.0 - t, reduce_batch_first=False)
        metrics = {
            "dice": dice,
            "dice_bg": dice,
            "dice_fg": dice_fg,
            "dice_avg": (dice + dice_fg) / 2.0,
        }
        return metrics, probs

    return val_fn


def build_val_patches(images: np.ndarray, labels: np.ndarray,
                      sample_map_val: np.ndarray, patch_size: int):
    """Materialize the full validation patch set once (device-resident) —
    the counterpart of the reference's per-epoch host loop
    (train.py:317-331), done a single time instead of every epoch."""
    centers = jnp.asarray(sample_map_val)
    imgs = extract_patches(jnp.asarray(images), centers, patch_size)
    labs = extract_patches(jnp.asarray(labels), centers, patch_size)
    return imgs, labs
