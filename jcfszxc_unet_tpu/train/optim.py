"""Optimizer chain + LR scheduling with reference-equivalent semantics.

Reference training uses (train.py:107-122, 296-301):
  * RMSprop(lr, alpha=0.99 default, eps=1e-8, weight_decay=1e-8,
    momentum=0.999)
  * gradient clipping by global norm 1.0 applied *before* the optimizer
  * ReduceLROnPlateau(mode='max', factor=0.7, patience=5, threshold=0.01
    [relative], cooldown=2)

The optax chain applies, in order: clip_by_global_norm(1.0) ->
add_decayed_weights(wd) [torch couples wd into the gradient before the
RMSprop update] -> scale_by_rms -> trace(momentum) -> scale(-lr), which is
exactly torch's RMSprop-with-momentum update.  The LR is an injected
hyperparameter so the host-side plateau scheduler can change it between
epochs without recompiling.

AMP note: the reference uses CUDA AMP + GradScaler (train.py:123).  On TPU
we run bf16 compute with f32 params — no loss scaling is needed (bf16 has
f32's exponent range), so there is no GradScaler equivalent; NaN-guard
semantics are preserved in the train step instead (see trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 1e-8,
    momentum: float = 0.999,
    alpha: float = 0.99,
    eps: float = 1e-8,
    clip_norm: Optional[float] = 1.0,
    flatten: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop + pre-clip, as one optax chain.

    torch RMSprop update (per param):
        sq <- alpha*sq + (1-alpha)*g^2
        g' <- g / (sqrt(sq) + eps)
        buf <- momentum*buf + g'        (momentum > 0)
        p <- p - lr*buf
    with weight decay folded into g beforehand.

    ``flatten=True`` wraps the chain in ``optax.flatten`` so the whole
    update runs on ONE raveled vector (sq/mom state become two flat
    buffers instead of ~2x90 per-leaf arrays).  Mathematically identical
    (test_optim.py pins bit-exactness); the per-leaf form stays the
    default because its opt-state pytree is what existing checkpoints
    hold — flip only with a measured win (scripts/tpu_opt_flat_probe.py).
    """
    def build(learning_rate):
        parts = []
        if clip_norm is not None:
            parts.append(optax.clip_by_global_norm(clip_norm))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False))
        if momentum:
            parts.append(optax.trace(decay=momentum))
        parts.append(optax.scale_by_learning_rate(learning_rate, flip_sign=True))
        chain = optax.chain(*parts)
        return optax.flatten(chain) if flatten else chain

    # inject_hyperparams exposes `learning_rate` for host-side mutation
    # (the plateau scheduler) without recompiling the train step.
    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_current_lr(opt_state) -> float:
    """Read the injected learning rate back out of the optimizer state."""
    return float(opt_state.hyperparams["learning_rate"])


def set_current_lr(opt_state, lr: float):
    """Return opt_state with the injected learning rate replaced."""
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(old).dtype)
    return opt_state._replace(hyperparams=hyper)


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch semantics for the config
    the reference uses (train.py:114-122): mode='max', relative threshold.

    An improvement counts only if metric > best * (1 + threshold); after
    ``patience`` non-improving epochs the LR is multiplied by ``factor``,
    followed by ``cooldown`` epochs during which bad epochs are ignored.
    """

    factor: float = 0.7
    patience: int = 5
    threshold: float = 0.01
    cooldown: int = 2
    min_lr: float = 0.0

    best: float = float("-inf")
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed one epoch's metric; returns the (possibly reduced) LR.

        Mirrors torch ReduceLROnPlateau.step ordering exactly: update
        best/num_bad_epochs first, then — unconditionally, improving or
        not — consume one cooldown epoch (which also zeroes bad epochs),
        then test patience.
        """
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return lr

    def _is_better(self, metric: float) -> bool:
        if self.best == float("-inf"):
            return True
        # torch threshold_mode='rel', mode='max'
        return metric > self.best * (1.0 + self.threshold)
