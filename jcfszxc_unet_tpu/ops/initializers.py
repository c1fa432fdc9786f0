"""Parameter initializers matching PyTorch layer defaults.

The reference models (reference: UNetFamily/*.py) rely on PyTorch's default
``nn.Conv2d`` / ``nn.Linear`` initialization (kaiming_uniform with a=sqrt(5),
which reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight and
bias).  Matching the init distribution keeps training dynamics comparable so
the Dice-parity targets in BASELINE.md are apples-to-apples.

Note: the reference's ``InitWeights_He`` (unet_parts.py:594-614) is applied as
``self.apply(InitWeights_He)`` (FRUNet.py:106) — passing the *class*, not an
instance — so it constructs a throwaway object per module and never actually
initializes anything.  FRUNet therefore also uses PyTorch defaults; we do not
reproduce the dead code path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Conv2d default weight init for a Flax HWIO kernel.

    Flax kernel shape: (kh, kw, in_ch/groups, out_ch); torch fan_in =
    (in_ch/groups) * kh * kw.
    """
    fan_in = shape[0] * shape[1] * shape[2]
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def conv_bias_init_for(fan_in: int):
    """PyTorch conv/linear bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return _uniform(key, shape, dtype, bound)

    return init


def conv_transpose_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.ConvTranspose2d default weight init (HWIO Flax kernel).

    Torch stores transposed-conv weight as (in, out, kh, kw) and its
    fan-in computation reads dim 1 — i.e. fan_in = out_ch * kh * kw.
    """
    fan_in = shape[0] * shape[1] * shape[3]
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def linear_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default weight init; Flax kernel shape (in, out)."""
    fan_in = shape[0]
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform — torch nn.MultiheadAttention in-proj init."""
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    else:
        receptive = math.prod(shape[:-2])
        fan_in, fan_out = shape[-2] * receptive, shape[-1] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, shape, dtype, bound)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
