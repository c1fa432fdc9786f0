"""Seeding — the reference seeds python/numpy/torch/cuda and flips cuDNN to
deterministic (utils/utils.py:18-43).  JAX is deterministic by construction;
the equivalents here are a process-wide numpy/python seed (host-side
shuffles like the train/val split, train.py:79) plus an explicit PRNG key
for everything on device.
"""

from __future__ import annotations

import logging
import os
import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root device PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    logging.info(f"Random seed set to {seed}")
    return jax.random.PRNGKey(seed)


# The reference defines a duplicate (utils/utils.py:35-43); keep the alias.
set_deterministic_mode = set_seed
