"""Seeding utilities.

The reference seeds torch/numpy/python globally (utils/seed.py:6-40). In JAX
randomness is explicit: one root PRNG key is created here and threaded through
every step, which gives bit-exact reproducibility by construction
(reference analog: deterministic=True, train.py:133). Numpy is still seeded
for host-side shuffling and synthetic data.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int = 10) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
