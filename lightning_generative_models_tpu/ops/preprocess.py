"""On-device input preprocessing.

The reference runs ToTensor/Normalize/Flip in CPU DataLoader workers
(reference: data/datamodule.py:41-76), shipping float32 to the device. Here
batches arrive as uint8 (4x less host->HBM traffic) and the
uint8 -> [0, 1] float conversion + random horizontal flip happen *inside* the
jitted train step, where XLA fuses them into the first conv's input pipeline.

``prepare_batch`` is the single entry point used by every model's train/eval
step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def to_float01(images: jax.Array, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """uint8 [B,H,W,C] -> float [0, 1]."""
    if images.dtype == jnp.uint8:
        return images.astype(dtype) * (1.0 / 255.0)
    return images.astype(dtype)


def random_hflip(images: jax.Array, rng: jax.Array, prob: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip (reference train transform)."""
    flip = jax.random.bernoulli(rng, prob, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def prepare_batch(
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    hflip: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Dict[str, jax.Array]:
    """uint8 host batch -> float [0, 1] model batch, with train-time flip."""
    images = to_float01(batch["image"], dtype)
    if train and hflip and rng is not None:
        images = random_hflip(images, rng)
    out = dict(batch)
    out["image"] = images
    return out
