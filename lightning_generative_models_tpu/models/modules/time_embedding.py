"""Timestep embeddings for diffusion models.

Parity with the reference (reference:
models/generative/diffusion/ddpm.py:119-151): standard sinusoidal embedding
with configurable theta, and the random/learned Fourier variant
(crowsonkb-style) that appends the raw timestep.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class SinusoidalPosEmb(nn.Module):
    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        emb = math.log(self.theta) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim) * -emb)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Random (frozen) or learned Fourier features; output dim = dim + 1."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param(
            "weights", nn.initializers.normal(1.0), (half_dim,)
        )
        if self.is_random:
            weights = jax.lax.stop_gradient(weights)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
