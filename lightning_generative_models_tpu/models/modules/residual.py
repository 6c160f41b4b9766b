"""Residual stack used by the VQ-VAE encoder/decoder.

Parity with the reference (reference: models/modules/residual.py:5-43):
each block is ReLU -> 3x3 conv (no bias) -> ReLU -> 1x1 conv (no bias) with a
skip connection; the stack applies a final ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class ResidualBlock(nn.Module):
    hidden_dim: int
    num_residual_hiddens: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.num_residual_hiddens, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_dim, (1, 1), use_bias=False)(h)
        return x + h


class ResidualStack(nn.Module):
    hidden_dim: int
    num_residual_layers: int
    num_residual_hiddens: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.num_residual_layers):
            x = ResidualBlock(self.hidden_dim, self.num_residual_hiddens)(x)
        return nn.relu(x)
