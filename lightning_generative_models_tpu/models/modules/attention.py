"""Attention blocks for the diffusion UNet (NHWC).

Parity with the reference (reference:
models/generative/diffusion/ddpm.py:107-113, 203-271 and
models/modules/attend.py): pixel-space RMSNorm; softmax-kernel linear
attention with learned memory KV at outer resolutions; full attention with
memory KV at the innermost resolution. The reference's ``Attend`` flash/math
switch becomes a dispatch to the Pallas TPU kernel in ops/attention.py for
long sequences, with a plain fused-XLA softmax attention otherwise (at the
reference's resolutions the sequence is <= 64 tokens, far below flash
break-even).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.ops.attention import scaled_dot_product_attention


class RMSNorm(nn.Module):
    """Channel RMSNorm over the last (feature) axis (ddpm.py:107-113)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        normed = x * jax.lax.rsqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-12)
        return normed * g * (self.dim**0.5)


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (ddpm.py:203-239), O(n*d^2)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        x = RMSNorm(self.dim)(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))  # [b,H,d,n]

        mem = self.param(
            "mem_kv",
            nn.initializers.normal(1.0),
            (2, self.heads, self.dim_head, self.num_mem_kv),
        )
        mk, mv = (
            jnp.broadcast_to(mem[i], (b, *mem[i].shape)) for i in range(2)
        )
        k = jnp.concatenate([mk, k], axis=-1)
        v = jnp.concatenate([mv, v], axis=-1)

        q = jax.nn.softmax(q, axis=-2) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=-1)

        # context[d,e] = sum_n k[d,n] v[e,n]  -> two small MXU matmuls per head
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
        out = nn.Conv(self.dim, (1, 1))(out)
        return RMSNorm(self.dim)(out)


class Attention(nn.Module):
    """Full softmax attention over flattened pixels (ddpm.py:242-271)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head

        x = RMSNorm(self.dim)(x)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [b,H,n,d]

        mem = self.param(
            "mem_kv",
            nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head),
        )
        mk, mv = (
            jnp.broadcast_to(mem[i], (b, *mem[i].shape)) for i in range(2)
        )
        k = jnp.concatenate([mk, k], axis=-2)
        v = jnp.concatenate([mv, v], axis=-2)

        out = scaled_dot_product_attention(q, k, v, use_pallas=self.flash)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        return nn.Conv(self.dim, (1, 1))(out)
