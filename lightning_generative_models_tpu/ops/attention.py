"""Scaled dot-product attention: fused XLA path + Pallas TPU flash kernel.

Replaces the reference's ``Attend`` wrapper (reference:
models/modules/attend.py:42-126), which switched between torch SDPA flash
kernels and einsum math attention. Here:

- ``_xla_attention``: the plain softmax attention, which XLA already fuses
  well for the reference's sequence lengths (the innermost UNet feature map is
  <= 64 tokens — flash tiling buys nothing there);
- ``_flash_attention``: a Pallas TPU kernel with online-softmax streaming over
  KV blocks (O(n) memory), used for long sequences (large-image UNets, future
  ring-attention extension point).

Dispatch is shape-driven: Pallas when requested AND the sequence is long
enough to tile (>= 2 * KV block) AND we are on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # flip for kernel debugging


from lightning_generative_models_tpu.ops.common import on_tpu as _on_tpu


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_seq: int, kv_valid: int,
                  block_k: int, scale: float):
    """One (batch*head, q-block) program: stream KV blocks w/ online softmax.

    ``kv_valid`` masks padded key columns (score -> -inf) so sequence lengths
    that are not block multiples stay exact.
    """
    from jax.experimental import pallas as pl  # noqa: PLC0415

    q = (q_ref[0].astype(jnp.float32) * scale)  # [block_q, d]
    block_q, d = q.shape

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    o0 = jnp.zeros((block_q, d), jnp.float32)
    needs_mask = kv_valid < kv_seq

    def body(i, carry):
        m_prev, l_prev, o_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if needs_mask:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < kv_valid, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o_prev * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, o_new

    _, l, o = jax.lax.fori_loop(0, kv_seq // block_k, body, (m0, l0, o0))
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_impl(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: int = 256, block_k: int = 512,
) -> jax.Array:
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    scale = d**-0.5
    block_q = min(block_q, max(128, 1 << (n_q - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (n_kv - 1).bit_length()))

    pad_q = (-n_q) % block_q
    pad_kv = (-n_kv) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_kv:  # padded key columns are masked inside the kernel
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))

    bh = b * h
    qr = q.reshape(bh, q.shape[2], d)
    kr = k.reshape(bh, k.shape[2], d)
    vr = v.reshape(bh, v.shape[2], d)

    grid = (bh, qr.shape[1] // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, kv_seq=kr.shape[1], kv_valid=n_kv,
            block_k=block_k, scale=scale,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kr.shape[1], d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, vr.shape[1], d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(qr.shape, q.dtype),
        interpret=_INTERPRET,
    )(qr, kr, vr)

    out = out.reshape(b, h, -1, d)
    return out[:, :, :n_q, :]


@jax.custom_vjp
def _flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pallas flash forward with a defined reverse-mode derivative.

    ``pallas_call`` does not support reverse-mode autodiff, so without this
    wrapper any model training through the flash path dies in linearization
    (found live: DiT(flash_attn=True).train_step). The backward pass
    recomputes the attention weights with the plain XLA math and
    differentiates that — the O(n^2) logits exist only inside the backward
    computation (never saved as residuals), so the forward keeps flash's
    O(n) memory and the backward matches what XLA's own fused softmax
    backward would do numerically.
    """
    return _flash_attention_impl(q, k, v)


def _flash_attention_fwd(q, k, v):
    return _flash_attention_impl(q, k, v), (q, k, v)


def _flash_attention_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def scaled_dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: bool = False
) -> jax.Array:
    """[b, h, n, d] attention with shape-driven kernel dispatch."""
    n_kv = k.shape[2]
    if use_pallas and _on_tpu() and n_kv >= 256 and q.shape[-1] % 8 == 0:
        return _flash_attention(q, k, v)
    return _xla_attention(q, k, v)
