"""Attention blocks for the diffusion UNet (NHWC, TPU-first).

Parity with the reference (reference:
models/generative/diffusion/ddpm.py:107-113, 203-271 and
models/modules/attend.py): pixel-space RMSNorm; softmax-kernel linear
attention with learned memory KV at outer resolutions; full attention with
memory KV at the innermost resolution. The reference's ``Attend`` flash/math
switch becomes a dispatch to the Pallas TPU kernel in ops/attention.py for
long sequences, with a plain fused-XLA softmax attention otherwise (at the
reference's resolutions the sequence is <= 64 tokens, far below flash
break-even).

TPU design (round-2 rewrite — attention was 43% of UNet forward time):
- token-major [b, n, heads, d] layout everywhere: the feature dim stays in
  the lane dimension and memory-KV concatenation happens on the sublane
  (token) axis, so no 128-lane padding (the old [b,h,d,n] layout padded
  n=1028 -> 1152) and no big relayout transposes;
- compute in the UNet's dtype (bf16 on TPU) with f32 softmax statistics and
  f32 matmul accumulation (``preferred_element_type``);
- RMSNorm statistics always in f32 regardless of activation dtype.

Checkpoint compatibility: ``Attention`` keeps round 1's parameter tree
(same ``nn.Conv`` projections, same ``mem_kv`` shape). ``LinearAttention``
does NOT — the fused-kernel rewrite flattened its parameters (``norm_g``,
``qkv_kernel``, ``mem_kv``, ``out_kernel``/``out_bias``, ``out_norm_g``).
Pre-rewrite DDPM checkpoints are migrated automatically on restore
(:func:`migrate_pre_fused_linear_attention`, applied by
``CheckpointManager.restore`` when the stored tree mismatches) — the
transform is a pure reshape, the math is unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.ops.attention import scaled_dot_product_attention
from lightning_generative_models_tpu.ops.linear_attention import linear_attention
from lightning_generative_models_tpu.parallel.mesh import data_shard


# Round-1 LinearAttention parameter layout (flax auto-named submodules).
# Unique to the pre-rewrite LinearAttention: the full Attention module has
# no second RMSNorm, so this key set cannot match anything else.
_PRE_FUSED_KEYS = frozenset(
    {"RMSNorm_0", "Conv_0", "mem_kv", "Conv_1", "RMSNorm_1"}
)
_FLAT_KEYS = frozenset(
    {"norm_g", "qkv_kernel", "mem_kv", "out_kernel", "out_bias", "out_norm_g"}
)


def has_pre_fused_linear_attention(tree) -> bool:
    """True if any subtree uses the round-1 LinearAttention layout."""
    if isinstance(tree, (list, tuple)):
        return any(has_pre_fused_linear_attention(v) for v in tree)
    if not isinstance(tree, dict):
        return False
    if set(tree) == _PRE_FUSED_KEYS:
        return True
    return any(has_pre_fused_linear_attention(v) for v in tree.values())


def migrate_pre_fused_linear_attention(tree):
    """Migrate round-1 LinearAttention parameter subtrees
    (``RMSNorm_0/Conv_0/mem_kv/Conv_1/RMSNorm_1``) to the flat post-rewrite
    layout. A pure reshape — the 1x1 conv kernels drop their spatial dims —
    so restored weights are numerically identical; the q/k softmaxes,
    memory-KV concat and scaling are unchanged between the layouts."""
    if isinstance(tree, (list, tuple)):
        # Optimizer states may restore as list/tuple nodes (optax chains);
        # pre-fused mu/nu subtrees can live below them.
        return type(tree)(migrate_pre_fused_linear_attention(v) for v in tree)
    if not isinstance(tree, dict):
        return tree
    if set(tree) == _PRE_FUSED_KEYS and isinstance(tree.get("Conv_0"), dict):
        qkv = tree["Conv_0"]["kernel"]
        outk = tree["Conv_1"]["kernel"]
        return {
            "norm_g": tree["RMSNorm_0"]["g"],
            "qkv_kernel": qkv.reshape(qkv.shape[-2], qkv.shape[-1]),
            "mem_kv": tree["mem_kv"],
            "out_kernel": outk.reshape(outk.shape[-2], outk.shape[-1]),
            "out_bias": tree["Conv_1"]["bias"],
            "out_norm_g": tree["RMSNorm_1"]["g"],
        }
    return {k: migrate_pre_fused_linear_attention(v) for k, v in tree.items()}


class RMSNorm(nn.Module):
    """Channel RMSNorm over the last (feature) axis (ddpm.py:107-113).

    Statistics in f32; result cast back to the input dtype.
    """

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(
            jnp.sum(x32**2, axis=-1, keepdims=True) + 1e-12
        )
        return (normed * g * (self.dim**0.5)).astype(x.dtype)


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention (ddpm.py:203-239), O(n*d^2).

    The whole block (RMSNorm -> qkv proj -> softmaxes + memory KV -> head
    contractions -> out proj -> RMSNorm) runs as ONE fused Pallas kernel on
    TPU (ops/linear_attention.py) — profiling attributed ~40% of the UNet
    forward to this block's HBM round-trips. Parameters are declared flat so
    the identical tree serves both the fused and the XLA path.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    dtype: jnp.dtype = jnp.float32
    residual: bool = False  # fold the surrounding `attn(x) + x` into the kernel

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hd = self.heads * self.dim_head

        g0 = self.param("norm_g", nn.initializers.ones, (self.dim,))
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (self.dim, 3 * hd)
        )
        mem = self.param(
            "mem_kv",
            nn.initializers.normal(1.0),
            (2, self.heads, self.dim_head, self.num_mem_kv),
        )
        out_kernel = self.param(
            "out_kernel", nn.initializers.lecun_normal(), (hd, self.dim)
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (self.dim,))
        g1 = self.param("out_norm_g", nn.initializers.ones, (self.dim,))

        out = linear_attention(
            x.astype(self.dtype).reshape(b, h * w, c),
            g0, qkv_kernel, mem, out_kernel, out_bias, g1,
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            residual=self.residual,
        )
        return out.reshape(b, h, w, c)


class Attention(nn.Module):
    """Full softmax attention over flattened pixels (ddpm.py:242-271)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    flash: bool = False
    dtype: jnp.dtype = jnp.float32
    residual: bool = False  # fold the surrounding `attn(x) + x` in

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hd = self.heads * self.dim_head

        x_in = x
        x = RMSNorm(self.dim)(x.astype(self.dtype))
        qkv = nn.Conv(hd * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        # Batch-only sharding on the activation: under FSDP the qkv kernel is
        # channel-sharded, and without this pin GSPMD propagates that channel
        # sharding through the [b,n,3,h,d] reshape into the softmax/einsum
        # intermediates, then bails with "involuntary full rematerialization"
        # (r3 MULTICHIP tail). The constraint forces the ZeRO-3 contract
        # instead: all-gather the kernel at its use site, keep attention
        # compute batch-partitioned. No-op without an ambient data mesh.
        qkv = data_shard(qkv)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, h, d]

        # Same param shape as round 1 / the reference: [2, heads, m, d].
        mem = self.param(
            "mem_kv",
            nn.initializers.normal(1.0),
            (2, self.heads, self.num_mem_kv, self.dim_head),
        )
        mk, mv = (
            jnp.broadcast_to(
                mem[i].transpose(1, 0, 2)[None].astype(self.dtype),
                (b, self.num_mem_kv, self.heads, self.dim_head),
            )
            for i in range(2)
        )
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)

        n_kv = k.shape[1]
        # The n_kv gate is intentionally duplicated from ops/attention.py's
        # dispatch: checking here skips the three q/k/v transposes entirely
        # on the short-sequence path, where sdpa would fall back to XLA
        # anyway (keep the two break-even constants in sync).
        if self.flash and n_kv >= 256:
            # Long sequences: Pallas flash kernel ([b, heads, n, d] layout).
            out = scaled_dot_product_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                use_pallas=True,
            ).transpose(0, 2, 1, 3)
        else:
            # Reference resolutions: <= 64 + mem tokens. One fused XLA
            # program, f32 logits/softmax, token axes in sublanes.
            scale = self.dim_head**-0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", weights, v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        # Same pin on the output side: the out-projection kernel is also
        # FSDP-sharded, and its backward would otherwise push a channel
        # sharding into the attention-weights transpose.
        out = data_shard(out.reshape(b, h, w, hd))
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype)(out)
        return out + x_in.astype(out.dtype) if self.residual else out
