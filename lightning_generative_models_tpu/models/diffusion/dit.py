"""DiT — Diffusion Transformer backbone (beyond reference).

The reference's diffusion stack is UNet-only (reference:
models/generative/diffusion/ddpm.py:93-471). This adds the scalable-
transformer denoiser of Peebles & Xie 2022 (arXiv:2212.09748): patchify the
(possibly latent) image into tokens, run a stack of adaLN-Zero transformer
blocks conditioned on (timestep [+ class]) embeddings, and unpatchify a
linear head back to image space. DiT is the modern default backbone for
large-scale diffusion (class-conditional ImageNet, SD3/PixArt-style latent
models), and it is the TPU-preferred one: the compute is pure dense matmuls
+ softmax attention, which map straight onto the MXU with none of the
conv/GroupNorm layout structure that caps the UNet's MFU (see
docs/PERFORMANCE.md — the UNet step's measured floors are conv layouts,
GN/FiLM bandwidth and Pallas-boundary relayouts, all absent here).

Drop-in contract: the module exposes the UNet's exact call signature
``(x_nhwc, time, x_self_cond=None, labels=None)`` and ``null_class``
property, so :class:`~.ddpm.DDPM` (and every subclass — FlowMatching,
LatentDiffusion, LatentFlowMatching) swaps it in behind the
``network="dit"`` config switch with all training/EMA/CFG/sampler/serving
machinery unchanged.

TPU design:
- patchify/unpatchify are pure reshape+transpose in NHWC (zero-copy in XLA)
  around a single Dense — no conv stem.
- fixed 2D sin-cos positional embeddings (the DiT/MAE choice) computed at
  trace time from the static token grid; nothing learned, nothing stored.
- adaLN-Zero: per-block Dense(6*hidden) from SiLU(cond), ZERO-initialized so
  every residual branch starts closed and the network output at init is
  exactly zero (the paper's critical-for-stability trick; regression-tested).
- compute in ``dtype`` (bf16 on TPU) with f32 LayerNorm statistics, f32
  matmul accumulation in attention, f32 conditioning MLPs (tiny), f32 output.
- attention by default goes through ``ops.attention.fused_attention_qkv``
  on the packed head-minor Dense output: on TPU a fully-VMEM Pallas kernel
  (all heads + n^2 scores resident in VMEM, real Pallas backward — zero n^2
  HBM traffic, no head transposes, and deliberately NOT the shape XLA:TPU's
  slow auto flash-attention rewrite pattern-matches), elsewhere equivalent
  head-minor einsums; ``flash_attn=True`` opts into the streaming-KV Pallas
  flash kernel via ops/attention.py for long-sequence configs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.models.modules.time_embedding import (
    SinusoidalPosEmb,
)
from lightning_generative_models_tpu.ops.attention import (
    fused_attention_qkv,
    scaled_dot_product_attention,
)
from lightning_generative_models_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def seq_shard(x: jax.Array) -> jax.Array:
    """Megatron sequence-parallel hint (Korthikanti et al. 2022,
    arXiv:2205.05198): constrain a [batch, tokens, hidden] activation to
    ``P(data, model, None)`` so the LayerNorm / adaLN-modulation / residual
    regions between the tensor-parallel matmuls run sharded over tokens
    instead of replicated. GSPMD then converts each block's two output
    all-reduces into reduce-scatters and inserts the matching all-gathers at
    the qkv/fc1 entries — same bytes on the wire, 1/tp of the elementwise
    work and activation memory on the residual stream.

    A no-op unless the ambient mesh (``jax.set_mesh``, entered by the
    Trainer under ``--strategy tp``) carries both axes — so a
    ``seq_parallel`` checkpoint still samples/serves on a single chip.
    """
    am = jax.sharding.get_abstract_mesh()
    if am.empty or DATA_AXIS not in am.axis_names or MODEL_AXIS not in am.axis_names:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P(DATA_AXIS, MODEL_AXIS, None))


def posemb_sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2D sin-cos positional table [h*w, dim] (DiT/MAE convention):
    dim/2 encodes the row index, dim/2 the column, each as sin||cos over
    log-spaced frequencies. Pure numpy at trace time — a compile-time
    constant, never a parameter."""
    if dim % 4:
        raise ValueError(f"posemb_sincos_2d needs dim % 4 == 0, got {dim}")
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    yy, xx = np.mgrid[:h, :w]
    out = np.concatenate(
        [
            np.sin(yy.reshape(-1, 1) * omega),
            np.cos(yy.reshape(-1, 1) * omega),
            np.sin(xx.reshape(-1, 1) * omega),
            np.cos(xx.reshape(-1, 1) * omega),
        ],
        axis=1,
    )
    return out.astype(np.float32)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation: x * (1 + scale) + shift, broadcast over tokens."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning
    (arXiv:2212.09748 fig. 3 left): LayerNorms carry no learned affine;
    shift/scale/gate for both branches come from a zero-initialized linear
    of the conditioning vector, so the block is the identity at init."""

    hidden: int
    heads: int
    mlp_ratio: float = 4.0
    flash: bool = False
    dtype: jnp.dtype = jnp.float32
    qkv_layout: str = "s3hd"
    seq_parallel: bool = False
    # >0 replaces this block's MLP with a Switch/GShard top-1 MoE
    # (models/modules/moe.py); expert-parallel under --strategy tp.
    num_experts: int = 0
    capacity_factor: float = 1.25
    # Force the head-minor einsum attention (the fused VMEM kernel's
    # reference math) — A/B and debugging escape hatch. The pipeline stages
    # no longer need it: the kernel entries carry a custom_vmap rule that
    # folds the stage axis into the batch grid (ops/attention.py).
    einsum_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.hidden // self.heads

        # Conditioning is per-example and tiny — keep it f32.
        mod = nn.Dense(
            6 * self.hidden,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="adaLN_modulation",
        )(nn.silu(c))
        (sh_a, sc_a, gate_a, sh_m, sc_m, gate_m) = jnp.split(mod, 6, axis=-1)

        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, use_bias=False, use_scale=False,
            dtype=jnp.float32, name=name,
        )

        # -- attention branch ------------------------------------------------
        h = modulate(ln("norm1")(x), sh_a, sc_a).astype(self.dtype)
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name="qkv")(h)
        if self.flash:
            # [b, heads, n, d] for the SDPA dispatcher (Pallas for long n).
            if self.qkv_layout == "h3d":
                qkv5 = qkv.reshape(b, n, self.heads, 3, head_dim)
                q, k, v = (
                    qkv5[..., i, :].transpose(0, 2, 1, 3) for i in range(3)
                )
            else:
                qkv5 = qkv.reshape(b, n, 3, self.heads, head_dim)
                q, k, v = (
                    qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
                )
            att = scaled_dot_product_attention(q, k, v, use_pallas=True)
            att = att.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        else:
            # Head-dim kept minor throughout: the packed Dense output goes
            # straight into fused_attention_qkv, which on TPU runs the
            # fully-VMEM Pallas kernel (all heads + the n^2 scores resident
            # in VMEM, real Pallas backward — zero n^2 HBM traffic) and
            # elsewhere the same math as head-minor einsums. Measured at
            # DiT-S/2 bs128 (scripts/dit_attack.py): the einsum formulation
            # already beat the transposed SDPA 2110 vs 1705 img/s (XLA's
            # auto flash-attention rewrite + 12 qkv relayout copies); the
            # VMEM kernel then halves the per-block attention cost again
            # (1.32 vs 2.29 ms/block fwd+bwd, slope protocol).
            if self.einsum_attn:
                from lightning_generative_models_tpu.ops.attention import (
                    _einsum_attention_qkv,
                )

                att = _einsum_attention_qkv(qkv, self.heads, self.qkv_layout)
            else:
                att = fused_attention_qkv(qkv, self.heads, self.qkv_layout)
        att = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(att)
        x = x + gate_a[:, None, :].astype(x.dtype) * att.astype(x.dtype)
        if self.seq_parallel:
            x = seq_shard(x)

        # -- MLP branch --------------------------------------------------------
        h = modulate(ln("norm2")(x), sh_m, sc_m).astype(self.dtype)
        if self.num_experts > 0:
            from lightning_generative_models_tpu.models.modules.moe import (
                MoEMlp,
            )

            h = MoEMlp(
                hidden=self.hidden,
                mlp_dim=int(self.hidden * self.mlp_ratio),
                num_experts=self.num_experts,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype,
                name="moe",
            )(h)
        else:
            h = nn.Dense(
                int(self.hidden * self.mlp_ratio), dtype=self.dtype,
                name="fc1",
            )(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        x = x + gate_m[:, None, :].astype(x.dtype) * h.astype(x.dtype)
        return seq_shard(x) if self.seq_parallel else x


class DiT(nn.Module):
    """Diffusion Transformer denoiser, NHWC in/out, UNet-signature-compatible.

    ``hidden``/``depth``/``heads`` select the scale (DiT-S = 384/12/6,
    DiT-B = 768/12/12, ...); ``patch_size`` the token granularity. Smaller
    patches = 4x tokens per halving = better quality and more MXU work.
    """

    hidden: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 2
    channels: int = 3
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    out_channels: Optional[int] = None
    flash_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    # Packed-qkv channel order (see ops/attention.py LAYOUTS). "h3d" packs
    # each head's (q,k,v) contiguously so a contiguous channel shard is a
    # whole-head group — REQUIRED for tensor parallelism (--strategy tp);
    # same parameter shapes, different column semantics, so the two layouts'
    # checkpoints are not interchangeable.
    qkv_layout: str = "s3hd"
    # Megatron sequence parallelism on top of --strategy tp (see seq_shard):
    # token-shards the LN/modulation/residual regions over the model axis.
    # No parameters change; a no-op off the tp mesh, so the same checkpoint
    # trains sp-sharded and samples single-chip.
    seq_parallel: bool = False
    # Mixture of Experts (beyond reference; DiT-MoE, arXiv:2407.11633 /
    # Switch arXiv:2101.03961): num_experts > 0 swaps the MLP of every
    # ``moe_every``-th block (the paper-standard alternation is 2) for a
    # top-1-routed expert bank (models/modules/moe.py). Expert-parallel
    # under --strategy tp: wi/wo shard over the model axis on dim 0.
    num_experts: int = 0
    capacity_factor: float = 1.25
    moe_every: int = 2
    # Pipeline parallelism (--strategy pp; GPipe, arXiv:1811.06965 — see
    # models/diffusion/pipeline.py): >0 groups the block stack into that many
    # stages with stage-stacked parameters (sharded over the mesh's "stage"
    # axis under --strategy pp) and runs the microbatch schedule. Same math
    # as the sequential stack, but a DIFFERENT parameter tree (stacked), so
    # pipeline and sequential checkpoints are not interchangeable.
    pipeline_stages: int = 0
    # Microbatches for the GPipe schedule (0 -> pipeline_stages). Bubble
    # fraction is (S-1)/(M+S-1); raise M to amortize it.
    pipeline_microbatches: int = 0
    # Force the head-minor einsum attention everywhere (A/B + debugging;
    # see DiTBlock.einsum_attn).
    einsum_attn: bool = False
    # Run the fused VMEM kernel inside pipeline stages. The stage-vmap path
    # exists and is parity-tested (ops/attention.py:_fold_leading_vmap), but
    # the single-chip interleaved A/B (scripts/pp_attention_ab.py, DiT-S/2
    # pp4/m16 bs128) measured the einsum formulation FASTER under the
    # schedule: 1923 vs 1735 img/s (fused -9.8%) — per-tick microbatches are
    # small and the remat backward recomputes the kernel, so XLA's fused
    # einsum wins where the dense step's kernel was +30%. Default stays the
    # measured-faster einsum; flip for multi-chip exploration.
    pp_fused_attn: bool = False

    @property
    def null_class(self) -> int:
        """Label value meaning 'unconditional' (same contract as UNet)."""
        assert self.num_classes is not None
        return self.num_classes

    @property
    def output_channels(self) -> int:
        return self.out_channels or self.channels

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        x_self_cond: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
    ) -> jax.Array:
        if x_self_cond is not None:
            raise ValueError(
                "DiT does not support self-conditioning; configure the DDPM "
                "with self_condition=False (the default)"
            )
        if self.hidden % self.heads:
            raise ValueError(
                f"hidden {self.hidden} not divisible by heads {self.heads}"
            )
        b, hh, ww, cc = x.shape
        p = self.patch_size
        if hh % p or ww % p:
            raise ValueError(f"image {hh}x{ww} not divisible by patch {p}")
        gh, gw = hh // p, ww // p
        n = gh * gw

        # -- patchify: [b,h,w,c] -> [b, n, p*p*c] (reshapes only) -> Dense ----
        tok = x.astype(self.dtype).reshape(b, gh, p, gw, p, cc)
        tok = tok.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, p * p * cc)
        tok = nn.Dense(self.hidden, dtype=self.dtype, name="patch_embed")(tok)
        pos = jnp.asarray(posemb_sincos_2d(gh, gw, self.hidden))
        tok = tok + pos[None].astype(tok.dtype)
        if self.seq_parallel:
            tok = seq_shard(tok)

        # -- conditioning vector: timestep [+ class] --------------------------
        t = SinusoidalPosEmb(256)(time)
        t = nn.Dense(self.hidden, dtype=jnp.float32, name="t_fc1")(t)
        t = nn.silu(t)
        c = nn.Dense(self.hidden, dtype=jnp.float32, name="t_fc2")(t)
        if self.num_classes is not None:
            if labels is None:
                raise ValueError(
                    "DiT(num_classes=...) requires labels; pass "
                    f"jnp.full((B,), {self.null_class}) for unconditional"
                )
            c = c + nn.Embed(
                self.num_classes + 1,
                self.hidden,
                embedding_init=nn.initializers.normal(0.02),
                name="class_emb",
            )(labels.astype(jnp.int32))

        if self.pipeline_stages > 0:
            s = self.pipeline_stages
            if self.depth % s:
                raise ValueError(
                    f"depth {self.depth} not divisible by "
                    f"pipeline_stages={s}"
                )
            if self.num_experts or self.seq_parallel or self.flash_attn:
                raise ValueError(
                    "pipeline_stages is incompatible with num_experts, "
                    "seq_parallel and flash_attn (stages must be "
                    "structurally identical; see models/diffusion/"
                    "pipeline.py)"
                )
            from lightning_generative_models_tpu.models.diffusion.pipeline import (
                pipeline_blocks,
            )

            tok = pipeline_blocks(
                tok, c,
                stages=s,
                microbatches=self.pipeline_microbatches or s,
                per_stage=self.depth // s,
                hidden=self.hidden,
                heads=self.heads,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                qkv_layout=self.qkv_layout,
                einsum_attn=self.einsum_attn or not self.pp_fused_attn,
            )
        else:
            for i in range(self.depth):
                # MoE on every moe_every-th block, aligned so the LAST block
                # is always MoE (matches the alternate-and-end-dense-first
                # DiT-MoE layout and guarantees >=1 MoE block at any depth).
                moe_here = (
                    self.num_experts > 0
                    and (self.depth - 1 - i) % self.moe_every == 0
                )
                tok = DiTBlock(
                    self.hidden, self.heads, self.mlp_ratio,
                    flash=self.flash_attn, dtype=self.dtype,
                    qkv_layout=self.qkv_layout,
                    seq_parallel=self.seq_parallel,
                    num_experts=self.num_experts if moe_here else 0,
                    capacity_factor=self.capacity_factor,
                    einsum_attn=self.einsum_attn,
                    name=f"block_{i}",
                )(tok, c)

        # -- final layer: adaLN (zero-init) -> zero-init linear head ----------
        mod = nn.Dense(
            2 * self.hidden,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="final_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        tok = modulate(
            nn.LayerNorm(
                epsilon=1e-6, use_bias=False, use_scale=False,
                dtype=jnp.float32, name="final_norm",
            )(tok),
            shift,
            scale,
        )
        out = nn.Dense(
            p * p * self.output_channels,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="head",
        )(tok)

        # -- unpatchify: [b, n, p*p*co] -> [b,h,w,co] --------------------------
        co = self.output_channels
        out = out.reshape(b, gh, gw, p, p, co)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, co)
        return out.astype(jnp.float32)
