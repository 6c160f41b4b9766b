"""Pipeline parallelism (--strategy pp) for the DiT block stack.

Beyond reference (the reference's only strategy is DDP data parallelism,
reference: utils/lightning_utils.py:23-56). This is the GPipe microbatch
schedule (Huang et al. 2019, arXiv:1811.06965) expressed the TPU/GSPMD way —
the MaxText/praxis formulation rather than point-to-point sends:

- the ``depth`` DiT blocks are grouped into ``S = pipeline_stages`` stages of
  ``depth/S`` blocks each; the per-stage parameters are STACKED on a leading
  stage axis via ``nn.vmap`` (``variable_axes={"params": 0}``) and sharded
  ``P("stage", ...)`` over the mesh's stage axis
  (parallel/mesh.py:pp_sharding), so each chip holds 1/S of the block weights;
- the batch is split into ``M = pipeline_microbatches`` microbatches and the
  schedule runs ``T = M + S - 1`` ticks as one ``nn.scan``
  (``variable_broadcast="params"``): every tick applies ALL stages at once to
  the stage-stacked activation buffer (one ``nn.vmap`` call — each device
  computes exactly its stage, zero communication inside the stage), then
  shifts the buffer one stage down and feeds the next microbatch into stage 0.
  The shift is a plain ``jnp.concatenate`` on the stage-sharded axis — GSPMD
  lowers it to the cross-stage collective-permute; no hand-written ppermute;
- the last stage's output at tick ``t`` is microbatch ``t - (S-1)``'s result;
  the first ``S-1`` emissions are the fill bubble and are sliced off.

The pipeline is pure scheduling, not math: per-example outputs are identical
to the sequential block stack (no op in a DiTBlock couples examples), which
the tests pin by transplanting stacked params into a sequential DiT and by
loss/update parity of the pp-sharded step against the single-device step.

Bubble fraction is the GPipe ``(S-1)/(T)``; raise ``pipeline_microbatches``
above ``S`` to amortize it (M=S is the default, M>=4S the usual production
choice). Attention inside the stages: both formulations are available. The
fused VMEM Pallas kernel crosses the stage-vmap via a ``custom_vmap`` rule
folding the stage axis into its batch grid
(ops/attention.py:_fold_leading_vmap; parity-tested fwd+bwd), but the
single-chip interleaved A/B (scripts/pp_attention_ab.py, DiT-S/2 pp4/m16
bs128) measured the einsum formulation FASTER under the schedule — 1923 vs
1735 img/s (fused −9.8%; per-tick microbatches are small and remat
recomputes the kernel in the backward) — so einsum is the default and
``pp_fused_attn=true`` opts into the kernel (docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.parallel.mesh import DATA_AXIS, STAGE_AXIS


def pp_shard(x: jax.Array) -> jax.Array:
    """Constrain a stage-stacked [S, mb, ...] buffer to
    ``P(stage, data, None, ...)`` so the scan carry stays stage-sharded.
    Resolved against the ambient mesh (``jax.set_mesh``, entered by the
    Trainer under ``--strategy pp``); a mechanical no-op off the pp mesh, so
    pipeline checkpoints sample/serve on a single chip unchanged."""
    am = jax.sharding.get_abstract_mesh()
    if am.empty or STAGE_AXIS not in am.axis_names or DATA_AXIS not in am.axis_names:
        return x
    from jax.sharding import PartitionSpec as P

    spec = (STAGE_AXIS, DATA_AXIS) + (None,) * (x.ndim - 2)
    return jax.lax.with_sharding_constraint(x, P(*spec))


class _Stage(nn.Module):
    """One pipeline stage: ``n_blocks`` sequential DiTBlocks. Applied to all
    stages at once through ``nn.vmap`` — every stage must therefore have an
    identical parameter structure (enforced by DiT's pipeline validation:
    no MoE blocks under pp)."""

    n_blocks: int
    hidden: int
    heads: int
    mlp_ratio: float
    dtype: Any
    qkv_layout: str
    einsum_attn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        from lightning_generative_models_tpu.models.diffusion.dit import DiTBlock

        for j in range(self.n_blocks):
            x = DiTBlock(
                self.hidden, self.heads, self.mlp_ratio,
                dtype=self.dtype, qkv_layout=self.qkv_layout,
                einsum_attn=self.einsum_attn,
                name=f"block_{j}",
            )(x, c)
        return x


class _PipeTick(nn.Module):
    """One pipeline tick: feed a microbatch into stage 0, shift every buffer
    one stage down, apply all stages in parallel, emit the last stage's
    output. ``nn.scan`` over this module (params broadcast) is the whole
    GPipe schedule."""

    stages: int
    per_stage: int
    hidden: int
    heads: int
    mlp_ratio: float
    dtype: Any
    qkv_layout: str
    einsum_attn: bool = False

    @nn.compact
    def __call__(
        self,
        carry: Tuple[jax.Array, jax.Array],
        xt: Tuple[jax.Array, jax.Array],
    ):
        state_x, state_c = carry  # [S, mb, n, hidden], [S, mb, hidden]
        mb_x, mb_c = xt  # [mb, n, hidden], [mb, hidden]

        # Shift: the new microbatch enters stage 0; stage s consumes stage
        # s-1's previous output. On the pp mesh this concatenate IS the
        # cross-stage collective-permute (GSPMD lowers the sharded-axis
        # shift); the last stage's previous output leaves the pipe.
        state_x = pp_shard(jnp.concatenate([mb_x[None], state_x[:-1]], axis=0))
        state_c = pp_shard(jnp.concatenate([mb_c[None], state_c[:-1]], axis=0))

        # Remat the stage body: without it, nn.scan saves every tick's
        # block-internal activations for the backward — O(T) copies of the
        # attention/MLP buffers, measured as an immediate HBM OOM for
        # DiT-S/2 at bs128 (19 ticks x ~456 MB per saved buffer). With
        # remat only the [S, mb, n, hidden] carries are stored and the
        # backward recomputes each tick's stage internals — the standard
        # pipeline-parallel memory discipline (GPipe §2.3).
        StageV = nn.vmap(
            nn.remat(_Stage),
            in_axes=(0, 0),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )
        y = StageV(
            n_blocks=self.per_stage,
            hidden=self.hidden,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            qkv_layout=self.qkv_layout,
            einsum_attn=self.einsum_attn,
            name="stages",
        )(state_x, state_c)
        y = pp_shard(y)
        return (y, state_c), y[-1]


def pipeline_blocks(
    tok: jax.Array,
    c: jax.Array,
    *,
    stages: int,
    microbatches: int,
    per_stage: int,
    hidden: int,
    heads: int,
    mlp_ratio: float,
    dtype: Any,
    qkv_layout: str,
    einsum_attn: bool = False,
) -> jax.Array:
    """Run the DiT block stack as a GPipe pipeline (see module docstring).

    ``tok``: [b, n, hidden] tokens, ``c``: [b, hidden] conditioning.
    Returns [b, n, hidden] — per-example identical to the sequential stack.
    """
    b, n, _ = tok.shape
    # The schedule is pure scheduling — parameters and math are independent
    # of M — so batches not divisible by ``microbatches`` (parameter init
    # traces with b=1; small sampling grids) degrade to the largest divisor
    # instead of failing.
    import math

    m = math.gcd(b, microbatches)
    mb = b // m
    t_total = m + stages - 1

    xs_x = tok.reshape(m, mb, n, hidden)
    xs_c = c.reshape(m, mb, c.shape[-1])
    if stages > 1:
        # Drain ticks: stage 0 idles on zero microbatches while the tail of
        # the pipe flushes (their results are never emitted).
        pad_x = jnp.zeros((stages - 1, mb, n, hidden), xs_x.dtype)
        pad_c = jnp.zeros((stages - 1, mb, c.shape[-1]), xs_c.dtype)
        xs_x = jnp.concatenate([xs_x, pad_x], axis=0)
        xs_c = jnp.concatenate([xs_c, pad_c], axis=0)

    carry0 = (
        pp_shard(jnp.zeros((stages, mb, n, hidden), xs_x.dtype)),
        pp_shard(jnp.zeros((stages, mb, c.shape[-1]), xs_c.dtype)),
    )

    scanned = nn.scan(
        _PipeTick,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
        length=t_total,
    )
    _, ys = scanned(
        stages=stages,
        per_stage=per_stage,
        hidden=hidden,
        heads=heads,
        mlp_ratio=mlp_ratio,
        dtype=dtype,
        qkv_layout=qkv_layout,
        einsum_attn=einsum_attn,
        name="pipeline",
    )(carry0, (xs_x, xs_c))

    # ys: [T, mb, n, hidden]; the first S-1 ticks are the fill bubble.
    return ys[stages - 1:].reshape(b, n, hidden)
