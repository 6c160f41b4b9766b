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


# ---------------------------------------------------------------------------
# Fully-fused VMEM attention on packed head-minor qkv (moderate n)
# ---------------------------------------------------------------------------
#
# For transformer backbones at moderate sequence length (DiT at 32px/p2 has
# n=256 tokens), the whole per-batch attention — all heads, including the
# [n, n] score matrix — fits in VMEM. XLA's lowering instead materializes the
# [b, h, n, n] probability tensor in HBM every block (~100 MB at DiT-S/2
# bs128), saves it as a backward residual, reads it back sliced for the
# p@v matmul, and writes its gradient in the backward: measured ~3.2 ms/step
# of softmax-backward fusions + ~2 ms/step of async batch-slice DMAs at
# DiT-S/2 bs128 (experiments/DiT/profile_r3b). These kernels keep ALL n^2
# intermediates in VMEM, forward and backward; HBM traffic is exactly the
# packed qkv in and out gradients.
#
# Layout contract: qkv is the raw Dense(3*h*d) output [b, n, 3*h*d] in its
# natural row-major layout — head-minor, never transposed (the head
# transpose itself measured ~4.3 ms/step of relayout copies, see DiTBlock).
# The backward is a real Pallas kernel (recompute-in-VMEM), not a fallback
# to the XLA math.
#
# Two packed channel orders are supported (``layout``):
# - "s3hd": (3, heads, d) — the [b,n,3,heads,d] reshape order: q block, then
#   k, then v, heads-major within each. The historical default.
# - "h3d":  (heads, 3, d) — per-head (q,k,v) contiguous. Required for tensor
#   parallelism: a contiguous NamedSharding chunk of the channel dim is then
#   a whole-head group, so Megatron-style head sharding (qkv Dense kernel
#   column-sharded over the "model" axis) propagates through with ZERO
#   activation collectives; custom_partitioning below runs the kernel
#   per-shard with heads/tp local heads. With "s3hd" a channel shard would
#   split the 3-factor, so that layout only partitions over batch.

LAYOUTS = ("s3hd", "h3d")


def _qkv_offsets(layout: str, hd: int, d: int, hh: int):
    """(q, k, v) channel offsets of head ``hh`` in the packed qkv dim."""
    if layout == "s3hd":
        return hh * d, hd + hh * d, 2 * hd + hh * d
    base = hh * 3 * d
    return base, base + d, base + 2 * d


def _vmem_attn_fwd_kernel(qkv_ref, o_ref, *, heads: int, scale: float,
                          layout: str):
    """One batch element: all heads' softmax attention entirely in VMEM."""
    x = qkv_ref[0]  # [n, 3*h*d]
    hd = x.shape[-1] // 3
    d = hd // heads
    for hh in range(heads):
        qo, ko, vo = _qkv_offsets(layout, hd, d, hh)
        q = x[:, qo:qo + d].astype(jnp.float32)
        k = x[:, ko:ko + d].astype(jnp.float32)
        v = x[:, vo:vo + d].astype(jnp.float32)
        s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, hh * d:(hh + 1) * d] = o.astype(o_ref.dtype)


def _vmem_attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, heads: int,
                          scale: float, layout: str):
    """Backward by in-VMEM recompute: softmax-attention VJP per head.

    dV = P^T g;  dP = g V^T;  dS = P * (dP - rowsum(P * dP));
    dQ = dS K * scale;  dK = dS^T Q * scale.
    """
    x = qkv_ref[0]  # [n, 3*h*d]
    g = g_ref[0]  # [n, h*d]
    hd = x.shape[-1] // 3
    d = hd // heads
    for hh in range(heads):
        qo, ko, vo = _qkv_offsets(layout, hd, d, hh)
        q = x[:, qo:qo + d].astype(jnp.float32)
        k = x[:, ko:ko + d].astype(jnp.float32)
        v = x[:, vo:vo + d].astype(jnp.float32)
        gh = g[:, hh * d:(hh + 1) * d].astype(jnp.float32)
        s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dv = jnp.dot(p.T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, :, qo:qo + d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, ko:ko + d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, vo:vo + d] = dv.astype(dqkv_ref.dtype)


def _vmem_attn_specs(b: int, n: int, width: int):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    return pl.BlockSpec((1, n, width), lambda i: (i, 0, 0))


@functools.partial(jax.jit, static_argnames=("heads", "layout"))
def _vmem_attention_fwd_impl(
    qkv: jax.Array, heads: int, layout: str = "s3hd"
) -> jax.Array:
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, n, w3 = qkv.shape
    hd = w3 // 3
    scale = (hd // heads) ** -0.5
    return pl.pallas_call(
        functools.partial(
            _vmem_attn_fwd_kernel, heads=heads, scale=scale, layout=layout
        ),
        grid=(b,),
        in_specs=[_vmem_attn_specs(b, n, w3)],
        out_specs=_vmem_attn_specs(b, n, hd),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        interpret=_INTERPRET,
    )(qkv)


@functools.partial(jax.jit, static_argnames=("heads", "layout"))
def _vmem_attention_bwd_impl(
    qkv: jax.Array, g: jax.Array, heads: int, layout: str = "s3hd"
) -> jax.Array:
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, n, w3 = qkv.shape
    hd = w3 // 3
    scale = (hd // heads) ** -0.5
    return pl.pallas_call(
        functools.partial(
            _vmem_attn_bwd_kernel, heads=heads, scale=scale, layout=layout
        ),
        grid=(b,),
        in_specs=[_vmem_attn_specs(b, n, w3), _vmem_attn_specs(b, n, hd)],
        out_specs=_vmem_attn_specs(b, n, w3),
        out_shape=jax.ShapeDtypeStruct((b, n, w3), qkv.dtype),
        interpret=_INTERPRET,
    )(qkv, g)


# Under pjit over a device mesh, GSPMD treats the pallas_call custom call as
# opaque and would all-gather the batch; custom_partitioning declares both
# kernels batch-dim partitionable so each chip runs them on its local shard
# (same treatment as ops/linear_attention.py). The "h3d" layout additionally
# declares the packed CHANNEL dim partitionable: a contiguous channel shard
# is a whole-head group there, so under tensor parallelism each chip runs
# the kernel on its heads/tp local heads with no gather.

from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from lightning_generative_models_tpu.ops.common import (  # noqa: E402
    batch_axes as _batch_axes,
)


def _fold_leading_vmap(fn):
    """Give a ``[b, ...] -> [b, ...]`` kernel entry a vmap rule that FOLDS
    the mapped axis into the batch dim.

    ``custom_partitioning`` has no batching rule, so a plain ``vmap`` over
    the VMEM attention kernels raises NotImplementedError — which is exactly
    what the pipeline schedule's stage-``nn.vmap`` does
    (models/diffusion/pipeline.py). The kernels are shape-generic over
    batch (``grid=(b,)``), so the mapped axis can be folded: ``[S, b, n, c]
    -> [S*b, n, c]``, run the identical custom-partitioned kernel, unfold.
    The rank-3 sharding rule ("b n c -> b n o") still applies, and under
    the pp mesh the folded dim-0 carries the merged (stage, data) axes, so
    each chip still runs only its local stage's rows.

    Composition note: this wraps the functions INSIDE the custom_vjp below
    — a batched custom_vjp call vmaps its fwd/bwd functions, so
    ``custom_vmap`` only ever meets vmap, never differentiation (which
    custom_vmap does not support).
    """
    from jax.custom_batching import custom_vmap

    wrapped = custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        def fold(x, batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size, *x.shape))
            return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])

        out = fn(*(fold(a, bb) for a, bb in zip(args, in_batched)))
        return out.reshape(axis_size, -1, *out.shape[1:]), True

    return wrapped


def _spec_axis(arg_info, dim: int):
    """Mesh axes sharding dimension ``dim`` of an operand (None if not)."""
    spec = arg_info.sharding.spec if arg_info.sharding else P()
    return spec[dim] if len(spec) > dim else None


def _axis_size(mesh, axes) -> int:
    if axes is None:
        return 1
    if isinstance(axes, (tuple, list)):
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        return size
    return mesh.shape[axes]


def _local_heads(mesh, chan_axes, heads: int, layout: str) -> int:
    """Per-shard head count when the channel dim is sharded ``tp`` ways."""
    tp = _axis_size(mesh, chan_axes)
    if tp == 1:
        return heads
    if layout != "h3d" or heads % tp:
        raise ValueError(
            f"packed-qkv channel dim sharded {tp} ways needs layout='h3d' "
            f"and heads % tp == 0 (got layout={layout!r}, heads={heads})"
        )
    return heads // tp


@functools.lru_cache(maxsize=None)
def _vmem_spmd_forward(heads: int, layout: str = "s3hd"):
    @custom_partitioning
    def fwd(qkv):
        return _vmem_attention_fwd_impl(qkv, heads, layout)

    def _specs(mesh, arg_infos):
        batch = _batch_axes(arg_infos[0])
        chan = _spec_axis(arg_infos[0], 2) if layout == "h3d" else None
        return batch, chan

    def infer(mesh, arg_infos, result_infos):
        batch, chan = _specs(mesh, arg_infos)
        return NamedSharding(mesh, P(batch, None, chan))

    def partition(mesh, arg_infos, result_infos):
        batch, chan = _specs(mesh, arg_infos)
        n_local = _local_heads(mesh, chan, heads, layout)
        sh = NamedSharding(mesh, P(batch, None, chan))

        def impl(qkv):
            return _vmem_attention_fwd_impl(qkv, n_local, layout)

        return mesh, impl, sh, (sh,)

    fwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b n c -> b n o",
    )
    return _fold_leading_vmap(fwd)


@functools.lru_cache(maxsize=None)
def _vmem_spmd_backward(heads: int, layout: str = "s3hd"):
    @custom_partitioning
    def bwd(qkv, g):
        return _vmem_attention_bwd_impl(qkv, g, heads, layout)

    def _specs(mesh, arg_infos):
        batch = _batch_axes(arg_infos[0])
        chan = _spec_axis(arg_infos[0], 2) if layout == "h3d" else None
        return batch, chan

    def infer(mesh, arg_infos, result_infos):
        batch, chan = _specs(mesh, arg_infos)
        return NamedSharding(mesh, P(batch, None, chan))

    def partition(mesh, arg_infos, result_infos):
        batch, chan = _specs(mesh, arg_infos)
        n_local = _local_heads(mesh, chan, heads, layout)
        sh_qkv = NamedSharding(mesh, P(batch, None, chan))
        sh_g = NamedSharding(mesh, P(batch, None, chan))

        def impl(qkv, g):
            return _vmem_attention_bwd_impl(qkv, g, n_local, layout)

        return mesh, impl, sh_qkv, (sh_qkv, sh_g)

    bwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b n c, b n o -> b n c",
    )
    return _fold_leading_vmap(bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _vmem_attention(qkv: jax.Array, heads: int, layout: str = "s3hd") -> jax.Array:
    return _vmem_spmd_forward(heads, layout)(qkv)


def _vmem_attention_fwd(qkv, heads, layout="s3hd"):
    return _vmem_spmd_forward(heads, layout)(qkv), qkv


def _vmem_attention_bwd(heads, layout, qkv, g):
    return (_vmem_spmd_backward(heads, layout)(qkv, g),)


_vmem_attention.defvjp(_vmem_attention_fwd, _vmem_attention_bwd)


def _vmem_attention_fits(n: int, width3: int, heads: int) -> bool:
    """Conservative VMEM bound for one grid program (fwd or bwd).

    Resident per program: the packed qkv block (+ its gradient in the bwd),
    the g/out block, f32 per-head q/k/v/g/dq/dk/dv tiles, and two [n, n] f32
    score/probability matrices. Bound the sum at 12 MB — inside the ~16 MB
    scoped-VMEM limit observed for the linear-attention kernels, with slack
    for Mosaic spills.
    """
    hd = width3 // 3
    d = hd // heads
    blocks = 2 * width3 * n * 2 + 2 * hd * n * 2  # qkv+dqkv, g+out (bf16)
    head_f32 = 7 * n * d * 4
    scores = 2 * n * n * 4
    return blocks + head_f32 + scores < 12 * 1024 * 1024


def fused_attention_qkv(
    qkv: jax.Array, heads: int, layout: str = "s3hd"
) -> jax.Array:
    """Multi-head softmax attention on packed head-minor qkv.

    ``qkv``: [b, n, 3*heads*d] — the raw Dense(3*h*d) output, packed in
    ``layout`` order: "s3hd" is the [b, n, 3, heads, d] reshape order (q
    block, then k, then v, heads-major within each; the default), "h3d" the
    [b, n, heads, 3, d] order (per-head q,k,v contiguous — the tensor-
    parallel layout, whose channel dim shards into whole-head groups).
    Returns [b, n, heads*d], heads-major, identically for both layouts.

    Dispatches to the fully-fused VMEM Pallas kernel (zero n^2 HBM traffic,
    real Pallas backward) when on TPU and the per-batch working set fits
    VMEM; otherwise falls back to the plain einsum formulation (identical
    math — equivalence-tested).
    """
    b, n, w3 = qkv.shape
    if layout not in LAYOUTS:
        raise ValueError(f"unknown qkv layout {layout!r}; pick from {LAYOUTS}")
    if w3 % (3 * heads):
        raise ValueError(f"qkv width {w3} is not 3*heads*d for heads={heads}")
    if (
        _on_tpu()
        and n % 8 == 0
        and (w3 // (3 * heads)) % 8 == 0
        and _vmem_attention_fits(n, w3, heads)
    ):
        return _vmem_attention(qkv, heads, layout)
    return _einsum_attention_qkv(qkv, heads, layout)


def _einsum_attention_qkv(
    qkv: jax.Array, heads: int, layout: str = "s3hd"
) -> jax.Array:
    """Reference math for ``fused_attention_qkv`` (and the off-TPU path):
    einsums contracted directly in [b, n, heads, d] — no head transpose."""
    b, n, w3 = qkv.shape
    d = w3 // (3 * heads)
    if layout == "h3d":
        x = qkv.reshape(b, n, heads, 3, d)
        q, k, v = x[..., 0, :], x[..., 1, :], x[..., 2, :]
    else:
        x = qkv.reshape(b, n, 3, heads, d)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, heads * d)
