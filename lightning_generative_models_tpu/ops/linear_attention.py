"""Fused linear-attention block as a Pallas TPU kernel.

The UNet's linear attention (reference models/generative/diffusion/ddpm.py:
203-239: RMSNorm -> qkv 1x1 conv -> q/k softmaxes + memory KV -> two small
einsums -> out 1x1 conv -> RMSNorm) is entirely memory-bound at the
reference's resolutions: round-2 profiling attributed ~40% of the UNet
forward to it, with arithmetic intensity far below the MXU roofline because
XLA materializes every intermediate ([b,n,3,h,d] splits, f32 softmax
round-trips) in HBM.

This kernel computes the WHOLE block inside VMEM: one program reads a
[rows, n, c] slab of batch rows and the (grid-constant) weights, and writes
the matching output slab — HBM traffic collapses to one activation read +
one write. Token-wise stages run on the flattened [rows*n, ...] view;
per-row softmax statistics and context contractions use 3D reshapes and
batched dot_general. rows is a per-shape tuned constant (_rows_per_step).

TPU-first head math: heads*dim_head = hd stays packed in the 128-lane
dimension end-to-end. Per-head contractions become single [hd, hd] MXU
matmuls with a block-diagonal mask selecting the per-head blocks:

    context_full = ks^T @ vcat            # [hd, hd], one MXU tile
    context      = context_full * blockdiag(heads)
    out_attn     = qs @ context           # [n, hd]

which does 4x the strictly-needed head FLOPs but in perfectly-shaped
(K=n, 128x128) matmuls — far faster than 4 separate [32, 32] contractions
that fill 6% of the MXU.

Softmax stabilizers: the q softmax is per-head (32-lane segments) and is
stabilized by the TRUE per-head max (unrolled lane-slice maxes). An earlier
row-global stabilizer was numerically wrong across heads: when one head's
logits sat far enough (~88) below another's, exp underflowed across that
head's whole segment and the segment sum became 0 -> 0/0 NaN on TPU only
(the XLA oracle uses per-head maxes). Segment sums are MXU matmuls against
a [hd, heads] 0/1 segment matrix.

Gradients: ``fused_linear_attention`` is a ``jax.custom_vjp`` whose backward
is a second Pallas kernel (``_bwd_kernel``): it recomputes the forward
intermediates in VMEM (activations are never spilled as residuals) and emits
dx per program plus weight gradients accumulated across the sequential grid
(TPU grid steps run in order; constant-index output blocks stay resident in
VMEM, the standard Pallas accumulation pattern). ``linear_attention_xla`` is
the CPU path and the parity oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flip for kernel debugging on CPU

_EPS = 1e-12


# ---------------------------------------------------------------------------
# XLA composition (CPU path, gradient path, and the parity oracle in tests)
# ---------------------------------------------------------------------------

def _rmsnorm(x: jax.Array, g: jax.Array, dim: int) -> jax.Array:
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.sum(x32**2, axis=-1, keepdims=True) + _EPS)
    return (normed * g * (dim**0.5)).astype(x.dtype)


def linear_attention_xla(
    x: jax.Array,           # [b, n, c]
    g0: jax.Array,          # [c]
    qkv_kernel: jax.Array,  # [c, 3*h*d]
    mem_kv: jax.Array,      # [2, heads, d, m]
    out_kernel: jax.Array,  # [h*d, c]
    out_bias: jax.Array,    # [c]
    g1: jax.Array,          # [c]
    heads: int,
    dim_head: int,
    dtype: jnp.dtype,
    residual: bool = False,
) -> jax.Array:
    b, n, c = x.shape
    hd = heads * dim_head
    m = mem_kv.shape[-1]

    xn = _rmsnorm(x.astype(dtype), g0, c)
    qkv = (xn @ qkv_kernel.astype(dtype)).reshape(b, n, 3, heads, dim_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, h, d]

    mk, mv = (
        jnp.broadcast_to(
            mem_kv[i].transpose(2, 0, 1)[None].astype(dtype),
            (b, m, heads, dim_head),
        )
        for i in range(2)
    )
    k = jnp.concatenate([mk, k], axis=1)
    v = jnp.concatenate([mv, v], axis=1)

    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * (dim_head**-0.5)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
    q = q.astype(dtype)
    k = k.astype(dtype)

    context = jnp.einsum(
        "bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    out = jnp.einsum(
        "bhde,bnhd->bnhe", context, q, preferred_element_type=jnp.float32
    ).astype(dtype)
    out = out.reshape(b, n, hd)
    out = out @ out_kernel.astype(dtype) + out_bias.astype(dtype)
    out = _rmsnorm(out, g1, c)
    return out + x.astype(out.dtype) if residual else out


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _head_softmax(q, heads: int, dim_head: int):
    """Per-head softmax over the feature lanes of q [N, heads*dim_head].

    Stabilized by the true per-head max (unrolled static lane slices —
    cheap: heads is 4). A row-global max is NOT a valid stabilizer here:
    if one head's logits sit ~88 below the row max, exp underflows across
    that head's entire 32-lane segment and the segment sum hits 0/0.
    """
    hd = heads * dim_head
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0) // dim_head
        == jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    ).astype(jnp.float32)                                  # [hd, heads]
    qmax = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.max(q[:, h * dim_head:(h + 1) * dim_head],
                        axis=-1, keepdims=True),
                (q.shape[0], dim_head),
            )
            for h in range(heads)
        ],
        axis=-1,
    )                                                      # [N, hd]
    qe = jnp.exp(q - qmax)
    seg_sum = jnp.dot(qe, seg, preferred_element_type=jnp.float32)
    denom = jnp.dot(seg_sum, seg.T, preferred_element_type=jnp.float32)
    return qe / denom, seg


def _rows_per_step(b: int, n: int, target_tokens: int) -> int:
    """Batch rows per grid step.

    Tuned on TPU v5e with interleaved medians (scripts/bench_attention.py
    and a rows sweep): the kernel is VPU-bound, so per-grid-step fixed cost
    is small and blocking pays only on a few shapes (~10-25% there). rows
    is capped so the per-step f32 working set stays well under Mosaic's
    16 MB scoped-VMEM stack limit (observed OOM at ~25 MB).
    target_tokens doubles as the fwd(4096)/bwd(2048) discriminator.
    """
    if target_tokens >= 4096:  # forward
        r = 4 if n >= 512 else (2 if n >= 256 else 1)
        r = max(1, min(r, 4096 // max(n, 1)))
    else:  # backward (larger working set; wins only at mid-size n)
        r = 4 if 64 <= n <= 256 else 1
    r = min(r, b)
    while b % r:
        r -= 1
    return r


def _kernel(
    x_ref, g0_ref, wqkv_ref, memk_ref, memv_ref, wo_ref, bo_ref, g1_ref,
    o_ref, *, heads: int, dim_head: int, n: int, c: int, m: int, rows: int,
    compute_dtype, residual: bool,
):
    hd = heads * dim_head
    inv_sqrt_d = dim_head**-0.5
    R = rows
    N = R * n  # tokens in this step's block

    # Token-wise stages run on the flattened [N, ...] view: batch rows only
    # matter for the k-softmax statistics and the context contractions.
    x = x_ref[:].reshape(N, c).astype(jnp.float32)         # [N, c]
    g0 = g0_ref[0].astype(jnp.float32)                     # [1, c] row
    r0 = jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)
    xn = (x * r0 * (g0 * (c**0.5))).astype(compute_dtype)  # [N, c]

    wqkv = wqkv_ref[:].astype(compute_dtype)               # [c, 3hd]
    p = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)  # [N, 3hd]
    q = p[:, :hd]
    k = p[:, hd:2 * hd]
    v = p[:, 2 * hd:]

    # q softmax per 32-lane head segment, per-head-max stabilized.
    pq, _ = _head_softmax(q, heads, dim_head)
    qs = (pq * inv_sqrt_d).astype(compute_dtype)           # [N, hd]

    # k softmax over each batch row's tokens incl. memory tokens. The mem
    # contribution is merged analytically (shared stabilizer + summed
    # normalizer) instead of concatenating on the sublane axis.
    memk = memk_ref[:].astype(jnp.float32)                  # [m, hd]
    memv = memv_ref[:].astype(jnp.float32)                  # [m, hd]
    k3 = k.reshape(R, n, hd)
    kmax = jnp.maximum(
        jnp.max(k3, axis=1), jnp.max(memk, axis=0)[None]
    )                                                       # [R, hd]
    ke3 = jnp.exp(k3 - kmax[:, None, :])                    # [R, n, hd]
    me3 = jnp.exp(memk[None] - kmax[:, None, :])            # [R, m, hd]
    z = jnp.sum(ke3, axis=1) + jnp.sum(me3, axis=1)         # [R, hd]

    # Per-head contractions as full [hd, hd] MXU tiles + block-diagonal mask,
    # batched over the step's R rows; dot_general contracts the token
    # (sublane) axis directly — nothing is materialized transposed.
    blockdiag = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
        == jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    ).astype(jnp.float32)
    v3 = v.reshape(R, n, hd).astype(compute_dtype)
    bcontract_tok = (((1,), (1,)), ((0,), (0,)))            # contract tokens
    memv3 = jnp.broadcast_to(
        memv.astype(compute_dtype)[None], (R, m, hd))
    context = (
        jax.lax.dot_general(
            ke3.astype(compute_dtype), v3, bcontract_tok,
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            me3.astype(compute_dtype), memv3, bcontract_tok,
            preferred_element_type=jnp.float32,
        )
    ) * (blockdiag[None] / z[:, :, None])                   # [R, hd, hd]
    qs3 = qs.reshape(R, n, hd)
    out_attn = jax.lax.dot_general(
        qs3, context.astype(compute_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(N, hd)                                        # [N, hd]

    wo = wo_ref[:].astype(compute_dtype)
    y = jnp.dot(
        out_attn.astype(compute_dtype), wo, preferred_element_type=jnp.float32
    ) + bo_ref[0].astype(jnp.float32)                       # [N, c]

    g1 = g1_ref[0].astype(jnp.float32)
    r1 = jax.lax.rsqrt(jnp.sum(y * y, axis=-1, keepdims=True) + _EPS)
    out = y * r1 * (g1 * (c**0.5))
    if residual:
        out = out + x
    o_ref[:] = out.reshape(R, n, c).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "compute_dtype", "residual")
)
def _pallas_forward(
    x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
    heads: int, dim_head: int, compute_dtype, residual: bool = False,
):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, n, c = x.shape
    hd = heads * dim_head
    m = mem_kv.shape[-1]

    # [2, h, d, m] -> [m, hd] rows (h-major lanes, matching the qkv split).
    memk = mem_kv[0].transpose(2, 0, 1).reshape(m, hd)
    memv = mem_kv[1].transpose(2, 0, 1).reshape(m, hd)

    rows = _rows_per_step(b, n, target_tokens=4096)
    kern = functools.partial(
        _kernel, heads=heads, dim_head=dim_head, n=n, c=c, m=m, rows=rows,
        compute_dtype=compute_dtype, residual=residual,
    )
    return pl.pallas_call(
        kern,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * hd), lambda i: (0, 0)),
            pl.BlockSpec((m, hd), lambda i: (0, 0)),
            pl.BlockSpec((m, hd), lambda i: (0, 0)),
            pl.BlockSpec((hd, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=_INTERPRET,
    )(
        x, g0.reshape(1, c), qkv_kernel, memk, memv,
        out_kernel, out_bias.reshape(1, c), g1.reshape(1, c),
    )


# ---------------------------------------------------------------------------
# Pallas backward kernel (recompute-in-VMEM; sequential-grid weight grads)
# ---------------------------------------------------------------------------

def _bwd_kernel(
    x_ref, g0_ref, wqkv_ref, memk_ref, memv_ref, wo_ref, bo_ref, g1_ref,
    dout_ref,
    dx_ref, dw_ref, dmemk_ref, dmemv_ref, dwo_ref, dbo_ref, dg0_ref, dg1_ref,
    *, heads: int, dim_head: int, n: int, c: int, m: int, rows: int,
    compute_dtype, residual: bool,
):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    hd = heads * dim_head
    inv_sqrt_d = dim_head**-0.5
    R = rows
    N = R * n
    contract0 = (((0,), (0,)), ((), ()))   # A^T @ B
    contract1 = (((1,), (1,)), ((), ()))   # A @ B^T
    bcontract_tok = (((1,), (1,)), ((0,), (0,)))   # batched, contract tokens

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dmemk_ref[:] = jnp.zeros_like(dmemk_ref)
        dmemv_ref[:] = jnp.zeros_like(dmemv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dg0_ref[:] = jnp.zeros_like(dg0_ref)
        dg1_ref[:] = jnp.zeros_like(dg1_ref)

    # ---- recompute forward (same math as _kernel) -------------------------
    x = x_ref[:].reshape(N, c).astype(jnp.float32)
    g0 = g0_ref[0].astype(jnp.float32)
    sqrt_c = c**0.5
    r0 = jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)
    xn32 = x * r0 * (g0 * sqrt_c)
    xn = xn32.astype(compute_dtype)

    wqkv = wqkv_ref[:].astype(compute_dtype)
    p = jnp.dot(xn, wqkv, preferred_element_type=jnp.float32)
    q = p[:, :hd]
    k = p[:, hd:2 * hd]
    v = p[:, 2 * hd:]

    pq, seg = _head_softmax(q, heads, dim_head)
    qs = (pq * inv_sqrt_d).astype(compute_dtype)

    memk = memk_ref[:].astype(jnp.float32)
    memv = memv_ref[:].astype(jnp.float32)
    k3 = k.reshape(R, n, hd)
    kmax = jnp.maximum(jnp.max(k3, axis=1), jnp.max(memk, axis=0)[None])
    ke3 = jnp.exp(k3 - kmax[:, None, :])                    # [R, n, hd]
    me3 = jnp.exp(memk[None] - kmax[:, None, :])            # [R, m, hd]
    z = jnp.sum(ke3, axis=1) + jnp.sum(me3, axis=1)         # [R, hd]

    blockdiag = (
        jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
        == jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    ).astype(jnp.float32)
    v3 = v.reshape(R, n, hd).astype(compute_dtype)
    ke3c = ke3.astype(compute_dtype)
    me3c = me3.astype(compute_dtype)
    memv3 = jnp.broadcast_to(memv.astype(compute_dtype)[None], (R, m, hd))
    u_masked = (
        jax.lax.dot_general(
            ke3c, v3, bcontract_tok, preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            me3c, memv3, bcontract_tok, preferred_element_type=jnp.float32,
        )
    ) * blockdiag[None]                                     # U, [R, hd, hd]
    zcol = z[:, :, None]                                    # [R, hd, 1]
    context = u_masked / zcol                               # C, [R, hd, hd]
    qs3 = qs.reshape(R, n, hd)
    contextc = context.astype(compute_dtype)
    a3 = jax.lax.dot_general(
        qs3, contextc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [R, n, hd]
    a = a3.reshape(N, hd)

    wo = wo_ref[:].astype(compute_dtype)
    y = jnp.dot(
        a.astype(compute_dtype), wo, preferred_element_type=jnp.float32
    ) + bo_ref[0].astype(jnp.float32)
    g1 = g1_ref[0].astype(jnp.float32)
    r1 = jax.lax.rsqrt(jnp.sum(y * y, axis=-1, keepdims=True) + _EPS)

    # ---- backward ----------------------------------------------------------
    dout = dout_ref[:].reshape(N, c).astype(jnp.float32)

    # RMSNorm2: out = y * r1 * (g1 * sqrt_c)
    u1 = dout * (g1 * sqrt_c)
    dy = u1 * r1 - y * (r1**3) * jnp.sum(u1 * y, axis=-1, keepdims=True)
    dg1_ref[:] += jnp.sum(dout * y * r1, axis=0, keepdims=True) * sqrt_c

    dyc = dy.astype(compute_dtype)
    dwo_ref[:] += jax.lax.dot_general(
        a.astype(compute_dtype), dyc, contract0,
        preferred_element_type=jnp.float32,
    )
    dbo_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        dyc, wo, contract1, preferred_element_type=jnp.float32
    )                                                       # [N, hd]

    da3 = da.reshape(R, n, hd).astype(compute_dtype)
    dqs3 = jax.lax.dot_general(
        da3, contextc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [R, n, hd]
    dcontext = jax.lax.dot_general(
        qs3, da3, bcontract_tok, preferred_element_type=jnp.float32,
    )                                                       # [R, hd(d), hd(e)]

    # C = U_masked / z (z broadcasts along e)
    du3 = dcontext * blockdiag[None] / zcol
    dz = -jnp.sum(dcontext * context, axis=2) / z           # [R, hd]

    du3c = du3.astype(compute_dtype)
    dke3 = jax.lax.dot_general(
        v3, du3c, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + dz[:, None, :]                                      # [R, n, hd(d)]
    dv3 = jax.lax.dot_general(
        ke3c, du3c, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [R, n, hd(e)]
    dme3 = jax.lax.dot_general(
        memv3, du3c, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + dz[:, None, :]                                      # [R, m, hd(d)]
    dmv3 = jax.lax.dot_general(
        me3c, du3c, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [R, m, hd(e)]

    # ke = exp(k - kmax): softmax stabilizer has exactly-zero gradient.
    dk = (ke3 * dke3).reshape(N, hd)
    dmemk_ref[:] += jnp.sum(me3 * dme3, axis=0)
    dmemv_ref[:] += jnp.sum(dmv3, axis=0)

    # q segment softmax: qs = softmax_seg(q) * s
    dp_q = dqs3.reshape(N, hd) * inv_sqrt_d
    tmp = jnp.dot(dp_q * pq, seg, preferred_element_type=jnp.float32)  # [N, h]
    dq = pq * dp_q - pq * jnp.dot(
        tmp, seg.T, preferred_element_type=jnp.float32
    )

    dp = jnp.concatenate([dq, dk, dv3.reshape(N, hd)], axis=-1)  # [N, 3hd]
    dpc = dp.astype(compute_dtype)
    dxn = jax.lax.dot_general(
        dpc, wqkv, contract1, preferred_element_type=jnp.float32
    )                                                       # [N, c]
    dw_ref[:] += jax.lax.dot_general(
        xn, dpc, contract0, preferred_element_type=jnp.float32
    )

    # RMSNorm1: xn = x * r0 * (g0 * sqrt_c)
    u0 = dxn * (g0 * sqrt_c)
    dx = u0 * r0 - x * (r0**3) * jnp.sum(u0 * x, axis=-1, keepdims=True)
    dg0_ref[:] += jnp.sum(dxn * x * r0, axis=0, keepdims=True) * sqrt_c
    if residual:
        dx = dx + dout
    dx_ref[:] = dx.reshape(R, n, c).astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "compute_dtype", "residual")
)
def _pallas_backward(
    x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, dout,
    heads: int, dim_head: int, compute_dtype, residual: bool = False,
):
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, n, c = x.shape
    hd = heads * dim_head
    m = mem_kv.shape[-1]
    memk = mem_kv[0].transpose(2, 0, 1).reshape(m, hd)
    memv = mem_kv[1].transpose(2, 0, 1).reshape(m, hd)

    rows = _rows_per_step(b, n, target_tokens=2048)
    kern = functools.partial(
        _bwd_kernel, heads=heads, dim_head=dim_head, n=n, c=c, m=m, rows=rows,
        compute_dtype=compute_dtype, residual=residual,
    )
    full = lambda *s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s))
    out_shapes = (
        jax.ShapeDtypeStruct((b, n, c), x.dtype),          # dx
        jax.ShapeDtypeStruct((c, 3 * hd), jnp.float32),    # dW
        jax.ShapeDtypeStruct((m, hd), jnp.float32),        # dmemk
        jax.ShapeDtypeStruct((m, hd), jnp.float32),        # dmemv
        jax.ShapeDtypeStruct((hd, c), jnp.float32),        # dWo
        jax.ShapeDtypeStruct((1, c), jnp.float32),         # dbo
        jax.ShapeDtypeStruct((1, c), jnp.float32),         # dg0
        jax.ShapeDtypeStruct((1, c), jnp.float32),         # dg1
    )
    dx, dw, dmemk, dmemv, dwo, dbo, dg0, dg1 = pl.pallas_call(
        kern,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, n, c), lambda i: (i, 0, 0)),
            full(1, c),
            full(c, 3 * hd),
            full(m, hd),
            full(m, hd),
            full(hd, c),
            full(1, c),
            full(1, c),
            pl.BlockSpec((rows, n, c), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows, n, c), lambda i: (i, 0, 0)),
            full(c, 3 * hd),
            full(m, hd),
            full(m, hd),
            full(hd, c),
            full(1, c),
            full(1, c),
            full(1, c),
        ),
        out_shape=out_shapes,
        interpret=_INTERPRET,
    )(
        x, g0.reshape(1, c), qkv_kernel, memk, memv,
        out_kernel, out_bias.reshape(1, c), g1.reshape(1, c), dout,
    )

    # [m, hd] -> [h, d, m] each; stack to the module's mem_kv layout.
    dmem = jnp.stack([
        dmemk.reshape(m, heads, dim_head).transpose(1, 2, 0),
        dmemv.reshape(m, heads, dim_head).transpose(1, 2, 0),
    ])
    return (
        dx,
        dg0.reshape(c).astype(g0.dtype),
        dw.astype(qkv_kernel.dtype),
        dmem.astype(mem_kv.dtype),
        dwo.astype(out_kernel.dtype),
        dbo.reshape(c).astype(out_bias.dtype),
        dg1.reshape(c).astype(g1.dtype),
    )


# ---------------------------------------------------------------------------
# custom_vjp: Pallas forward, Pallas backward (exact gradients)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# SPMD partitioning: under a mesh the kernel runs independently per batch
# shard (weights grid-constant/replicated); the backward's weight gradients
# are partial sums that need one psum over the batch axis. Without this,
# GSPMD treats the custom call as opaque and all-gathers the batch.
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import (  # noqa: E402
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from lightning_generative_models_tpu.ops.common import (  # noqa: E402
    batch_axes as _batch_axes,
    on_tpu as _on_tpu,
)


_FWD_RULE = "b n c, c, c q, t h d m, e c, c, c -> b n c"
_BWD_RULE = (
    "b n c, c, c q, t h d m, e c, c, c, b n c "
    "-> b n c, c, c q, t h d m, e c, c, c"
)


@functools.lru_cache(maxsize=None)
def _spmd_forward(heads: int, dim_head: int, dtype, residual: bool):
    @custom_partitioning
    def fwd(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1):
        return _pallas_forward(
            x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
            heads, dim_head, dtype, residual,
        )

    def infer(mesh, arg_infos, result_infos):
        return NamedSharding(mesh, P(_batch_axes(arg_infos[0]), None, None))

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_axes(arg_infos[0])
        rep = lambda nd: NamedSharding(mesh, P(*([None] * nd)))
        arg_sh = (
            NamedSharding(mesh, P(batch, None, None)),
            rep(1), rep(2), rep(4), rep(2), rep(1), rep(1),
        )
        res_sh = NamedSharding(mesh, P(batch, None, None))

        def impl(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1):
            return _pallas_forward(
                x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
                heads, dim_head, dtype, residual,
            )

        return mesh, impl, res_sh, arg_sh

    fwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=_FWD_RULE,
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _spmd_backward(heads: int, dim_head: int, dtype, residual: bool):
    @custom_partitioning
    def bwd(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, dout):
        return _pallas_backward(
            x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, dout,
            heads, dim_head, dtype, residual,
        )

    def infer(mesh, arg_infos, result_infos):
        batch = _batch_axes(arg_infos[0])
        rep = lambda nd: NamedSharding(mesh, P(*([None] * nd)))
        return (
            NamedSharding(mesh, P(batch, None, None)),  # dx
            rep(1), rep(2), rep(4), rep(2), rep(1), rep(1),
        )

    def partition(mesh, arg_infos, result_infos):
        batch = _batch_axes(arg_infos[0])
        rep = lambda nd: NamedSharding(mesh, P(*([None] * nd)))
        arg_sh = (
            NamedSharding(mesh, P(batch, None, None)),
            rep(1), rep(2), rep(4), rep(2), rep(1), rep(1),
            NamedSharding(mesh, P(batch, None, None)),
        )
        res_sh = (
            NamedSharding(mesh, P(batch, None, None)),
            rep(1), rep(2), rep(4), rep(2), rep(1), rep(1),
        )

        def impl(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, dout):
            dx, dg0, dw, dmem, dwo, dbo, dg1 = _pallas_backward(
                x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, dout,
                heads, dim_head, dtype, residual,
            )
            if batch is not None:
                ps = lambda t: jax.lax.psum(t, batch)
                dg0, dw, dmem, dwo, dbo, dg1 = (
                    ps(dg0), ps(dw), ps(dmem), ps(dwo), ps(dbo), ps(dg1))
            return dx, dg0, dw, dmem, dwo, dbo, dg1

        return mesh, impl, res_sh, arg_sh

    bwd.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=_BWD_RULE,
    )
    return bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_linear_attention(
    x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
    heads: int, dim_head: int, dtype=jnp.float32, residual: bool = False,
):
    return _spmd_forward(heads, dim_head, dtype, residual)(
        x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
    )


def _fla_fwd(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
             heads, dim_head, dtype, residual):
    out = _spmd_forward(heads, dim_head, dtype, residual)(
        x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
    )
    return out, (x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1)


def _fla_bwd(heads, dim_head, dtype, residual, res, g):
    x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1 = res
    dx, dg0, dw, dmem, dwo, dbo, dg1 = _spmd_backward(
        heads, dim_head, dtype, residual
    )(x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1, g)
    return dx, dg0, dw, dmem, dwo, dbo, dg1


fused_linear_attention.defvjp(_fla_fwd, _fla_bwd)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _fused_path_fits(b: int, n: int, c: int, hd: int) -> bool:
    """VMEM gate for the fused kernel: bound the LARGER of the forward and
    backward per-grid-step working sets by Mosaic's ~16 MB scoped-VMEM stack
    limit (OOM observed at ~25 MB estimated). The backward picks rows
    independently and holds a bigger live set (recomputed activations,
    d-buffers, [hd,hd] context/grad blocks); gating on the forward alone
    let untuned shapes (e.g. n=4096 single-row) pass and then compile-fail
    at runtime with no fallback."""
    rows_f = _rows_per_step(b, n, target_tokens=4096)
    rows_b = _rows_per_step(b, n, target_tokens=2048)
    fwd_bytes = rows_f * n * (c + 7 * hd) * 4
    bwd_bytes = rows_b * n * (6 * c + 15 * hd) * 4 + 4 * rows_b * hd * hd * 4
    return max(fwd_bytes, bwd_bytes) < 16 * 1024 * 1024


def linear_attention(
    x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
    heads: int, dim_head: int, dtype=jnp.float32,
    use_pallas: bool = True, residual: bool = False,
) -> jax.Array:
    """Fused Pallas path on TPU (VMEM-resident block), XLA elsewhere."""
    b, n, c = x.shape
    hd = heads * dim_head
    if use_pallas and (_on_tpu() or _INTERPRET) and hd % 128 == 0 \
            and _fused_path_fits(b, n, c, hd):
        return fused_linear_attention(
            x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
            heads, dim_head, dtype, residual,
        )
    return linear_attention_xla(
        x, g0, qkv_kernel, mem_kv, out_kernel, out_bias, g1,
        heads=heads, dim_head=dim_head, dtype=dtype, residual=residual,
    )
