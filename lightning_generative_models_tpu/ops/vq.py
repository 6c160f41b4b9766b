"""Pallas TPU kernel: fused VQ codebook nearest-neighbor lookup.

Computes ``argmin_k ||z_n - e_k||^2`` for a block of latents without ever
writing the [N, K] distance matrix to HBM: each grid program streams one
latent block into VMEM, forms the distance tile against the resident
codebook via one MXU matmul, and reduces to indices on the VPU.

The XLA path (modules/vector_quantizer.py `nearest_code_indices`) fuses well
already at the reference's sizes; this kernel exists for large-K/long-N
regimes and as the dispatch target of ``nearest_codes(..., use_pallas=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False


def _vq_kernel(z_ref, cb_ref, cb_sq_ref, out_ref):
    z = z_ref[...]  # [block_n, d]
    cb = cb_ref[...]  # [k, d]
    # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2; the z^2 term is row-constant
    # and cannot change the argmin, so it is dropped.
    scores = (
        -2.0 * jnp.dot(z, cb.T, preferred_element_type=jnp.float32)
        + cb_sq_ref[...]
    )
    out_ref[...] = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("block_n",))
def nearest_codes_pallas(
    flat: jax.Array, codebook: jax.Array, block_n: int = 2048
) -> jax.Array:
    """[N, D] latents x [K, D] codebook -> [N] int32 indices."""
    from jax.experimental import pallas as pl  # noqa: PLC0415

    n, d = flat.shape
    k = codebook.shape[0]
    block_n = min(block_n, max(8, 1 << (n - 1).bit_length()))
    pad_n = (-n) % block_n
    if pad_n:
        flat = jnp.pad(flat, ((0, pad_n), (0, 0)))
    cb_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]

    out = pl.pallas_call(
        _vq_kernel,
        grid=(flat.shape[0] // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], 1), jnp.int32),
        interpret=_INTERPRET,
    )(flat.astype(jnp.float32), codebook.astype(jnp.float32), cb_sq)
    return out[:n, 0]


# SPMD wrapper: under a mesh, the kernel runs independently per batch shard
# (codebook replicated) — latents are batch-sharded in data-parallel training,
# and the argmin is row-local, so no collective is needed.
from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


@custom_partitioning
def _nearest_codes_spmd(flat: jax.Array, codebook: jax.Array) -> jax.Array:
    return nearest_codes_pallas(flat, codebook)


def _infer_sharding(mesh, arg_infos, result_infos):
    spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
    return NamedSharding(mesh, P(spec[0] if len(spec) else None))


def _partition(mesh, arg_infos, result_infos):
    spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
    batch = spec[0] if len(spec) else None
    arg_shardings = (
        NamedSharding(mesh, P(batch, None)),
        NamedSharding(mesh, P()),  # codebook replicated
    )
    result_sharding = NamedSharding(mesh, P(batch))

    def impl(flat, codebook):
        return nearest_codes_pallas(flat, codebook)

    return mesh, impl, result_sharding, arg_shardings


_nearest_codes_spmd.def_partition(
    infer_sharding_from_operands=_infer_sharding,
    partition=_partition,
    sharding_rule="n d, k d -> n",  # Shardy: n follows the batch sharding
)


def nearest_codes(
    flat: jax.Array, codebook: jax.Array, use_pallas: bool = False
) -> jax.Array:
    """Dispatching front-end used by modules/vector_quantizer.py."""
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and 1024 <= flat.shape[0] <= 524288  # above ~512k XLA's fusion wins
        and flat.shape[1] % 8 == 0
        and codebook.shape[0] % 128 == 0
    ):
        # Indices are an argmin: piecewise-constant, zero gradient a.e.
        # custom_partitioning has NO differentiation rule, so a live tracer
        # reaching the wrapped call under jax.grad (the codebook is a
        # trainable param in every VQ model) raises NotImplementedError at
        # trace time; sever both inputs before the primitive binds.
        return _nearest_codes_spmd(
            jax.lax.stop_gradient(flat), jax.lax.stop_gradient(codebook)
        )
    from lightning_generative_models_tpu.models.modules.vector_quantizer import (
        nearest_code_indices,
    )

    return nearest_code_indices(flat, codebook)
