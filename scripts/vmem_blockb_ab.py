"""Fused VMEM attention op bench at the DiT-S/2 block shape
(b=128, n=256, h=6, d=64): Pallas kernel vs the einsum reference,
fwd+bwd, interleaved min-over-reps (shared-chip protocol).

History: also used for the block_b batching A/B (negative, ROUND3.md
session 13) and the bf16-MXU-operand A/B (session 14).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lightning_generative_models_tpu.ops.attention as A


def make_fn(impl, heads):
    @jax.jit
    def fwd_bwd(qkv, g):
        def loss(q):
            return jnp.sum(impl(q, heads) * g)

        return jax.grad(loss)(qkv)

    return fwd_bwd


def timeit(fn, qkv, g, iters=50):
    out = fn(qkv, g)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(qkv, g)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    b, n, heads, d = 128, 256, 6, 64
    hd = heads * d
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (b, n, 3 * hd), jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(rng, 1), (b, n, hd), jnp.bfloat16)

    # f32 einsum reference for the error column
    ref = jax.jit(
        jax.grad(
            lambda q: jnp.sum(
                A._einsum_attention_qkv(q.astype(jnp.float32), heads)
                * g.astype(jnp.float32)
            )
        )
    )(qkv.astype(jnp.float32))
    refmax = float(jnp.max(jnp.abs(ref)))

    variants = {
        "pallas": make_fn(A.fused_attention_qkv, heads),
        "einsum": make_fn(A._einsum_attention_qkv, heads),
    }
    errs = {}
    for name, fn in variants.items():
        got = fn(qkv, g).astype(jnp.float32)
        errs[name] = float(jnp.max(jnp.abs(got - ref))) / (refmax + 1e-9)

    reps = {name: [] for name in variants}
    for _ in range(5):
        for name, fn in variants.items():
            reps[name].append(timeit(fn, qkv, g))
    for name in variants:
        t = min(reps[name])
        print(
            f"{name}:  {t * 1e3:7.3f} ms/fwd+bwd   rel_err={errs[name]:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
