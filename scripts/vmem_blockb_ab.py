"""Interleaved A/B: fused VMEM attention with block_b=1 (r3 session-12 ship)
vs adaptive block_b (candidate). DiT-S/2 block shape: b=128, n=256, h=6, d=64.

Protocol: per-variant jitted fwd+bwd closure, interleaved reps, min over reps
of the mean segment time (shared-chip rule: interleave, take minima).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lightning_generative_models_tpu.ops.attention as A


def make_fn(heads):
    @jax.jit
    def fwd_bwd(qkv, g):
        def loss(q):
            return jnp.sum(A.fused_attention_qkv(q, heads) * g)

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

    orig = A._vmem_block_b
    picked = orig(b, n, 3 * hd, heads)
    print(f"adaptive block_b picks: {picked}", flush=True)

    variants = {}
    for bb in sorted({1, 2, picked}):
        A._vmem_block_b = lambda *a, _bb=bb: _bb
        # fresh jit cache per variant (different kernel constants)
        fn = make_fn(heads)
        # correctness guard vs XLA reference
        ref = jax.grad(
            lambda q: jnp.sum(
                A._einsum_attention_qkv(q.astype(jnp.float32), heads) * g
            )
        )(qkv.astype(jnp.float32))
        got = fn(qkv, g)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
            / (jnp.max(jnp.abs(ref)) + 1e-9)
        )
        variants[bb] = (fn, err)
    A._vmem_block_b = orig

    reps = {bb: [] for bb in variants}
    for rep in range(5):
        for bb, (fn, _) in variants.items():
            reps[bb].append(timeit(fn, qkv, g))
    for bb, (fn, err) in variants.items():
        t = min(reps[bb])
        print(
            f"block_b={bb}:  {t * 1e3:7.3f} ms/fwd+bwd   rel_err={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
