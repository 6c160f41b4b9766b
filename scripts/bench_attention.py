"""Per-shape microbenchmarks: fused Pallas linear attention vs XLA, and the
full-attention block, at the flagship UNet's stage shapes (bs128).

Usage: python scripts/bench_attention.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lightning_generative_models_tpu.ops.linear_attention as FLA
from lightning_generative_models_tpu.models.modules.attention import Attention


def _time(fn, *args, iters=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    return (time.perf_counter() - t0) / iters


def args_for(n, c, b=128, heads=4, dim_head=32, m=4, dtype=jnp.bfloat16):
    rng = jax.random.PRNGKey(0)
    hd = heads * dim_head
    mk = lambda i, shape, dt=jnp.float32: jax.random.normal(
        jax.random.fold_in(rng, i), shape, dt)
    x = mk(0, (b, n, c), dtype)
    return (x, mk(1, (c,)), mk(2, (c, 3 * hd)), mk(3, (2, heads, dim_head, m)),
            mk(4, (hd, c)), mk(5, (c,)), mk(6, (c,)))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    b = 128
    for n, c in [(1024, 64), (256, 128), (64, 256)]:
        a = args_for(n, c, b=b)
        xla = jax.jit(lambda *a: FLA.linear_attention_xla(
            *a, heads=4, dim_head=32, dtype=jnp.bfloat16))
        fused = jax.jit(lambda *a: FLA.fused_linear_attention(
            *a, 4, 32, jnp.bfloat16))
        t_x = _time(xla, *a)
        t_f = _time(fused, *a)
        print(f"linear n={n:5d} c={c:4d}  xla {t_x*1e6:7.1f} us   "
              f"pallas {t_f*1e6:7.1f} us   ({t_x/t_f:4.2f}x)", flush=True)

    # full attention at the innermost resolution
    for n_side, c in [(4, 512)]:
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (b, n_side, n_side, c), jnp.bfloat16)
        mod = Attention(c, dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(2), x)["params"]
        f = jax.jit(lambda p, x: mod.apply({"params": p}, x))
        t = _time(f, params, x)
        print(f"full   n={n_side*n_side:5d} c={c:4d}  {t*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
