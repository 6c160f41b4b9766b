"""UNet ablation timings on the real TPU — where does the step time go?

Times the flagship DDPM path (bs128 CIFAR-shaped train step, bs64 DDIM-50
sampling chain, raw UNet forward) under targeted ablations (attention
stubbed out, GroupNorm stubbed out, f32 vs bf16 attention) to attribute the
step time before optimizing. Monkeypatching is used for ablations only —
nothing here ships.

Usage: python scripts/ablate_unet.py
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.models.modules import attention as attn_mod

BS_TRAIN = 128
BS_SAMPLE = 64


def _readback(out):
    """D2H scalar readback: the only real execution barrier through the
    tunneled PJRT backend (block_until_ready returns early there)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def _time(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)  # in-order queue: last-result readback implies all done
    return (time.perf_counter() - t0) / iters


def make_model(**kw):
    return DDPM(
        img_channels=3, img_size=32, dim=64, diffusion_timesteps=1000,
        sampling_timesteps=50, use_bf16=True, **kw,
    )


def bench_forward(model, label):
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    params = state.params["model"]
    x = jnp.zeros((BS_TRAIN, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BS_TRAIN,), jnp.int32)
    fwd = jax.jit(lambda p, x, t: model.unet.apply({"params": p}, x, t))
    dt = _time(fwd, params, x, t)
    print(f"{label:42s} fwd  {dt*1e3:8.3f} ms  {BS_TRAIN/dt:10.0f} img/s")
    return dt


def bench_train(model, label):
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    batch = {
        "image": jnp.zeros((BS_TRAIN, 32, 32, 3), jnp.uint8),
        "label": jnp.zeros((BS_TRAIN,), jnp.int32),
    }
    step = jax.jit(model.train_step)
    # non-donated variant for repeat timing
    def run(s):
        s2, m = step(s, batch, rng)
        return m["train_loss"]
    dt = _time(run, state, iters=10)
    print(f"{label:42s} step {dt*1e3:8.3f} ms  {BS_TRAIN/dt:10.0f} img/s")
    return dt


def bench_sample(model, label):
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    fn = jax.jit(lambda s, r: model.sample(s, r, BS_SAMPLE))
    dt = _time(fn, state, rng, iters=3, warmup=1)
    print(f"{label:42s} ddim50 {dt*1e3:6.1f} ms  {BS_SAMPLE/dt:8.1f} samples/s")
    return dt


@contextmanager
def patched(obj, name, value):
    old = getattr(obj, name)
    setattr(obj, name, value)
    try:
        yield
    finally:
        setattr(obj, name, old)


def main(stages):
    import flax.linen as nn

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def id_call(self, x):
        return jnp.zeros_like(x)

    def gn_id(self, x):
        return x.astype(jnp.float32)

    if "fwd" in stages:
        base_fwd = bench_forward(make_model(), "baseline bf16")
        with patched(attn_mod.Attention, "__call__", id_call), \
             patched(attn_mod.LinearAttention, "__call__", id_call):
            fa = bench_forward(make_model(), "no attention")
        with patched(nn.GroupNorm, "__call__", gn_id):
            fg = bench_forward(make_model(), "no groupnorm")
        with patched(attn_mod.Attention, "__call__", id_call), \
             patched(attn_mod.LinearAttention, "__call__", id_call), \
             patched(nn.GroupNorm, "__call__", gn_id):
            fb = bench_forward(make_model(), "no attn + no gn (convs only)")
        print("attribution (fwd):")
        print(f"  attention share : {(base_fwd-fa)/base_fwd*100:5.1f}%")
        print(f"  groupnorm share : {(base_fwd-fg)/base_fwd*100:5.1f}%")
        print(f"  conv-only floor : {fb/base_fwd*100:5.1f}% of baseline", flush=True)

    if "f32" in stages:
        m32 = DDPM(img_channels=3, img_size=32, dim=64, diffusion_timesteps=1000,
                   sampling_timesteps=50, use_bf16=False)
        bench_forward(m32, "all f32")

    if "train" in stages:
        base_train = bench_train(make_model(), "baseline bf16")
        with patched(attn_mod.Attention, "__call__", id_call), \
             patched(attn_mod.LinearAttention, "__call__", id_call):
            ta = bench_train(make_model(), "no attention")
        with patched(nn.GroupNorm, "__call__", gn_id):
            tg = bench_train(make_model(), "no groupnorm")
        print("attribution (train step):")
        print(f"  attention share : {(base_train-ta)/base_train*100:5.1f}%")
        print(f"  groupnorm share : {(base_train-tg)/base_train*100:5.1f}%", flush=True)

    if "split" in stages:
        # Split the attention share: full Attention (mid + innermost) vs
        # LinearAttention (outer stages), train step.
        base = bench_train(make_model(), "baseline bf16")
        with patched(attn_mod.Attention, "__call__", id_call):
            tf = bench_train(make_model(), "no full attention")
        with patched(attn_mod.LinearAttention, "__call__", id_call):
            tl = bench_train(make_model(), "no linear attention")
        print("attribution (train step):")
        print(f"  full-attn share   : {(base-tf)/base*100:5.1f}%")
        print(f"  linear-attn share : {(base-tl)/base*100:5.1f}%", flush=True)

    if "sample" in stages:
        bench_sample(make_model(), "baseline bf16")

    if "base" in stages:
        # Robust baseline: median of repeated interleaved measurements
        # (the tunneled TPU shows multi-ms contention spikes).
        import numpy as np

        model = make_model()
        rng = jax.random.PRNGKey(0)
        state = jax.jit(model.init_state)(rng)
        params = state.params["model"]
        x = jnp.zeros((BS_TRAIN, 32, 32, 3), jnp.float32)
        t = jnp.zeros((BS_TRAIN,), jnp.int32)
        fwd = jax.jit(lambda p, x, t: model.unet.apply({"params": p}, x, t))
        batch = {
            "image": jnp.zeros((BS_TRAIN, 32, 32, 3), jnp.uint8),
            "label": jnp.zeros((BS_TRAIN,), jnp.int32),
        }
        step = jax.jit(model.train_step)
        run_step = lambda s: step(s, batch, rng)[1]["train_loss"]
        fwd_ts, step_ts = [], []
        for rep in range(5):
            fwd_ts.append(_time(fwd, params, x, t, iters=20, warmup=2))
            step_ts.append(_time(run_step, state, iters=10, warmup=2))
        fm = float(np.median(fwd_ts)) * 1e3
        sm = float(np.median(step_ts)) * 1e3
        print(f"median-of-5  fwd  {fm:8.3f} ms  {BS_TRAIN/fm*1e3:10.0f} img/s"
              f"   (all: {[round(v*1e3,2) for v in fwd_ts]})")
        print(f"median-of-5  step {sm:8.3f} ms  {BS_TRAIN/sm*1e3:10.0f} img/s"
              f"   (all: {[round(v*1e3,2) for v in step_ts]})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["fwd"])
