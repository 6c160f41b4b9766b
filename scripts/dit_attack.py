"""DiT-S/2 train-step attack: interleaved A/B variants on the real TPU.

Fresh profile of the shipped step (experiments/DiT/profile_r3, bs128,
~74 ms/step): XLA:TPU auto-rewrites the einsum softmax attention into its
own fused flash kernel (`tpu_custom_call`, one per block, f32 out) running
at ~20 TFLOP/s at [128,6,256,64] — ~7.7 ms/step across the 12 blocks —
and the explicit [b,n,3,h,d] -> [b,h,n,d] head transposes materialize 12
full-tensor layout copies (~4.3 ms/step). Dense matmuls lower as
TPU "convolution" ops (~20.6 ms/step fwd+dgrad).

Variants (same process, interleaved, min-of-segments — the shared-chip
protocol of scripts/conv_attack.py):

- base128/256/512: shipped step at different global batches (transformer
  matmuls deepen with batch; weight-shaped work is batch-independent).
- noflash128: compiler_options xla_tpu_enable_flash_attention=false —
  does XLA's auto flash kernel actually pay at n=256, or is the plain
  fused softmax faster?
- pallas128: our Pallas flash kernel (flash_attn=True) instead.
- bnhd128: attention computed directly in [b,n,h,d] via einsum, no head
  transpose (kills the 12 qkv relayout copies if XLA doesn't reimpose
  them as operand layout constraints on its flash kernel).
- bnhd_noflash128: both.
- noprefuse128: xla_tpu_prefuse_self_attention=false (second knob).

Usage: python scripts/dit_attack.py [--variants a,b,c] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from conv_attack import Variant, make_batch  # noqa: E402  (shared harness)

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM


def make_dit(flash_attn: bool = False):
    return DDPM(
        img_channels=3, img_size=32, network="dit", dim=384, depth=12,
        num_heads=6, patch_size=2, diffusion_timesteps=1000, num_classes=10,
        use_bf16=True, flash_attn=flash_attn,
    )


def _bnhd_block():
    """DiTBlock variant: attention via einsum directly in [b,n,h,d] —
    no explicit head transposes (same math, same param tree)."""
    import flax.linen as nn

    from lightning_generative_models_tpu.models.diffusion.dit import modulate

    class DiTBlockBNHD(nn.Module):
        hidden: int
        heads: int
        mlp_ratio: float = 4.0
        flash: bool = False
        dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, x, c):
            b, n, _ = x.shape
            head_dim = self.hidden // self.heads
            mod = nn.Dense(6 * self.hidden, kernel_init=nn.initializers.zeros,
                           dtype=jnp.float32, name="adaLN_modulation")(nn.silu(c))
            sh_a, sc_a, gate_a, sh_m, sc_m, gate_m = jnp.split(mod, 6, axis=-1)
            ln = lambda name: nn.LayerNorm(  # noqa: E731
                epsilon=1e-6, use_bias=False, use_scale=False,
                dtype=jnp.float32, name=name)
            h = modulate(ln("norm1")(x), sh_a, sc_a).astype(self.dtype)
            qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name="qkv")(h)
            qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b,n,h,d]
            scale = head_dim ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            w = jax.nn.softmax(logits, axis=-1)
            att = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, self.hidden)
            att = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(att)
            x = x + gate_a[:, None, :].astype(x.dtype) * att.astype(x.dtype)
            h = modulate(ln("norm2")(x), sh_m, sc_m).astype(self.dtype)
            h = nn.Dense(int(self.hidden * self.mlp_ratio),
                         dtype=self.dtype, name="fc1")(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
            return x + gate_m[:, None, :].astype(x.dtype) * h.astype(x.dtype)

    return DiTBlockBNHD


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument(
        "--variants", type=str,
        default="base128,base256,noflash128,pallas128,bnhd128,bnhd_noflash128",
    )
    args = p.parse_args()
    wanted = args.variants.split(",")

    import time

    from lightning_generative_models_tpu.models.diffusion import dit as dit_mod

    NOFLASH = dict(compiler_options={
        "xla_tpu_enable_flash_attention": "false"})
    variants = []

    def add(v_ctor):
        try:
            t0 = time.perf_counter()
            v = v_ctor()
            dt = v.compile()
            print(f"[compile] {v.name}: {dt:.1f}s "
                  f"(+{time.perf_counter() - t0 - dt:.1f}s init)", flush=True)
            variants.append(v)
        except Exception as e:  # pragma: no cover - harness resilience
            print(f"[compile] FAILED {type(e).__name__}: {e}", flush=True)

    for name in wanted:
        if name.startswith("base"):
            bs = int(name[4:])
            add(lambda bs=bs, n=name: Variant(n, bs, model=make_dit()))
        elif name == "noflash128":
            add(lambda: Variant("noflash128", 128, model=make_dit(),
                                jit_kwargs=NOFLASH))
        elif name == "noprefuse128":
            add(lambda: Variant(
                "noprefuse128", 128, model=make_dit(),
                jit_kwargs=dict(compiler_options={
                    "xla_tpu_prefuse_self_attention": "false"})))
        elif name == "pallas128":
            add(lambda: Variant("pallas128", 128, model=make_dit(True)))
        elif name in ("bnhd128", "bnhd_noflash128"):
            orig = dit_mod.DiTBlock
            dit_mod.DiTBlock = _bnhd_block()
            try:
                kw = NOFLASH if name == "bnhd_noflash128" else None
                add(lambda n=name, kw=kw: Variant(
                    n, 128, model=make_dit(), jit_kwargs=kw))
            finally:
                dit_mod.DiTBlock = orig
        else:
            raise SystemExit(f"unknown variant {name}")

    n1 = max(args.steps // 5, 1)
    n2 = args.steps
    seg1 = {v.name: [] for v in variants}
    seg2 = {v.name: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            t0 = time.perf_counter()
            v.chain(n1)
            t1 = time.perf_counter()
            v.chain(n2)
            t2 = time.perf_counter()
            seg1[v.name].append(t1 - t0)
            seg2[v.name].append(t2 - t1)
        print(f"[rep {rep}] done", flush=True)

    print("\n=== results (min-of-segments slope) ===")
    for v in variants:
        per_dispatch = (min(seg2[v.name]) - min(seg1[v.name])) / (n2 - n1)
        per_img = per_dispatch / v.images
        print(f"{v.name:18s}  {1.0 / per_img:10.1f} img/s   "
              f"{per_dispatch * 1e3 / v.k:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
