"""Single-chip cost of the tensor-parallel qkv layout: h3d vs s3hd.

--strategy tp requires qkv_layout="h3d" (per-head q,k,v contiguous, so a
channel shard is a whole-head group — see ops/attention.py LAYOUTS). This
A/B answers the question a TP user asks first: does training TP-ready
checkpoints cost anything on one chip? Same DiT-S/2 conditional train
step, same protocol as scripts/conv_attack.py (interleaved, min-of-
segments slope, shared-chip rules).

Usage: python scripts/tp_layout_ab.py [--steps N] [--reps R]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from conv_attack import Variant  # noqa: E402  (shared harness)

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM


def make_dit(qkv_layout: str) -> DDPM:
    return DDPM(
        img_channels=3, img_size=32, network="dit", dim=384, depth=12,
        num_heads=6, patch_size=2, diffusion_timesteps=1000, num_classes=10,
        use_bf16=True, qkv_layout=qkv_layout,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--reps", type=int, default=4)
    args = parser.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    variants = [
        Variant(layout, 128, model=make_dit(layout))
        for layout in ("s3hd", "h3d")
    ]
    for v in variants:
        print(f"[compile] {v.name}: {v.compile():.1f}s", flush=True)

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
        per_step = (min(seg2[v.name]) - min(seg1[v.name])) / (n2 - n1)
        print(f"{v.name:6s}  {v.bs / per_step:10.1f} img/s   "
              f"{per_step * 1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
