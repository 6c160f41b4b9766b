"""Single-chip cost of pipeline-stage attention: fused VMEM kernel vs einsum.

Round 3 ran the einsum formulation inside pipeline stages because the fused
VMEM kernel's custom_partitioning had no batching rule under the stage-vmap
(measured second-best: the kernel was +30% on the dense DiT train step).
The custom_vmap fold rule (ops/attention.py:_fold_leading_vmap) lifts that
restriction; this A/B measures what it buys on the pp-scheduled DiT-S/2
train step ON ONE CHIP (the schedule runs unsharded; the kernel difference
is the only variable). Same protocol as scripts/tp_layout_ab.py:
interleaved, min-of-segments slope, shared-chip rules.

Usage: python scripts/pp_attention_ab.py [--steps N] [--reps R]
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


def make_pp_dit(fused: bool) -> DDPM:
    # configs/diffusion/dit_cifar10_pp.json scale.
    return DDPM(
        img_channels=3, img_size=32, network="dit", dim=384, depth=12,
        num_heads=6, patch_size=2, diffusion_timesteps=1000, num_classes=10,
        use_bf16=True, pipeline_stages=4, pipeline_microbatches=16,
        pp_fused_attn=fused,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--reps", type=int, default=4)
    args = parser.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    variants = [
        Variant(name, 128, model=make_pp_dit(fused))
        for name, fused in (("fused", True), ("einsum", False))
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
