"""Aggregate XLA-op self-times from a jax.profiler xplane dump.

Usage: python scripts/analyze_xplane.py <trace_dir_or_pb> [--top N] [--like SUBSTR]
Categories are tuned for the DDPM train step (convs fwd/dgrad/wgrad,
Pallas attention, GN chains, optimizer fusions, layout copies).
"""
import argparse
import glob
import os
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def find_pb(path):
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    return hits[-1]


def categorize(n):
    if "_pallas_backward" in n: return "attn-pallas-bwd"
    if "_pallas_forward" in n: return "attn-pallas-fwd"
    if n.startswith("%copy"): return "layout-copy"
    if n.startswith("%conditional"): return "conditional"
    if "convolution" in n:
        # dgrad convs output bf16 activations; fwd convs too — split by
        # kernel-layout operand heuristics is unreliable; lump as conv-act.
        return "conv-act (fwd+dgrad)"
    if re.search(r"= \(?f32\[\d+,\d+,\d+,\d+\]\{2,3", n): return "conv-wgrad"
    if re.search(r"= \(f32\[[37],[37],\d+,\d+\]", n): return "opt-weight-fusion"
    if re.search(r"= \(?f32\[128,\d+\]", n): return "gn-chain"
    if re.search(r"= \(?bf16\[128,", n): return "act-fusion"
    if n.startswith("%fusion"): return "fusion-misc"
    if "slice" in n or "dynamic" in n: return "slice"
    return "misc"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--like", type=str, default=None)
    args = ap.parse_args()

    xs = xplane_pb2.XSpace()
    pb = find_pb(args.path)
    xs.ParseFromString(open(pb, "rb").read())
    tpu = [p for p in xs.planes if "TPU" in p.name][0]
    em = {m.id: m.name for m in tpu.event_metadata.values()}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    byname = defaultdict(float)
    bycnt = defaultdict(int)
    for line in tpu.lines:
        if line.name.strip() != "XLA Ops":
            continue
        for e in line.events:
            n = em.get(e.metadata_id, "?")
            ms = e.duration_ps / 1e9
            agg[categorize(n)] += ms
            cnt[categorize(n)] += 1
            if args.like and args.like in n:
                key = n[:130]
                byname[key] += ms
                bycnt[key] += 1
    tot = sum(agg.values())
    print(f"file: {pb}\ntotal XLA-op time: {tot:.3f} ms")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f} ms  {100 * v / tot:5.1f}%  {cnt[k]:5d}x  {k}")
    if args.like:
        print(f"\nops matching '{args.like}':")
        for k, v in sorted(byname.items(), key=lambda kv: -kv[1])[:args.top or 25]:
            print(f"{v:8.3f} ms  {bycnt[k]:4d}x  {k}")


if __name__ == "__main__":
    main()
