"""Live-TPU smoke matrix: every shipped config, a few real train steps.

CPU CI structurally cannot reach backend-gated TPU dispatch paths (Pallas
kernels, custom_partitioning SPMD wrappers) — the VQ nearest-codes grad
crash (ops/vq.py, fixed 2026-08-18) shipped green through the whole suite
because only `jax.default_backend() == "tpu"` routes training through the
kernel. This script is the missing coverage: it drives `train.py` for
every config under configs/ for a handful of steps ON THE REAL CHIP and
reports one line per config. Run it whenever a dispatch gate, kernel, or
model step changes; results land in experiments/<MODEL>/tpu_smoke/.

Usage:  python scripts/tpu_smoke.py [--steps 3] [--only substr]
Exit code: number of failed configs (0 = all green).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on config path")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    configs = sorted((REPO / "configs").rglob("*.json"))
    if args.only:
        configs = [c for c in configs if args.only in str(c)]
    failures = []
    for cfg in configs:
        rel = cfg.relative_to(REPO)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "train.py", "--config_path", str(rel),
                 "--experiment_name", "tpu_smoke", "--max_steps",
                 str(args.steps), "--check_val_every_n_epoch", "1000000"],
                cwd=REPO, capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            # One slow config (cold compile through the tunnel) must not
            # kill the whole matrix — record and move on.
            print(f"FAIL {rel} (timeout after {args.timeout}s)")
            failures.append(str(rel))
            continue
        dt = time.time() - t0
        if proc.returncode == 0:
            print(f"PASS {rel} ({dt:.0f}s)")
        else:
            tail = "\n".join(proc.stderr.strip().splitlines()[-12:])
            print(f"FAIL {rel} ({dt:.0f}s, rc={proc.returncode})\n{tail}\n")
            failures.append(str(rel))
    print(json.dumps({"total": len(configs), "failed": failures}))
    return len(failures)


if __name__ == "__main__":
    sys.exit(main())
