"""Export CLI: freeze a trained sampler into a portable serving artifact.

Beyond reference (which has no inference or deployment entry point). Loads a
checkpoint the same way ``generate.py`` does, bakes the weights into the
jitted sampling program, and writes one self-contained ``jax.export`` blob +
JSON sidecar that a serving process loads with
``lightning_generative_models_tpu.serving.load_artifact`` — no model code or
checkpoint tree needed on the serving side.

    python export.py --config_path configs/diffusion/ddim_cifar10.json \
        --experiment_name my_run --batch 64 [--sampler dpmpp --sampling_steps 20] \
        [--platforms tpu,cpu] [--smoke]
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import jax
import numpy as np

from lightning_generative_models_tpu.config import load_config
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.serving import (
    export_sampler,
    load_artifact,
    save_artifact,
)
from lightning_generative_models_tpu.train.checkpoint import CheckpointManager
from lightning_generative_models_tpu.utils.path import EXPERIMENT_DIR

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
logging.getLogger("absl").setLevel(logging.WARNING)


def main(argv=None):
    parser = argparse.ArgumentParser("Export a frozen sampler for serving")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--which", type=str, default="last", choices=["last", "best"])
    parser.add_argument("--batch", type=int, default=64,
                        help="static serving batch size baked into the artifact")
    parser.add_argument(
        "--sampler", type=str, default="auto",
        choices=["auto", "ddpm", "ddim", "dpmpp", "heun", "euler",
                 "midpoint", "onestep", "multistep"],
        help="sampler baked into the artifact: ddpm/ddim/dpmpp for the "
        "diffusion family, heun/euler for EDM, euler/midpoint/heun for "
        "flow matching, onestep/multistep for consistency models (each "
        "family validates its own names; see generate.py)",
    )
    parser.add_argument(
        "--sampling_steps", type=int, default=0,
        help="sampler step-count override (diffusion; 0 = config value)",
    )
    parser.add_argument(
        "--label", type=int, default=None,
        help="bake a fixed class label (conditional models; the whole batch "
        "samples this class)",
    )
    parser.add_argument(
        "--platforms", type=str, default="",
        help="comma-separated lowering targets, e.g. 'tpu' or 'cpu,tpu' "
        "(default: current backend; note a TPU-backend export embeds the "
        "Pallas kernels and is TPU-only)",
    )
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default: <exp_dir>/exported/...)")
    parser.add_argument(
        "--smoke", action="store_true",
        help="after writing, reload the artifact and run one batch to "
        "verify it executes (costs one compile)",
    )
    args = parser.parse_args(argv)

    cache_dir = os.path.join(EXPERIMENT_DIR, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    config = load_config(args.config_path)
    model = load_model(config["model"])
    exp_dir = Path(EXPERIMENT_DIR) / config["model"]["name"] / args.experiment_name
    ckpt = CheckpointManager(exp_dir / "checkpoints", monitor=model.monitor)

    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state, step, _ = ckpt.restore(state, args.which)
    print(f"Restored {args.which} checkpoint at step {step} from {exp_dir}")

    method = None if args.sampler == "auto" else args.sampler
    steps = args.sampling_steps or None
    labels = [args.label] * args.batch if args.label is not None else None
    platforms = [p for p in args.platforms.split(",") if p] or None

    if (method or steps) and labels is None:
        import inspect

        if "method" not in inspect.signature(model.sample).parameters:
            raise SystemExit(
                f"{type(model).__name__} does not support --sampler/"
                "--sampling_steps (diffusion models only)"
            )

    exported = export_sampler(
        model, state, args.batch,
        method=method, steps=steps, labels=labels, platforms=platforms,
    )

    suffix = "" if args.sampler == "auto" and not args.sampling_steps else (
        f"_{args.sampler}{args.sampling_steps or ''}"
    )
    if args.label is not None:
        suffix += f"_label{args.label}"
    name = f"{config['model']['name'].lower()}_sample_bs{args.batch}{suffix}.jaxexport"
    out_path = Path(args.out) if args.out else exp_dir / "exported" / name

    sidecar = save_artifact(
        exported, out_path,
        meta={
            "model": config["model"]["name"],
            "checkpoint": args.which,
            "step": int(step),
            "batch": args.batch,
            "sampler": args.sampler,
            "sampling_steps": args.sampling_steps or None,
            "label": args.label,
        },
    )
    print(
        f"Wrote {out_path} ({sidecar['size_bytes'] / 1e6:.1f} MB, "
        f"platforms={sidecar['platforms']}, "
        f"output={sidecar['output_shape']} {sidecar['output_dtype']})"
    )

    if args.smoke:
        artifact = load_artifact(out_path)
        imgs = np.asarray(jax.device_get(artifact(jax.random.PRNGKey(1))))
        assert imgs.shape == tuple(sidecar["output_shape"]), imgs.shape
        assert np.all(np.isfinite(imgs)), "non-finite sample output"
        print(f"Smoke run OK: {imgs.shape} {imgs.dtype}, "
              f"range [{imgs.min():.3f}, {imgs.max():.3f}]")
    return out_path


if __name__ == "__main__":
    main()
