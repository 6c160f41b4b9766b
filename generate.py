"""Sampling/inference CLI: generate images from a trained checkpoint.

The reference has no inference entry point (train.py only); this completes
the serve-side surface: load ``experiments/<MODEL>/<name>/checkpoints/{last,
best}``, sample N images (EMA weights where the model keeps them), and write
a grid plus individual PNGs.

    python generate.py --config_path configs/diffusion/ddim_cifar10.json \
        --experiment_name my_run --num_samples 64 [--which best] [--out dir]
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import jax
import numpy as np

from lightning_generative_models_tpu.config import load_config
from lightning_generative_models_tpu.experiment.logger import _write_png
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.checkpoint import CheckpointManager
from lightning_generative_models_tpu.utils.grid import make_grid
from lightning_generative_models_tpu.utils.path import EXPERIMENT_DIR

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
logging.getLogger("absl").setLevel(logging.WARNING)


def main(argv=None):
    parser = argparse.ArgumentParser("Generate samples from a checkpoint")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--which", type=str, default="last", choices=["last", "best"])
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument(
        "--save_individual", action="store_true", help="also write one PNG per sample"
    )
    parser.add_argument(
        "--label", type=int, default=None,
        help="class label for conditional models (CGAN/ACGAN)",
    )
    parser.add_argument(
        "--interpolate", type=int, default=0, metavar="N",
        help="latent-blend two generated samples at N lambdas "
        "(diffusion models; reference ddpm.py:847-867)",
    )
    parser.add_argument(
        "--interpolate_t", type=int, default=None,
        help="diffusion time for interpolation noising (default: T-1, full chain)",
    )
    args = parser.parse_args(argv)

    config = load_config(args.config_path)
    model = load_model(config["model"])
    exp_dir = Path(EXPERIMENT_DIR) / config["model"]["name"] / args.experiment_name
    ckpt = CheckpointManager(exp_dir / "checkpoints", monitor=model.monitor)

    rng = jax.random.PRNGKey(args.seed)
    state = jax.jit(model.init_state)(rng)
    state, step, _ = ckpt.restore(state, args.which)
    print(f"Restored {args.which} checkpoint at step {step} from {exp_dir}")

    sample_rng = jax.random.fold_in(rng, 1)
    if args.interpolate:
        if not hasattr(model, "interpolate"):
            raise SystemExit(f"{type(model).__name__} does not support interpolate")
        import jax.numpy as jnp

        ends = jax.jit(model.sample, static_argnums=2)(state, sample_rng, 2)
        x1 = jnp.broadcast_to(ends[0], (args.interpolate, *ends[0].shape))
        x2 = jnp.broadcast_to(ends[1], (args.interpolate, *ends[1].shape))
        lams = jnp.linspace(0.0, 1.0, args.interpolate)[:, None, None, None]
        images = model.interpolate(
            state, x1, x2, jax.random.fold_in(rng, 2),
            t=args.interpolate_t, lam=lams,
        )
        images = np.asarray(jax.device_get(images))
        out_dir = Path(args.out) if args.out else exp_dir / "generated"
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"interpolation_{args.which}_step{step}.png"
        _write_png(path, make_grid(images, nrow=args.interpolate))
        print(f"Wrote {path}")
        return images
    if args.label is not None and hasattr(model, "sample_classes"):
        import jax.numpy as jnp

        labels = jnp.full((args.num_samples,), args.label, jnp.int32)
        images = model.sample_classes(state, sample_rng, labels)
    else:
        images = jax.jit(model.sample, static_argnums=2)(
            state, sample_rng, args.num_samples
        )
    images = np.asarray(jax.device_get(images))

    out_dir = Path(args.out) if args.out else exp_dir / "generated"
    out_dir.mkdir(parents=True, exist_ok=True)
    grid_path = out_dir / f"grid_{args.which}_step{step}.png"
    _write_png(grid_path, make_grid(images))
    print(f"Wrote {grid_path}")
    if args.save_individual:
        for i, img in enumerate(images):
            _write_png(out_dir / f"sample_{i:04d}.png",
                       (np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f"Wrote {len(images)} individual samples to {out_dir}")
    return images


if __name__ == "__main__":
    main()
