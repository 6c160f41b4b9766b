"""CLI training entry — reference-parity surface (reference: train.py:28-66).

Usage (same as the reference; --config works via argparse prefix matching):

    python train.py --config_path configs/vae/vae.json --experiment_name demo

TPU specifics: the trainer builds a data-parallel mesh over all visible
devices automatically (the reference's --strategy autodetect,
utils/lightning_utils.py:23-56, is replaced by the mesh); --precision selects
the compute dtype policy.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from datetime import datetime
from pathlib import Path
from pprint import pprint

from lightning_generative_models_tpu.config import load_config
from lightning_generative_models_tpu.data.datamodule import DataModule
from lightning_generative_models_tpu.experiment.logger import ExperimentLogger
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.trainer import Trainer
from lightning_generative_models_tpu.utils.path import EXPERIMENT_DIR

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
logging.getLogger("absl").setLevel(logging.WARNING)  # orbax is very chatty
logger = logging.getLogger("train")

EXPERIMENT_TIME = datetime.now().strftime("%Y-%m-%d_%H:%M")


def setup_arguments(argv=None, print_args: bool = True, save_args: bool = True):
    parser = argparse.ArgumentParser("Train script")

    # Training configurations
    parser.add_argument("--config_path", type=str, required=True, help="Path to configs")

    # Trainer configurations (reference train.py:33-41)
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--check_val_every_n_epoch", type=int, default=5)
    parser.add_argument("--max_epochs", type=int, default=-1)
    parser.add_argument("--max_steps", type=int, default=-1)
    parser.add_argument(
        "--strategy", type=str, default="data_parallel",
        choices=("data_parallel", "ddp", "auto", "fsdp", "tp", "pp"),
        help="data_parallel/ddp/auto: params replicated, batch sharded over "
        "the device mesh (reference DDP autodetect). fsdp: additionally "
        "shard params/optimizer state/EMA over the data axis (ZeRO-3 via "
        "GSPMD sharding annotations) — identical math, per-device state "
        "memory divided by the mesh size. tp: Megatron tensor parallelism "
        "over a (data, model) mesh for DiT-backbone models (requires "
        "qkv_layout='h3d' in the model config; --tp_size sets the model "
        "axis). pp: GPipe pipeline parallelism over a (data, stage) mesh "
        "for DiT-backbone models (requires pipeline_stages == --pp_size in "
        "the model config).",
    )
    parser.add_argument(
        "--tp_size", type=int, default=0,
        help="model-axis size for --strategy tp (0 = all devices); must "
        "divide both the device count and the DiT head count",
    )
    parser.add_argument(
        "--pp_size", type=int, default=0,
        help="stage-axis size for --strategy pp (0 = all devices); must "
        "divide the device count and equal the model's pipeline_stages",
    )
    parser.add_argument("--accumulate_grad_batches", type=int, default=1)
    parser.add_argument(
        "--precision", type=str, default=None,
        help="'bf16' forces bfloat16 compute, '32' forces float32, for "
        "models exposing use_bf16 (reference --precision passthrough)",
    )
    parser.add_argument(
        "--mu_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="dtype of Adam's first moment (optax mu_dtype). bfloat16 halves "
        "mu's HBM footprint in the bandwidth-bound optimizer slice — "
        "measured +1.7%% on the DDPM bs128 v5e step; numerics change "
        "slightly (60-step loss trajectories within 0.13%% of float32). "
        "Keep it consistent across --ckpt_path resumes.",
    )
    parser.add_argument(
        "--nu_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="dtype of Adam's second moment. bfloat16 is a further +0.9%% on "
        "the DDPM bs128 v5e step on top of --mu_dtype bfloat16 (+1.9%% "
        "total); 60-step loss trajectories within 0.23%% of float32. Keep "
        "it consistent across --ckpt_path resumes.",
    )
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--seed", type=int, default=10)
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans (SURVEY §5: sanitizer equivalent)",
    )
    parser.add_argument(
        "--sample_every_n_steps", type=int, default=1000,
        help="mid-training sample-grid cadence (0 disables; reference ddpm.py:1025)",
    )
    parser.add_argument(
        "--unroll_steps", type=int, default=1,
        help="fuse k optimization steps per dispatch; identical math, "
        "coarser logging cadence. Helps when per-dispatch overhead is "
        "comparable to the step (measured on v5e: DDPM-bs128 +4%% with "
        "k=2, deeper unroll regresses); measure with bench.py (its "
        "ddpm_train extras report plain vs unroll2 interleaved) before "
        "enabling",
    )
    parser.add_argument(
        "--profile_steps",
        type=str,
        default=None,
        help="start:stop step range to capture a jax.profiler trace",
    )
    parser.add_argument(
        "--grad_accum_mode", type=str, default="auto",
        choices=("auto", "concat", "scan"),
        help="accumulate_grad_batches strategy: concat merges micro-batches "
        "(exact, k x activation memory), scan sums micro-batch grads in "
        "fixed memory; auto picks by memory heuristic",
    )

    parser.add_argument(
        "--eval", type=str, default=None, choices=("test",), dest="eval_split",
        help="evaluate the held-out test split from a checkpoint instead of "
        "training (reference test_dataloader, data/datamodule.py:190-206)",
    )
    parser.add_argument(
        "--eval_which", type=str, default="last", choices=("last", "best"),
        help="which checkpoint --eval restores",
    )

    # Logging configurations (reference train.py:44-66)
    parser.add_argument(
        "--project", type=str, default="Lightning generative models",
        help="Experiment tracking project name.",
    )
    parser.add_argument(
        "--experiment_name", type=str, default=EXPERIMENT_TIME,
        help="Experiment name.",
    )
    parser.add_argument("--resume", action="store_true", help="Resume the run.")
    parser.add_argument("--id", type=str, default=None, help="Run ID to resume from.")
    parser.add_argument(
        "--wandb", action="store_true", help="Mirror logs to W&B if available."
    )

    args = parser.parse_args(argv)
    args.config = load_config(args.config_path)

    args.experiment_dir = os.path.join(
        EXPERIMENT_DIR, args.config["model"]["name"], args.experiment_name
    )
    os.makedirs(args.experiment_dir, exist_ok=True)

    # The directory layout is experiments/<model name>/<experiment_name> —
    # two DIFFERENT configs can share a model name (e.g. the DiT backbone
    # runs under model name "DDPM"), and reusing an experiment name then
    # silently overwrites the previous run's checkpoints and artifacts.
    # Warn loudly when the dir already holds a different config.
    existing = [
        p for p in Path(args.experiment_dir).glob("*.json")
        if p.name not in ("args.json", "config.json")
        and p.name != Path(args.config_path).name
        # generate.py --fid / --kid drop metric artifacts (fid_*.json) into
        # the experiment dir; they are run outputs, not configs.
        and not p.name.startswith("fid_")
        and not p.name.startswith("kid_")
        and not p.name.startswith("metrics_")
    ]
    if existing and not args.resume:
        logger.warning(
            "Experiment dir %s already contains a run of a DIFFERENT config "
            "(%s); training %s here will overwrite its checkpoints and "
            "artifacts. Pick a distinct --experiment_name to keep both.",
            args.experiment_dir,
            ", ".join(p.name for p in existing),
            Path(args.config_path).name,
        )

    if print_args:
        pprint(vars(args))
    if save_args:
        dump = {k: v for k, v in vars(args).items() if k != "config"}
        with open(os.path.join(args.experiment_dir, "args.json"), "w") as f:
            json.dump(dump, f, indent=2, default=str)
        config_name = Path(args.config_path).name
        with open(os.path.join(args.experiment_dir, config_name), "w") as f:
            json.dump(args.config, f, indent=2)
    return args


def main(argv=None):
    args = setup_arguments(argv)

    import jax

    # Persistent compile cache: the diffusion sampler's first compile is
    # minutes; restarts and resumes hit the cache instead.
    cache_dir = os.path.join(EXPERIMENT_DIR, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # Must run BEFORE load_model: models bake their optimizer at __init__.
    # Set unconditionally so repeated in-process main() calls don't leak the
    # previous invocation's choice.
    import jax.numpy as jnp

    from lightning_generative_models_tpu.train.state import (
        set_default_mu_dtype,
        set_default_nu_dtype,
    )

    set_default_mu_dtype(
        jnp.bfloat16 if args.mu_dtype == "bfloat16" else None
    )
    set_default_nu_dtype(
        jnp.bfloat16 if args.nu_dtype == "bfloat16" else None
    )

    if args.precision:
        import inspect

        from lightning_generative_models_tpu.registry import resolve_model_class

        cls = resolve_model_class(args.config["model"]["name"])
        if "use_bf16" in inspect.signature(cls.__init__).parameters:
            wants_bf16 = args.precision.lower() in ("bf16", "bfloat16", "16")
            args.config["model"]["args"].setdefault("use_bf16", wants_bf16)

    model = load_model(args.config["model"])
    paired = args.config["dataset"].pop("paired", None)
    if paired is None:
        paired = args.config["model"]["name"].lower() == "cyclegan"
    if paired:
        from lightning_generative_models_tpu.data.datamodule import PairedDataModule

        datamodule = PairedDataModule(
            **args.config["dataset"], num_workers=args.num_workers
        )
    else:
        datamodule = DataModule(**args.config["dataset"], num_workers=args.num_workers)
    exp_logger = ExperimentLogger(
        args.experiment_dir,
        project=args.project,
        name=args.experiment_name,
        config={**args.config["model"], "dataset": args.config["dataset"]},
        use_wandb=args.wandb,
        resume=args.resume,
        run_id=args.id,
    )
    profile_steps = None
    if args.profile_steps:
        start, stop = args.profile_steps.split(":")
        profile_steps = (int(start), int(stop))

    trainer = Trainer(
        model=model,
        datamodule=datamodule,
        experiment_dir=args.experiment_dir,
        exp_logger=exp_logger,
        max_epochs=args.max_epochs,
        max_steps=args.max_steps,
        check_val_every_n_epoch=args.check_val_every_n_epoch,
        accumulate_grad_batches=args.accumulate_grad_batches,
        seed=args.seed,
        profile_steps=profile_steps,
        unroll_steps=args.unroll_steps,
        sample_every_n_steps=args.sample_every_n_steps,
        grad_accum_mode=args.grad_accum_mode,
        strategy=args.strategy,
        tp_size=args.tp_size,
        pp_size=args.pp_size,
    )
    if args.eval_split == "test":
        metrics = trainer.test(which=args.eval_which)
        pprint(metrics)
        exp_logger.finish()
        return metrics
    state = trainer.fit(ckpt_path=args.ckpt_path, resume=args.resume)
    exp_logger.finish()
    return state


if __name__ == "__main__":
    main()
