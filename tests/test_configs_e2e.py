"""End-to-end trainer smoke test for EVERY shipped config.

SURVEY §4 trainer integration tests: each config loads through the real
registry/datamodule/trainer path, runs 2 optimization steps on synthetic
data, validates, samples, and writes checkpoints — on the 8-virtual-device
CPU mesh. Heavy architectures are shrunk via per-model overrides (width /
depth / timesteps), never bypassing any code path.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from lightning_generative_models_tpu.config import load_config
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.train.trainer import Trainer

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.rglob("*.json"))

# Keep compiles small on CPU without skipping code paths.
MODEL_OVERRIDES = {
    "DDPM": {"dim": 8, "diffusion_timesteps": 8, "use_bf16": False,
             "ema_update_after_step": 2, "ema_update_every": 1},
    # Random-init AE (no experiment_name): exercises the loud-warning smoke
    # path; the frozen-AE code path is identical to a restored one.
    "LatentDiffusion": {"dim": 8, "diffusion_timesteps": 8, "use_bf16": False,
                        "ema_update_after_step": 2, "ema_update_every": 1},
    "FlowMatching": {"dim": 8, "sampling_steps": 4, "use_bf16": False,
                     "ema_update_after_step": 2, "ema_update_every": 1},
    "EDM": {"dim": 8, "sampling_steps": 4, "use_bf16": False,
            "ema_update_after_step": 2, "ema_update_every": 1},
    "LatentEDM": {"dim": 8, "sampling_steps": 4, "use_bf16": False,
                  "ema_update_after_step": 2, "ema_update_every": 1},
    "LatentFlowMatching": {"dim": 8, "sampling_steps": 4, "use_bf16": False,
                           "ema_update_after_step": 2, "ema_update_every": 1},
    "ConsistencyModel": {"dim": 8, "s0": 4, "s1": 16, "curriculum_steps": 8,
                         "use_bf16": False, "ema_update_after_step": 2,
                         "ema_update_every": 1},
    "VQVAE": {"hidden_dim": 32, "num_residual_hiddens": 8, "embedding_dim": 8,
              "num_embeddings": 16},
    "VQGAN": {"hidden_dim": 32, "num_residual_hiddens": 8, "embedding_dim": 8,
              "num_embeddings": 16, "disc_start": 1},
    "CycleGAN": {"num_residual_blocks": 1, "img_size": 32},
    "InfoGAN": {"latent_dim": 16},
    "GAN": {"latent_dim": 16},
    "CGAN": {"latent_dim": 16},
    "DCGAN": {"latent_dim": 16},
    "LSGAN": {"latent_dim": 16},
    "WGAN": {"latent_dim": 16},
    "R1GAN": {"latent_dim": 16},
    "SGAN": {"latent_dim": 16},
    "ACGAN": {"latent_dim": 16},
    "BEGAN": {"latent_dim": 16, "hidden_dim": 16},
    "NICE": {"hidden_dim": 64, "num_hidden_layers": 2},
    "Glow": {"levels": 2, "depth": 2, "width": 16},
    "PixelCNN": {"hidden_dim": 16, "num_layers": 2},
}
SHRINK_IMG = {"DDPM", "InfoGAN", "LSGAN", "R1GAN", "DCGAN", "BEGAN"}


def _shrink(config):
    name = config["model"]["name"]
    args = config["model"]["args"]
    args.update(MODEL_OVERRIDES.get(name, {}))
    if args.get("network") == "dit":
        # DiT divisibility: hidden % heads == 0, hidden % 4 == 0 (posemb).
        args.update({"dim": 32, "depth": 2, "num_heads": 4})
        if args.get("pipeline_stages"):
            # depth % stages == 0 at the shrunk depth; the schedule itself
            # (incl. bubble fill/drain) still runs off the pp mesh.
            args.update({"pipeline_stages": 2, "pipeline_microbatches": 4})
    dset = config["dataset"]
    dset["batch_size"] = 8
    if name in SHRINK_IMG and dset.get("img_size", 0) > 32:
        dset["img_size"] = 32
        if "img_size" in args:
            args["img_size"] = 32
    if name == "CycleGAN":
        dset["img_size"] = 32
    return config


@pytest.mark.slow
@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_end_to_end(path, tmp_path):
    config = _shrink(load_config(path))
    model = load_model(config["model"])

    paired = config["model"]["name"].lower() == "cyclegan"
    if paired:
        from lightning_generative_models_tpu.data.datamodule import PairedDataModule

        dm = PairedDataModule(**config["dataset"], synthetic_size=256)
    else:
        from lightning_generative_models_tpu.data.datamodule import DataModule

        dm = DataModule(**config["dataset"], synthetic_size=80)

    trainer = Trainer(
        model=model,
        datamodule=dm,
        experiment_dir=tmp_path,
        max_steps=2,
        check_val_every_n_epoch=1,
        log_every_n_steps=1,
        sample_every_n_steps=0,
        num_sample_images=8,
    )
    trainer.fit()

    records = [
        json.loads(line) for line in open(tmp_path / "metrics.jsonl")
    ]
    assert records, "no metrics logged"
    train_keys = [k for r in records for k in r if k.startswith("train_")]
    val_keys = [k for r in records for k in r if k.startswith("val_")]
    assert train_keys, "no train metrics"
    assert val_keys, "no val metrics"
    for r in records:
        for k, v in r.items():
            if isinstance(v, float):
                assert np.isfinite(v), f"{k} is not finite in {r}"
    assert (tmp_path / "checkpoints" / "last").exists()
