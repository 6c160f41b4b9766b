"""Config loading + registry resolution over every shipped config."""

from pathlib import Path

import pytest

from lightning_generative_models_tpu.config import ConfigError, load_config
from lightning_generative_models_tpu.registry import (
    available_models,
    load_model,
    resolve_model_class,
)

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.rglob("*.json"))


def test_configs_exist():
    assert len(ALL_CONFIGS) >= 20


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_load_every_config(path):
    cfg = load_config(path)
    assert "model" in cfg and "dataset" in cfg
    assert "name" in cfg["model"]


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_registry_resolves_every_config(path):
    cfg = load_config(path)
    try:
        resolve_model_class(cfg["model"]["name"])
    except ModuleNotFoundError as e:
        pytest.xfail(f"model not implemented yet: {e.name}")


def test_mismatched_img_size_rejected(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(
        '{"model": {"name": "VAE", "args": {"img_size": 28, "img_channels": 1}},'
        ' "dataset": {"name": "MNIST", "img_size": 32, "img_channels": 1}}'
    )
    with pytest.raises(ConfigError):
        load_config(bad)


def test_unknown_model_rejected():
    with pytest.raises(ValueError, match="Unknown model"):
        load_model({"name": "NotAModel", "args": {}})


def test_case_insensitive_lookup():
    assert resolve_model_class("vae") is resolve_model_class("VAE")


def test_inventory_covers_reference_families():
    # SURVEY §2.4 inventory: every reference model name must resolve.
    names = [
        "GAN", "CGAN", "InfoGAN", "DCGAN", "LSGAN", "WGAN", "R1GAN",
        "CycleGAN", "SGAN", "ACGAN", "BEGAN", "VAE", "VQVAE", "VQGAN",
        "DDPM", "DAE", "UNet", "PixelCNN", "NICE",
    ]
    available = set(available_models())
    missing = [n for n in names if n not in available]
    assert not missing, f"registry missing reference models: {missing}"


def test_resolve_implemented_models():
    """Models with code on disk must import and resolve."""
    import importlib.util

    for name in available_models():
        from lightning_generative_models_tpu.registry import _REGISTRY

        module_path, _ = _REGISTRY[name]
        if importlib.util.find_spec(module_path) is not None:
            resolve_model_class(name)
