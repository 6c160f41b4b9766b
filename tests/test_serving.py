"""Serving export (beyond reference): frozen-sampler jax.export round-trips.

The artifact contract: one blob + sidecar, loadable with zero model code,
whose only runtime input is a PRNG key and whose output matches the live
model's ``sample`` for the same key.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.registry import load_model
from lightning_generative_models_tpu.serving import (
    export_sampler,
    load_artifact,
    save_artifact,
)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _tiny_ddpm():
    return DDPM(img_channels=1, img_size=8, dim=8, diffusion_timesteps=8,
                sampling_timesteps=4, use_bf16=False)


def test_roundtrip_matches_live_sample(rng, tmp_path):
    model = _tiny_ddpm()
    state = jax.jit(model.init_state)(rng)

    exported = export_sampler(model, state, batch_size=2)
    sidecar = save_artifact(exported, tmp_path / "ddpm.jaxexport",
                            meta={"model": "DDPM", "step": 0})
    artifact = load_artifact(tmp_path / "ddpm.jaxexport")

    key = jax.random.PRNGKey(7)
    frozen = np.asarray(jax.device_get(artifact(key)))
    live = np.asarray(jax.device_get(
        jax.jit(model.sample, static_argnums=2)(state, key, 2)
    ))
    np.testing.assert_allclose(frozen, live, rtol=1e-6, atol=1e-6)

    assert sidecar["output_shape"] == [2, 8, 8, 1]
    assert sidecar["sha256"] == artifact.meta["sha256"]
    assert artifact.meta["model"] == "DDPM"
    assert (tmp_path / "ddpm.jaxexport.json").exists()


@pytest.mark.parametrize("spec", [
    ("FlowMatching", {"img_channels": 1, "img_size": 8, "dim": 8,
                      "sampling_steps": 3, "use_bf16": False}),
    ("EDM", {"img_channels": 1, "img_size": 8, "dim": 8,
             "sampling_steps": 3, "use_bf16": False}),
    ("DDPM", {"img_channels": 1, "img_size": 8, "network": "dit", "dim": 16,
              "depth": 2, "num_heads": 2, "patch_size": 4,
              "diffusion_timesteps": 8, "sampling_timesteps": 4,
              "use_bf16": False}),
    ("ConsistencyModel", {"img_channels": 1, "img_size": 8, "dim": 8,
                          "sampling_steps": 2, "s0": 4, "s1": 8,
                          "curriculum_steps": 0, "use_bf16": False}),
], ids=["fm", "edm", "dit", "ct"])
def test_new_family_export_roundtrip(rng, tmp_path, spec):
    """FlowMatching / EDM / DiT-backbone samplers export through the same
    serving surface (they share DDPM's sampler contract): the frozen
    artifact must reproduce the live sample. EDM starts from sigma_max=80
    noise, which amplifies fusion-order f32 drift between the live and the
    deserialized-StableHLO compilations (observed max |diff| ~4e-5 on
    [0,1] outputs — same effect as in tests/test_sharded_sampling.py)."""
    name, args = spec
    model = load_model({"name": name, "args": args})
    state = jax.jit(model.init_state)(rng)
    exported = export_sampler(model, state, batch_size=2)
    save_artifact(exported, tmp_path / "m.jaxexport",
                  meta={"model": name, "step": 0})
    artifact = load_artifact(tmp_path / "m.jaxexport")
    key = jax.random.PRNGKey(7)
    frozen = np.asarray(jax.device_get(artifact(key)))
    live = np.asarray(jax.device_get(
        jax.jit(model.sample, static_argnums=2)(state, key, 2)
    ))
    # EDM and ConsistencyModel both start from sigma_max=80 noise (the
    # fusion-order drift amplifier described above).
    atol = 2e-3 if name in ("EDM", "ConsistencyModel") else 1e-6
    np.testing.assert_allclose(frozen, live, rtol=1e-4, atol=atol)


def test_latent_diffusion_export_bakes_frozen_ae(rng, tmp_path):
    """LatentDiffusion's sampler decodes through state.mutable's frozen
    autoencoder; export must bake that tree in as constants so the artifact
    serves images (not latents) with no state on the serving side."""
    model = load_model({"name": "LatentDiffusion", "args": {
        "img_size": 32, "img_channels": 3,
        "autoencoder": {"config_path": "configs/vae/vqvae_cifar10.json"},
        "dim": 8, "dim_mults": [1, 2],
        "diffusion_timesteps": 8, "sampling_timesteps": 4,
        "use_bf16": False,
    }})
    state = jax.jit(model.init_state)(rng)

    exported = export_sampler(model, state, batch_size=2)
    save_artifact(exported, tmp_path / "ldm.jaxexport",
                  meta={"model": "LatentDiffusion", "step": 0})
    artifact = load_artifact(tmp_path / "ldm.jaxexport")

    key = jax.random.PRNGKey(3)
    frozen = np.asarray(jax.device_get(artifact(key)))
    live = np.asarray(jax.device_get(
        jax.jit(model.sample, static_argnums=2)(state, key, 2)
    ))
    assert frozen.shape == (2, 32, 32, 3)  # image space, not 4x4x64 latents
    np.testing.assert_allclose(frozen, live, rtol=1e-6, atol=1e-6)


def test_dpmpp_sampler_bakes_into_artifact(rng, tmp_path):
    model = _tiny_ddpm()
    state = jax.jit(model.init_state)(rng)

    exported = export_sampler(model, state, 2, method="dpmpp", steps=2)
    save_artifact(exported, tmp_path / "a.jaxexport")
    artifact = load_artifact(tmp_path / "a.jaxexport")

    key = jax.random.PRNGKey(3)
    frozen = np.asarray(jax.device_get(artifact(key)))
    live = np.asarray(jax.device_get(
        model.sample(state, key, 2, method="dpmpp", steps=2)
    ))
    np.testing.assert_allclose(frozen, live, rtol=1e-6, atol=1e-6)


def test_conditional_labels_baked(rng, tmp_path):
    model = load_model({
        "name": "CGAN",
        "args": {"img_channels": 1, "img_size": 28, "latent_dim": 8,
                 "num_classes": 10, "summary": False},
    })
    state = jax.jit(model.init_state)(rng)

    exported = export_sampler(model, state, 3, labels=[0, 3, 7])
    save_artifact(exported, tmp_path / "cgan.jaxexport")
    artifact = load_artifact(tmp_path / "cgan.jaxexport")

    key = jax.random.PRNGKey(5)
    frozen = np.asarray(jax.device_get(artifact(key)))
    live = np.asarray(jax.device_get(
        model.sample_classes(state, key, jnp.array([0, 3, 7]))
    ))
    assert frozen.shape == (3, 28, 28, 1)
    np.testing.assert_allclose(frozen, live, rtol=1e-6, atol=1e-6)


def test_labels_rejected_without_sample_classes(rng, tmp_path):
    model = _tiny_ddpm()
    state = jax.jit(model.init_state)(rng)
    with pytest.raises(ValueError, match="sample_classes"):
        export_sampler(model, state, 2, labels=[0, 1])


def test_sha256_mismatch_detected(rng, tmp_path):
    model = _tiny_ddpm()
    state = jax.jit(model.init_state)(rng)
    exported = export_sampler(model, state, 2)
    save_artifact(exported, tmp_path / "b.jaxexport")

    sidecar_path = tmp_path / "b.jaxexport.json"
    meta = json.loads(sidecar_path.read_text())
    meta["sha256"] = "0" * 64
    sidecar_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        load_artifact(tmp_path / "b.jaxexport")


def test_export_cli_e2e(tmp_path, monkeypatch):
    """Train 1 step, export via the CLI with --smoke, verify artifact +
    sidecar provenance land under <exp_dir>/exported/."""
    import export
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    config = {
        "model": {
            "name": "DDPM",
            "args": {"img_channels": 1, "img_size": 8, "dim": 8,
                     "diffusion_timesteps": 8, "sampling_timesteps": 4,
                     "use_bf16": False},
        },
        "dataset": {"name": "MNIST", "img_size": 8, "img_channels": 1,
                    "batch_size": 8},
    }
    cfg_path = tmp_path / "ddpm_tiny.json"
    cfg_path.write_text(json.dumps(config))

    exp_root = tmp_path / "experiments"
    monkeypatch.setattr(export, "EXPERIMENT_DIR", str(exp_root))
    exp_dir = exp_root / "DDPM" / "run1"

    model = load_model(config["model"])
    dm = DataModule(name="MNIST", img_size=8, img_channels=1, batch_size=8,
                    synthetic_size=32)
    Trainer(model, dm, exp_dir, max_steps=1, log_every_n_steps=1,
            sample_every_n_steps=0, check_val_every_n_epoch=99).fit()

    out_path = export.main([
        "--config_path", str(cfg_path),
        "--experiment_name", "run1",
        "--batch", "2",
        "--sampler", "dpmpp",
        "--sampling_steps", "2",
        "--smoke",
    ])
    assert out_path.exists()
    sidecar = json.loads((out_path.parent / f"{out_path.name}.json").read_text())
    assert sidecar["model"] == "DDPM" and sidecar["step"] == 1
    assert sidecar["sampler"] == "dpmpp" and sidecar["sampling_steps"] == 2
    assert sidecar["output_shape"] == [2, 8, 8, 1]
