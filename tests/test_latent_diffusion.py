"""LatentDiffusion: DDPM in a frozen VQ autoencoder's latent space.

Semantics pinned here:
- the AE is genuinely frozen (bit-identical mutable tree across train steps);
- latent-space diffusion must NOT clamp x0 to [-1,1] (x_start_clip=None) nor
  remap [0,1]<->[-1,1] (auto_normalize=False);
- decode(encode(x)) is invariant to latent_scale (pure rescaling);
- LDM checkpoints are self-contained: restore recovers the stored AE;
- the strict path (experiment_name given) restores real AE weights and
  errors loudly when the checkpoint is missing.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
)
from lightning_generative_models_tpu.registry import load_model

AE_SPEC = {"config_path": "configs/vae/vqvae_cifar10.json"}


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _tiny_ldm(**kw):
    args = {
        "img_size": 32, "img_channels": 3,
        "autoencoder": dict(AE_SPEC),
        "dim": 8, "dim_mults": [1, 2],
        "diffusion_timesteps": 8, "sampling_timesteps": 4,
        "use_bf16": False, "ema_update_after_step": 1, "ema_update_every": 1,
    }
    args.update(kw)
    return load_model({"name": "LatentDiffusion", "args": args})


def _batch(rng, b=4):
    return {
        "image": jax.random.randint(rng, (b, 32, 32, 3), 0, 256, jnp.uint8),
        "label": jnp.zeros((b,), jnp.int32),
    }


def test_x_start_clip_none_disables_all_clamping(rng):
    """GaussianDiffusion(x_start_clip=None): a model output far outside
    [-1,1] must survive model_predictions and p_mean_variance unclipped;
    the default (1.0) must clamp exactly as before."""
    big = 7.5

    def apply_fn(x, t, sc=None):
        return jnp.full_like(x, big)

    x = jnp.zeros((2, 4, 4, 1))
    t = jnp.zeros((2,), jnp.int32)
    free = GaussianDiffusion(img_size=4, channels=1, timesteps=8,
                             objective="pred_x0", x_start_clip=None)
    preds = free.model_predictions(apply_fn, x, t, clip_x_start=True)
    assert float(jnp.max(jnp.abs(preds.pred_x_start))) == pytest.approx(big)
    _, _, _, x0 = free.p_mean_variance(apply_fn, x, t)
    assert float(jnp.max(jnp.abs(x0))) == pytest.approx(big)

    clamped = GaussianDiffusion(img_size=4, channels=1, timesteps=8,
                                objective="pred_x0")  # default 1.0
    preds = clamped.model_predictions(apply_fn, x, t, clip_x_start=True)
    assert float(jnp.max(jnp.abs(preds.pred_x_start))) == pytest.approx(1.0)


def test_latent_space_configuration():
    model = _tiny_ldm()
    # External surface is image-space; diffusion runs at f8 latents.
    assert (model.img_size, model.img_channels) == (32, 3)
    assert (model.latent_hw, model.latent_c) == (4, 64)
    assert model.diffusion.img_size == 4
    assert model.diffusion.auto_normalize is False
    assert model.diffusion.x_start_clip is None


def test_train_freezes_ae_and_samples_images(rng):
    model = _tiny_ldm()
    state = jax.jit(model.init_state)(rng)
    ae_before = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.mutable)
    )
    step = jax.jit(model.train_step, donate_argnums=0)
    batch = _batch(jax.random.fold_in(rng, 1))
    params0 = jax.device_get(state.params)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    assert np.isfinite(float(metrics["train_loss"]))
    # UNet trained, AE bit-identical.
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(params0),
            jax.tree_util.tree_leaves(jax.device_get(state.params)),
        )
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ae_before),
        jax.tree_util.tree_leaves(jax.device_get(state.mutable)),
    ):
        np.testing.assert_array_equal(a, b)

    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert np.isfinite(float(ev["val_loss"]))
    assert float(ev["val_latent_std"]) > 0

    for method, steps in (("ddim", None), ("dpmpp", 3), ("ddpm", None)):
        imgs = model.sample(state, rng, 2, method=method, steps=steps)
        assert imgs.shape == (2, 32, 32, 3)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_decode_encode_invariant_to_latent_scale(rng):
    """Same AE (deterministic init), different latent_scale: the image->image
    round trip through the hooks must be identical."""
    m1, m4 = _tiny_ldm(latent_scale=1.0), _tiny_ldm(latent_scale=4.0)
    s1, s4 = m1.init_state(rng), m4.init_state(rng)
    x01 = jax.random.uniform(rng, (2, 32, 32, 3))
    z1 = m1._to_diffusion_space(s1, x01)
    z4 = m4._to_diffusion_space(s4, x01)
    np.testing.assert_allclose(np.asarray(z4), np.asarray(z1) * 4.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m1._from_diffusion_space(s1, z1)),
        np.asarray(m4._from_diffusion_space(s4, z4)),
        atol=1e-6,
    )


def test_conditional_latent_diffusion(rng):
    model = _tiny_ldm(num_classes=3)
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 2))
    state, metrics = jax.jit(model.train_step, donate_argnums=0)(
        state, batch, rng
    )
    assert np.isfinite(float(metrics["train_loss"]))
    imgs = model.sample_classes(state, rng, jnp.array([0, 1, 2]), steps=2)
    assert imgs.shape == (3, 32, 32, 3)
    grids = model.validation_grids(state, rng)
    assert grids["per_class_generation"].shape == (12, 32, 32, 3)


def test_checkpoint_is_self_contained(rng, tmp_path):
    """Restoring an LDM checkpoint recovers the AE stored inside it, even
    into a template whose AE tree holds different values."""
    from lightning_generative_models_tpu.train.checkpoint import CheckpointManager

    model = _tiny_ldm()
    state = model.init_state(rng)
    mgr = CheckpointManager(tmp_path / "checkpoints", monitor=model.monitor)
    mgr.save_last(state, step=1, epoch=0)

    template = state.replace(
        mutable=jax.tree_util.tree_map(jnp.zeros_like, state.mutable)
    )
    restored, step, _ = mgr.restore(template, "last")
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.mutable)),
        jax.tree_util.tree_leaves(jax.device_get(restored.mutable)),
    ):
        np.testing.assert_array_equal(a, b)


def _write_tiny_ae_config(tmp_path):
    config = {
        "model": {
            "name": "VQVAE",
            "args": {
                "img_channels": 3, "img_size": 32, "embedding_dim": 8,
                "num_embeddings": 16, "hidden_dim": 16,
                "num_residual_layers": 1, "num_residual_hiddens": 8,
                "use_ema": False,
            },
        },
        "dataset": {"name": "CIFAR10", "img_size": 32, "img_channels": 3,
                    "batch_size": 8},
    }
    path = tmp_path / "tiny_vqvae.json"
    path.write_text(json.dumps(config))
    return path


def test_restores_named_ae_experiment(rng, tmp_path, monkeypatch):
    """experiment_name path: the LDM's frozen AE equals the checkpointed AE
    weights, not a fresh init."""
    import lightning_generative_models_tpu.utils.path as path_mod
    from lightning_generative_models_tpu.train.checkpoint import CheckpointManager

    monkeypatch.setattr(path_mod, "EXPERIMENT_DIR", tmp_path)
    ae_config_path = _write_tiny_ae_config(tmp_path)

    ae = load_model(json.loads(ae_config_path.read_text())["model"])
    ae_state = ae.init_state(rng)
    # One real train step so the weights differ from any fresh init.
    ae_state, _ = jax.jit(ae.train_step, donate_argnums=0)(
        ae_state, _batch(rng), rng
    )
    mgr = CheckpointManager(
        tmp_path / "VQVAE" / "ae_run" / "checkpoints", monitor=ae.monitor
    )
    mgr.save_last(ae_state, step=1, epoch=0)

    model = _tiny_ldm(autoencoder={
        "config_path": str(ae_config_path), "experiment_name": "ae_run",
    })
    got = jax.tree_util.tree_leaves(
        jax.device_get(model._ae_host_tree["params"]["encoder"])
    )
    want = jax.tree_util.tree_leaves(
        jax.device_get(ae_state.params["encoder"])
    )
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    assert model.latent_c == 8  # geometry follows the named AE

    with pytest.raises(FileNotFoundError):
        _tiny_ldm(autoencoder={
            "config_path": str(ae_config_path), "experiment_name": "missing",
        })


def test_mismatched_ae_geometry_rejected():
    from lightning_generative_models_tpu.config import ConfigError

    with pytest.raises(ConfigError, match="64x64"):
        _tiny_ldm(img_size=64, autoencoder=dict(AE_SPEC))
