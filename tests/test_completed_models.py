"""CycleGAN, SGAN, ACGAN, BEGAN, VQGAN — the reference's broken/stub set,
implemented properly here."""

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.data.datamodule import PairedDataModule
from lightning_generative_models_tpu.registry import load_model


def batch_mnist(bs=8):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 28, 28, 1), dtype=np.uint8),
        "label": rs.randint(0, 10, size=bs).astype(np.int32),
    }


def test_cyclegan_step_and_translate(rng):
    model = load_model(
        {
            "name": "CycleGAN",
            "args": {
                "in_channels": 3,
                "out_channels": 3,
                "img_size": 32,
                "num_residual_blocks": 1,
            },
        }
    )
    state = model.init_state(rng)
    rs = np.random.RandomState(0)
    batch = {
        "image_A": rs.randint(0, 256, size=(2, 32, 32, 3), dtype=np.uint8),
        "image_B": rs.randint(0, 256, size=(2, 32, 32, 3), dtype=np.uint8),
    }
    step = jax.jit(model.train_step, donate_argnums=0)
    state, metrics = step(state, batch, rng)
    for key in ("train_g_loss", "train_d_loss", "train_cycle_loss",
                "train_identity_loss", "train_adv_loss"):
        assert key in metrics
    out = model.translate(state, jnp.zeros((2, 32, 32, 3)), "AB")
    assert out.shape == (2, 32, 32, 3)
    back = model.translate(state, out, "BA")
    assert back.shape == (2, 32, 32, 3)
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert "val_g_loss" in ev


def test_paired_datamodule_synthetic():
    dm = PairedDataModule(
        name="horse2zebra", img_size=32, img_channels=3, batch_size=4,
        synthetic_size=64,
    )
    batch = next(iter(dm.train_batches(0)))
    assert batch["image_A"].shape == (4, 32, 32, 3)
    assert batch["image_B"].shape == (4, 32, 32, 3)
    assert batch["image_A"].dtype == np.uint8


def test_sgan_semi_supervised(rng):
    model = load_model(
        {
            "name": "SGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 16,
                "num_classes": 10,
                "labeled_fraction": 0.25,
            },
        }
    )
    state = model.init_state(rng)
    batch = batch_mnist()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(10):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_supervised_loss"])
    assert float(metrics["train_supervised_loss"]) < first
    preds = model.classify(state, batch)
    assert preds.shape == (8,)
    assert int(preds.max()) < 10
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert "val_accuracy" in ev


def test_acgan_class_conditional(rng):
    model = load_model(
        {
            "name": "ACGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 16,
                "num_classes": 10,
            },
        }
    )
    state = model.init_state(rng)
    batch = batch_mnist()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(10):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_d_cls_loss"])
    assert float(metrics["train_d_cls_loss"]) < first
    imgs = model.sample(state, rng, 10)
    assert imgs.shape == (10, 28, 28, 1)


def test_began_equilibrium(rng):
    model = load_model(
        {
            "name": "BEGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 16,
                "hidden_dim": 16,
                "gamma": 0.5,
                "lambda_k": 0.01,
            },
        }
    )
    state = model.init_state(rng)
    batch = batch_mnist()
    assert float(state.mutable["k_t"]) == 0.0
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(5):
        state, metrics = step(state, batch, rng)
    assert "train_convergence" in metrics
    k = float(state.mutable["k_t"])
    assert 0.0 <= k <= 1.0
    imgs = model.sample(state, rng, 2)
    assert imgs.shape == (2, 28, 28, 1)


def test_vqgan_last_kernel_numeric_sort(rng):
    """Regression: lexicographic sort put ConvTranspose_10 before
    ConvTranspose_2, so a >=10-transpose-conv decoder got the wrong 'last
    layer' for the taming adaptive weight."""
    model = load_model(
        {"name": "VQGAN", "args": {"img_channels": 3, "img_size": 32}}
    )
    fake_params = {f"ConvTranspose_{i}": None for i in range(12)}
    fake_params["Conv_0"] = None
    assert model._last_decoder_kernel_path(fake_params) == "ConvTranspose_11"


def test_vqgan_phases(rng):
    model = load_model(
        {
            "name": "VQGAN",
            "args": {
                "img_channels": 3,
                "img_size": 32,
                "embedding_dim": 8,
                "num_embeddings": 16,
                "hidden_dim": 32,
                "num_residual_layers": 1,
                "num_residual_hiddens": 8,
                "use_ema": False,
                "lr": 1e-3,
                "disc_start": 3,
                "disc_weight": 0.8,
            },
        }
    )
    state = model.init_state(rng)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.randint(0, 256, size=(4, 32, 32, 3), dtype=np.uint8),
        "label": np.zeros(4, np.int32),
    }
    step = jax.jit(model.train_step, donate_argnums=0)
    d0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["disc"])[0]
    ).copy()
    # Before disc_start: discriminator loss must be zero (gated off).
    state, metrics = step(state, batch, rng)
    assert float(metrics["train_d_loss"]) == 0.0
    for _ in range(5):
        state, metrics = step(state, batch, rng)
    # After disc_start: adversarial phase active, D params moved.
    assert float(metrics["train_d_loss"]) != 0.0
    d1 = np.asarray(jax.tree_util.tree_leaves(state.params["disc"])[0])
    assert not np.allclose(d0, d1)
    assert "train_adaptive_weight" in metrics
    recon = model.reconstruct(state, batch)
    assert recon.shape == (4, 32, 32, 3)
