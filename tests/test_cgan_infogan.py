"""CGAN + InfoGAN: conditioning, MI loss, three-optimizer step."""

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.models.gan.infogan import gaussian_nll
from lightning_generative_models_tpu.registry import load_model


def fixed_batch(bs=8, size=28, ch=1):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randint(0, 256, size=(bs, size, size, ch), dtype=np.uint8),
        "label": rng.randint(0, 10, size=bs).astype(np.int32),
    }


def test_gaussian_nll_matches_reference_formula():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    mu = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    logvar = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    expected = np.mean(
        0.5
        * np.sum(
            np.asarray(logvar) + (np.asarray(x) - np.asarray(mu)) ** 2 / np.exp(logvar),
            axis=-1,
        )
    )
    assert abs(float(gaussian_nll(x, mu, logvar)) - float(expected)) < 1e-5


def test_cgan_step_and_class_conditional_sampling(rng):
    model = load_model(
        {
            "name": "CGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 16,
                "num_classes": 10,
            },
        }
    )
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    assert "train_d_loss" in metrics and "train_g_loss" in metrics
    assert int(state.step) == 3

    labels = jnp.array([0, 3, 7])
    imgs = model.sample_classes(state, rng, labels)
    assert imgs.shape == (3, 28, 28, 1)
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert "val_g_loss" in ev


def test_infogan_three_phase_step(rng):
    model = load_model(
        {
            "name": "InfoGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 16,
                "categorical_code_dim": 10,
                "continuous_code_dim": 2,
                "lambda_cat": 1,
                "lambda_cont": 0.1,
            },
        }
    )
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)
    state, metrics = step(state, batch, rng)
    for key in ("train_d_loss", "train_g_loss", "train_mi_loss",
                "train_mi_categorical", "train_mi_continuous"):
        assert key in metrics, key
    # MI loss must decrease when optimized on a fixed batch.
    first_mi = float(metrics["train_mi_loss"])
    for _ in range(20):
        state, metrics = step(state, batch, rng)
    assert float(metrics["train_mi_loss"]) < first_mi

    imgs = model.sample(state, rng, 20)
    assert imgs.shape == (20, 28, 28, 1)
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert "val_loss" in ev and "val_mi_loss" in ev


def test_infogan_structured_codes(rng):
    model = load_model(
        {
            "name": "InfoGAN",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "latent_dim": 8,
                "categorical_code_dim": 5,
                "continuous_code_dim": 2,
            },
        }
    )
    z, cat, cont = model.generate_codes(rng, 10, structured=True)
    # Two samples per category, stepping 0..4 (reference infogan.py:120-128).
    cats = np.argmax(np.asarray(cat), axis=1)
    np.testing.assert_array_equal(cats, [0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    # Continuous codes interpolate monotonically.
    c = np.asarray(cont)
    deltas = np.diff(c, axis=0)
    assert np.all(deltas * deltas[0] >= -1e-6)


def test_conditional_validation_grids(rng, tmp_path):
    """CGAN logs a per-class grid and InfoGAN a code-transition grid at
    validation (reference cgan.py:331-357, infogan.py:499-510)."""
    import numpy as np

    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.registry import load_model
    from lightning_generative_models_tpu.train.trainer import Trainer

    for name, grid_name in (
        ("CGAN", "per_class_generation"),
        ("InfoGAN", "code_transition"),
    ):
        model = load_model(
            {"name": name, "args": {"img_channels": 1, "img_size": 28}}
        )
        dm = DataModule(
            name="MNIST", img_size=28, img_channels=1, batch_size=8,
            synthetic_size=80,
        )
        exp = tmp_path / name
        t = Trainer(
            model, dm, exp, max_steps=1, log_every_n_steps=1,
            sample_every_n_steps=0, check_val_every_n_epoch=1,
        )
        assert t._val_grids is not None
        t.fit()
        pngs = [p.name for p in (exp / "images").glob("*.png")] + [
            p.name for p in exp.rglob("*.png")
        ]
        assert any(grid_name in p for p in pngs), (name, pngs)
