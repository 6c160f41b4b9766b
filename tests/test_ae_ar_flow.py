"""DAE, UNet-AE, PixelCNN, NICE: math properties and training mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.autoregressive.pixelcnn import causal_mask
from lightning_generative_models_tpu.registry import load_model


def batch_mnist(bs=8, size=28):
    from lightning_generative_models_tpu.data.datasets import synthetic_dataset

    images, labels = synthetic_dataset("MNIST", True, num_samples=bs)
    return {"image": images[:, :size, :size, :], "label": labels}


# ----------------------------------------------------------------- DAE
@pytest.mark.parametrize("noise_type", ["gaussian", "salt_and_pepper"])
def test_dae_trains(rng, noise_type):
    model = load_model(
        {
            "name": "DAE",
            "args": {
                "img_channels": 1,
                "img_size": 28,
                "noise_type": noise_type,
                "noise_level": 0.1,
                "lr": 1e-3,
            },
        }
    )
    state = model.init_state(rng)
    batch = batch_mnist()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first
    out = model.denoise(state, batch, rng)
    assert out.shape == (8, 28, 28, 1)


def test_dae_salt_pepper_bounds(rng):
    model = load_model(
        {
            "name": "DAE",
            "args": {"img_channels": 1, "img_size": 28,
                     "noise_type": "salt_and_pepper", "noise_level": 0.5},
        }
    )
    x = jnp.zeros((4, 28, 28, 1))
    noisy = model.add_noise(x, rng)
    vals = set(np.unique(np.asarray(noisy)).tolist())
    assert vals <= {-1.0, 0.0, 1.0}


# ----------------------------------------------------------------- UNet AE
def test_unet_ae_reconstructs(rng):
    model = load_model(
        {"name": "UNet", "args": {"img_channels": 1, "img_size": 28, "lr": 1e-3,
                                  "base_features": 8}}
    )
    state = model.init_state(rng)
    batch = batch_mnist()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first * 0.8
    recon = model.reconstruct(state, batch)
    assert recon.shape == (8, 28, 28, 1)


# ----------------------------------------------------------------- PixelCNN
def test_causal_mask_golden():
    mask_a = np.asarray(causal_mask(3, 3, "A"))
    mask_b = np.asarray(causal_mask(3, 3, "B"))
    np.testing.assert_array_equal(mask_a, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(mask_b, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def _pixelcnn(size=8, levels=4):
    return load_model(
        {
            "name": "PixelCNN",
            "args": {
                "img_channels": 1,
                "img_size": size,
                "hidden_dim": 16,
                "num_layers": 2,
                "num_levels": levels,
                "lr": 1e-2,
            },
        }
    )


def test_pixelcnn_causality(rng):
    """Output at pixel (i,j) must not depend on input pixels at or after
    (i,j) in raster order — the autoregressive property."""
    model = _pixelcnn()
    state = model.init_state(rng)
    x = jax.random.uniform(rng, (1, 8, 8, 1))

    def logits_at(x, i, j):
        out = model.net.apply({"params": state.params["model"]}, x)
        return out[0, i, j]

    base = logits_at(x, 4, 4)
    # Perturb a FUTURE pixel -> no change.
    x_future = x.at[0, 6, 2, 0].add(10.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(logits_at(x_future, 4, 4)))
    # Perturb the CURRENT pixel -> no change (type-A center mask).
    x_self = x.at[0, 4, 4, 0].add(10.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(logits_at(x_self, 4, 4)))
    # Perturb a PAST pixel -> logits change.
    x_past = x.at[0, 2, 2, 0].add(10.0)
    assert not np.allclose(np.asarray(base), np.asarray(logits_at(x_past, 4, 4)))


def test_pixelcnn_trains_and_samples(rng):
    model = _pixelcnn()
    state = model.init_state(rng)
    rs = np.random.RandomState(0)
    batch = {
        "image": (rs.randint(0, 2, size=(8, 8, 8, 1)) * 255).astype(np.uint8),
        "label": np.zeros(8, np.int32),
    }
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first
    samples = jax.jit(model.sample, static_argnums=2)(state, rng, 2)
    assert samples.shape == (2, 8, 8, 1)
    assert 0.0 <= float(samples.min()) and float(samples.max()) <= 1.0


# ----------------------------------------------------------------- NICE
def _nice(size=8):
    return load_model(
        {
            "name": "NICE",
            "args": {
                "img_channels": 1,
                "img_size": size,
                "hidden_dim": 32,
                "num_coupling_layers": 4,
                "num_hidden_layers": 2,
                "lr": 1e-3,
            },
        }
    )


def test_nice_invertibility(rng):
    """inverse(forward(x)) == x to float precision — exact flow inverse."""
    model = _nice()
    state = model.init_state(rng)
    x = jax.random.uniform(rng, (4, 64))
    z, log_det = model.net.apply({"params": state.params["model"]}, x)
    x_rec = model.net.apply({"params": state.params["model"]}, z, method="inverse")
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
    # log|det| is the sum of scaling logs (additive couplings are volume-
    # preserving).
    expected = float(np.sum(np.asarray(state.params["model"]["log_scale"])))
    assert abs(float(log_det) - expected) < 1e-6


def test_nice_nll_decreases(rng):
    model = _nice()
    state = model.init_state(rng)
    batch = {
        "image": batch_mnist(size=8)["image"],
        "label": np.zeros(8, np.int32),
    }
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(50):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first
    ll = model.log_likelihood(state, batch)
    assert ll.shape == (8,)


def test_nice_sampling(rng):
    model = _nice()
    state = model.init_state(rng)
    imgs = model.sample(state, rng, 3)
    assert imgs.shape == (3, 8, 8, 1)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0
