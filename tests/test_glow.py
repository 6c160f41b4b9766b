"""Glow: exact invertibility, Jacobian log-det parity, training mechanics.

The log-det test is the strong pin: the model's analytic log|det J| must
match slogdet of the autograd Jacobian of the full multi-scale flow — any
error in actnorm/1x1/coupling determinant bookkeeping or in the
squeeze/split plumbing breaks it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.flow.glow import (
    squeeze2x2,
    unsqueeze2x2,
)
from lightning_generative_models_tpu.registry import load_model


def _glow(size=8, channels=1, levels=2, depth=2, width=8, **kw):
    return load_model(
        {
            "name": "Glow",
            "args": {
                "img_channels": channels,
                "img_size": size,
                "levels": levels,
                "depth": depth,
                "width": width,
                "lr": 1e-3,
                **kw,
            },
        }
    )


def test_squeeze_roundtrip(rng):
    x = jax.random.normal(rng, (2, 8, 8, 3))
    y = squeeze2x2(x)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(np.asarray(unsqueeze2x2(y)), np.asarray(x))


def test_glow_invertibility(rng):
    """inverse(forward(x)) == x through squeeze/steps/split at 2 levels."""
    model = _glow()
    # Perturb params away from the zero/orthogonal init so the test
    # exercises non-identity couplings and actnorms.
    state = model.init_state(rng)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        state.params["model"],
    )
    x = jax.random.uniform(rng, (4, 8, 8, 1)) - 0.5
    z, log_det = model.net.apply({"params": params}, x)
    assert z.shape == (4, 64) and log_det.shape == (4,)
    x_rec = model.net.apply({"params": params}, z, method="inverse")
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


def test_glow_logdet_matches_autograd_jacobian(rng):
    """Analytic log|det J| == slogdet(jacobian(forward)) per example."""
    model = _glow(size=4, levels=2, depth=2, width=8)
    state = model.init_state(rng)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(2), p.shape),
        state.params["model"],
    )

    def fwd_flat(x_flat):
        x = x_flat.reshape(1, 4, 4, 1)
        z, _ = model.net.apply({"params": params}, x)
        return z[0]

    x_flat = jax.random.uniform(rng, (16,)) - 0.5
    jac = jax.jacfwd(fwd_flat)(x_flat)
    _, ref_logdet = np.linalg.slogdet(np.asarray(jac, np.float64))
    _, model_logdet = model.net.apply(
        {"params": params}, x_flat.reshape(1, 4, 4, 1)
    )
    np.testing.assert_allclose(float(model_logdet[0]), ref_logdet, atol=1e-4)


def test_glow_identity_at_init(rng):
    """Orthogonal 1x1 + zero-init couplings: log|det| is the deterministic
    actnorm/coupling constant and z is a rotation of x (norm-preserving up
    to the sigmoid(2) coupling scale)."""
    model = _glow(size=4, levels=1, depth=1, width=8)
    state = model.init_state(rng)
    x = jax.random.uniform(rng, (2, 4, 4, 1)) - 0.5
    z, log_det = model.net.apply({"params": state.params["model"]}, x)
    # actnorm logdet 0, 1x1 logdet 0 (orthogonal), coupling log sigmoid(2)
    # over the 8 transformed dims.
    expected = 8 * float(np.log(jax.nn.sigmoid(2.0)))
    np.testing.assert_allclose(np.asarray(log_det), expected, atol=1e-5)


def test_glow_nll_decreases(rng):
    model = _glow()
    state = model.init_state(rng)
    from lightning_generative_models_tpu.data.datasets import synthetic_dataset

    images, labels = synthetic_dataset("MNIST", True, num_samples=8)
    batch = {"image": images[:, :8, :8, :], "label": labels}
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(40):
        state, metrics = step(state, batch, rng)
        first = first or float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first
    assert np.isfinite(float(metrics["train_bits_per_dim"]))
    ll = model.log_likelihood(state, batch)
    assert ll.shape == (8,)
    val = model.eval_step(state, batch, rng)
    assert "val_loss" in val and "val_bits_per_dim" in val


def test_glow_sampling(rng):
    model = _glow(sample_temperature=0.7)
    state = model.init_state(rng)
    imgs = model.sample(state, rng, 3)
    assert imgs.shape == (3, 8, 8, 1)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_glow_rejects_indivisible_size():
    with pytest.raises(ValueError, match="divisible"):
        _glow(size=28, levels=3)
