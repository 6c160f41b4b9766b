"""EDM — Karras et al. 2022 preconditioned diffusion (beyond reference).

Semantics pinned here:
- preconditioning coefficients against hand-computed values, incl. the
  lambda(sigma) * c_out(sigma)^2 = 1 identity that makes the weight-free
  loss form exact;
- sampler exactness: for a constant oracle denoiser D(x; sigma) = c the
  probability-flow ODE dx/dsigma = (x - D)/sigma has the closed-form
  solution x(sigma) = c + (x(sigma_max) - c) * sigma/sigma_max, LINEAR in
  sigma, on which both Euler and Heun are exact at any node count — any
  coefficient, sign, clamping, or grid error breaks the recovery of c;
- the training loss is zero for the oracle network and equals the
  target's mean square for a zero network (probe identity);
- stochastic churn: deterministic per key, a different trajectory from
  the ODE, still finite/in-range;
- the EDM model inherits the full DDPM machinery: EMA weights, host-gated
  EMA step, CFG sampling, per-class grids, checkpoint restore;
- LatentEDM runs the process in the frozen-AE latent space
  (auto_normalize off, sigma_data defaulting to 1.0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.edm import (
    EDM,
    EDMProcess,
)
from lightning_generative_models_tpu.registry import load_model


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def test_preconditioning_coefficients():
    p = EDMProcess(img_size=4, sigma_data=0.5)
    sigma = jnp.asarray([0.5, 2.0])
    c_skip, c_out, c_in, c_noise = p.coeffs(sigma)
    # At sigma = sigma_data: c_skip = 1/2, c_out = sd/sqrt(2), c_in = 1/(sd*sqrt(2)).
    np.testing.assert_allclose(float(c_skip[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(c_out[0]), 0.5 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(float(c_in[0]), 1 / (0.5 * np.sqrt(2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), np.log([0.5, 2.0]) / 4,
                               rtol=1e-6)
    # The identity behind the weight-free loss: lambda * c_out^2 = 1.
    lam = (sigma**2 + p.sigma_data**2) / (sigma * p.sigma_data) ** 2
    np.testing.assert_allclose(np.asarray(lam * c_out**2), 1.0, rtol=1e-6)


def _constant_denoiser(p: EDMProcess, c: jax.Array):
    """Oracle raw network F making the preconditioned D(x; sigma) = c:
    inverts the c_in scaling and the c_noise*time_scale embedding input."""

    def apply_fn(x_in, t_scaled, sc=None):
        sigma = jnp.exp(4.0 * t_scaled / p.time_scale)
        c_skip, c_out, c_in, _ = p.coeffs(sigma)
        shape = (-1,) + (1,) * (x_in.ndim - 1)
        x = x_in / c_in.reshape(shape)
        return (c - c_skip.reshape(shape) * x) / c_out.reshape(shape)

    return apply_fn


@pytest.mark.parametrize("method", ["euler", "heun"])
@pytest.mark.parametrize("steps", [1, 7])
def test_sampler_exact_on_constant_denoiser(rng, method, steps):
    p = EDMProcess(img_size=4, channels=1, sampling_steps=steps)
    c = 0.3
    imgs = p.sample(
        _constant_denoiser(p, jnp.full((1, 4, 4, 1), c)),
        batch_size=2, rng=rng, method=method, steps=steps,
    )
    # ODE solution: x(0) = c exactly; unnormalize maps it to (c+1)/2.
    np.testing.assert_allclose(np.asarray(imgs), (c + 1) / 2, atol=2e-4)


def test_interpolate_exact_on_constant_denoiser(rng):
    p = EDMProcess(img_size=4, channels=1, sampling_steps=8)
    c = -0.2
    out = p.interpolate(
        _constant_denoiser(p, jnp.full((1, 4, 4, 1), c)),
        jnp.full((2, 4, 4, 1), 0.1), jnp.full((2, 4, 4, 1), 0.9),
        rng, t=0.8,
    )
    # The truncated grid integrates x(sigma_t) -> x(sigma_min) -> 0; for the
    # constant field the endpoint is c regardless of the mixed start.
    np.testing.assert_allclose(np.asarray(out), (c + 1) / 2, atol=2e-3)


def test_loss_identity_and_oracle_zero(rng):
    p = EDMProcess(img_size=4, channels=1)
    x01 = jax.random.uniform(rng, (8, 4, 4, 1))
    x0 = p.normalize(x01)

    seen = {}

    def probe(x_in, t_scaled, sc=None):
        seen["x_in"], seen["t"] = x_in, t_scaled
        return jnp.zeros_like(x_in)

    loss0 = p.p_losses(probe, x01, rng)
    sigma = jnp.exp(4.0 * seen["t"] / p.time_scale)
    c_skip, c_out, c_in, _ = p.coeffs(sigma)
    shape = (-1, 1, 1, 1)
    x_t = seen["x_in"] / c_in.reshape(shape)
    target = (x0 - c_skip.reshape(shape) * x_t) / c_out.reshape(shape)
    np.testing.assert_allclose(float(loss0), float(jnp.mean(target**2)),
                               rtol=1e-4)

    def oracle(x_in, t_scaled, sc=None):
        s = jnp.exp(4.0 * t_scaled / p.time_scale)
        cs, co, ci, _ = p.coeffs(s)
        xt = x_in / ci.reshape(shape)
        return (x0 - cs.reshape(shape) * xt) / co.reshape(shape)

    assert float(p.p_losses(oracle, x01, rng)) == pytest.approx(0.0, abs=1e-7)


def test_sigma_grid_and_churn(rng):
    p = EDMProcess(img_size=4, channels=1, sampling_steps=5)
    g = p.sigma_grid(5)
    assert g.shape == (6,) and g[0] == p.sigma_max and g[-1] == 0.0
    np.testing.assert_allclose(g[-2], p.sigma_min, rtol=1e-12)
    assert np.all(np.diff(g) < 0)  # strictly decreasing
    assert p.sigma_grid(1).tolist() == [p.sigma_max, 0.0]

    def apply_fn(x, t, sc=None):
        return jnp.tanh(x)

    det = EDMProcess(img_size=4, channels=1, sampling_steps=4)
    churn = EDMProcess(img_size=4, channels=1, sampling_steps=4,
                       s_churn=4.0, s_tmin=0.05, s_tmax=50.0)
    a = det.sample(apply_fn, 2, rng)
    b = churn.sample(apply_fn, 2, rng)
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(det.sample(apply_fn, 2, rng))
    )
    np.testing.assert_array_equal(
        np.asarray(b), np.asarray(churn.sample(apply_fn, 2, rng))
    )
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(b)))
    assert float(b.min()) >= 0.0 and float(b.max()) <= 1.0


def test_invalid_solver_and_params():
    with pytest.raises(ValueError, match="EDM solver"):
        EDMProcess(img_size=4, solver="midpoint")
    with pytest.raises(ValueError, match="sigma_min"):
        EDMProcess(img_size=4, sigma_min=0.0)
    p = EDMProcess(img_size=4)
    with pytest.raises(ValueError, match="not ddpm/ddim"):
        p.sample(lambda x, t, sc=None: x, 1, jax.random.PRNGKey(0),
                 method="ddim")


def _tiny_edm(**kw):
    args = {
        "img_size": 16, "img_channels": 1, "dim": 8, "dim_mults": [1, 2],
        "sampling_steps": 3, "use_bf16": False, "lr": 1e-3,
        "ema_update_after_step": 1, "ema_update_every": 1,
    }
    args.update(kw)
    return load_model({"name": "EDM", "args": args})


def _batch(rng, b=4, classes=0):
    return {
        "image": jax.random.randint(rng, (b, 16, 16, 1), 0, 256, jnp.uint8),
        "label": (jax.random.randint(rng, (b,), 0, classes, jnp.int32)
                  if classes else jnp.zeros((b,), jnp.int32)),
    }


def test_model_trains_and_samples(rng):
    model = _tiny_edm()
    assert isinstance(model, EDM)
    state = jax.jit(model.init_state)(rng)
    step = jax.jit(model.train_step, donate_argnums=0)
    ev = jax.jit(model.eval_step)
    batch = _batch(jax.random.fold_in(rng, 1))
    # The per-step train loss is high-variance (a fresh log-normal sigma
    # draw each step), so learning is checked on a FIXED eval key: the same
    # (sigma, noise) draws, before vs after 8 steps.
    loss_before = float(ev(state, batch, rng)["val_loss"])
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["train_loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 8
    loss_after = float(ev(state, batch, rng)["val_loss"])
    assert np.isfinite(loss_after)
    assert loss_after < loss_before

    for method in ("euler", "heun"):
        imgs = model.sample(state, rng, 2, method=method, steps=2)
        assert imgs.shape == (2, 16, 16, 1)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0

    out = model.interpolate(
        state,
        jax.random.uniform(rng, (2, 16, 16, 1)),
        jax.random.uniform(jax.random.fold_in(rng, 9), (2, 16, 16, 1)),
        rng,
    )
    assert out.shape == (2, 16, 16, 1)


def test_gated_ema_step_matches_plain(rng):
    model = _tiny_edm(ema_update_after_step=0, ema_update_every=2)
    state_a = model.init_state(rng)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    batch = _batch(rng)
    plain = jax.jit(model.train_step)
    gated = {
        flag: jax.jit(lambda s, b, r, f=flag: model.train_step_gated(s, b, r, f))
        for flag in (True, False)
    }
    for i in range(4):
        r = jax.random.fold_in(rng, i)
        state_a, _ = plain(state_a, batch, r)
        state_b, _ = gated[model.ema_step_needed(int(state_b.step) + 1)](
            state_b, batch, r
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_a)),
        jax.tree_util.tree_leaves(jax.device_get(state_b)),
    ):
        np.testing.assert_array_equal(a, b)


def test_conditional_cfg_edm(rng):
    model = _tiny_edm(num_classes=3, guidance_scale=2.0)
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 2), classes=3)
    state, metrics = jax.jit(model.train_step, donate_argnums=0)(
        state, batch, rng
    )
    assert np.isfinite(float(metrics["train_loss"]))
    imgs = model.sample_classes(state, rng, jnp.array([0, 1, 2]), steps=2)
    assert imgs.shape == (3, 16, 16, 1)
    # w=0 guided == unconditional closure on the same x(sigma_max): D is
    # affine in the raw output F, so CFG on F is exact.
    uncond = model.sample_classes(
        state, rng, jnp.array([0, 1, 2]), guidance_scale=0.0, steps=2
    )
    null = model.diffusion.sample(
        model._apply_fn(state.ema_params, model.null_labels(3)), 3, rng, steps=2
    )
    np.testing.assert_allclose(np.asarray(uncond), np.asarray(null), atol=1e-5)
    grids = model.validation_grids(state, rng)
    assert grids["per_class_generation"].shape == (12, 16, 16, 1)


def test_latent_edm(rng):
    model = load_model({"name": "LatentEDM", "args": {
        "img_size": 32, "img_channels": 3,
        "autoencoder": {"config_path": "configs/vae/vqvae_cifar10.json"},
        "dim": 8, "dim_mults": [1, 2], "sampling_steps": 3,
        "use_bf16": False, "ema_update_after_step": 1, "ema_update_every": 1,
    }})
    assert isinstance(model.diffusion, EDMProcess)
    assert model.diffusion.img_size == model.latent_hw == 4
    assert model.diffusion.channels == model.latent_c == 64
    assert model.diffusion.auto_normalize is False
    assert model.diffusion.sigma_data == 1.0  # unit-variance latent default

    state = jax.jit(model.init_state)(rng)
    ae_before = jax.tree_util.tree_map(np.asarray, jax.device_get(state.mutable))
    step = jax.jit(model.train_step, donate_argnums=0)
    batch = {
        "image": jax.random.randint(rng, (4, 32, 32, 3), 0, 256, jnp.uint8),
        "label": jnp.zeros((4,), jnp.int32),
    }
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    assert np.isfinite(float(metrics["train_loss"]))
    for a, b in zip(
        jax.tree_util.tree_leaves(ae_before),
        jax.tree_util.tree_leaves(jax.device_get(state.mutable)),
    ):
        np.testing.assert_array_equal(a, b)  # AE frozen

    for method in ("euler", "heun"):
        imgs = model.sample(state, rng, 2, method=method, steps=2)
        assert imgs.shape == (2, 32, 32, 3)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_checkpoint_roundtrip(rng, tmp_path):
    from lightning_generative_models_tpu.train.checkpoint import CheckpointManager

    model = _tiny_edm()
    state = model.init_state(rng)
    state, _ = jax.jit(model.train_step, donate_argnums=0)(
        state, _batch(rng), rng
    )
    mgr = CheckpointManager(tmp_path / "checkpoints", monitor=model.monitor)
    mgr.save_last(state, step=1, epoch=0)
    template = jax.tree_util.tree_map(jnp.zeros_like, model.init_state(rng))
    restored, step, _ = mgr.restore(template, "last")
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(jax.device_get(restored)),
    ):
        np.testing.assert_array_equal(a, b)
