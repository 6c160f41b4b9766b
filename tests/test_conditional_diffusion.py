"""Class-conditional DDPM + classifier-free guidance (beyond reference).

Semantics pinned here:
- CFG dropout: cond_drop_prob=1 training is bit-identical to training on
  all-null labels (the dropout is a pure label substitution).
- Guidance algebra: w=1 sampling equals purely-conditional sampling; w=0
  equals null-label (unconditional) sampling — both through the doubled-batch
  guided closure, so this also pins that batch doubling changes nothing
  per-sample.
- All three samplers (ddpm/ddim/dpmpp) accept the guided closure unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _tiny_cond(num_classes=3, **kw):
    kw.setdefault("cond_drop_prob", 0.1)
    return DDPM(
        img_channels=1, img_size=8, dim=8, diffusion_timesteps=8,
        sampling_timesteps=4, use_bf16=False, num_classes=num_classes, **kw
    )


def _batch(rng, b=4, num_classes=3):
    img = jax.random.randint(rng, (b, 8, 8, 1), 0, 256, jnp.int32)
    return {
        "image": img.astype(jnp.uint8),
        "label": jnp.arange(b, dtype=jnp.int32) % num_classes,
    }


def test_conditional_train_and_eval_step(rng):
    model = _tiny_cond()
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 9))
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(state.step) == 2
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert np.isfinite(float(ev["val_loss"]))
    # The class embedding actually trains (gradient reaches the table).
    assert "class_emb" in state.params["model"]


def test_cond_drop_prob_one_equals_null_labels(rng):
    """p=1 dropout must produce the exact grads of all-null-label training:
    dropout is where(bernoulli(p), null, label), so p=1 vs p=0-with-null-batch
    differ only in the (discarded) bernoulli draw."""
    m_drop = _tiny_cond(cond_drop_prob=1.0)
    m_none = _tiny_cond(cond_drop_prob=0.0)
    state = jax.jit(m_drop.init_state)(rng)

    batch = _batch(jax.random.fold_in(rng, 5))
    null_batch = dict(batch, label=m_none.null_labels(4))

    g1, met1 = m_drop.grad_step(state, batch, rng)
    g2, met2 = m_none.grad_step(state, null_batch, rng)
    assert float(met1["loss"]) == float(met2["loss"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g1, g2,
    )


def test_guidance_scale_one_is_conditional_zero_is_unconditional(rng):
    model = _tiny_cond()
    state = jax.jit(model.init_state)(rng)
    labels = jnp.array([0, 2], jnp.int32)

    # w=1: u + (c - u) == c -> equals the single-batch conditional closure.
    guided = np.asarray(model.sample_classes(state, rng, labels,
                                             guidance_scale=1.0))
    cond = np.asarray(model.diffusion.sample(
        model._apply_fn(state.ema_params, labels), 2, rng
    ))
    np.testing.assert_allclose(guided, cond, rtol=1e-5, atol=1e-5)

    # w=0: pure unconditional (null labels).
    guided0 = np.asarray(model.sample_classes(state, rng, labels,
                                              guidance_scale=0.0))
    uncond = np.asarray(model.diffusion.sample(
        model._apply_fn(state.ema_params, model.null_labels(2)), 2, rng
    ))
    np.testing.assert_allclose(guided0, uncond, rtol=1e-5, atol=1e-5)


def test_guided_sampling_all_methods(rng):
    model = _tiny_cond()
    state = jax.jit(model.init_state)(rng)
    labels = jnp.array([1, 2], jnp.int32)
    for method, steps in (("ddpm", None), ("ddim", 3), ("dpmpp", 3)):
        a = model.sample_classes(state, rng, labels, method=method, steps=steps)
        b = model.sample_classes(state, rng, labels, method=method, steps=steps)
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == (2, 8, 8, 1), (method, a.shape)
        assert np.all(np.isfinite(a)), method
        assert 0.0 <= a.min() and a.max() <= 1.0, method
        np.testing.assert_array_equal(a, b)


def test_unconditional_sample_api_on_conditional_model(rng):
    """model.sample cycles labels 0..K-1 with guidance (CGAN convention);
    validation_grids emits the per-class grid."""
    model = _tiny_cond(num_classes=3)
    state = jax.jit(model.init_state)(rng)
    imgs = np.asarray(model.sample(state, rng, 5))
    assert imgs.shape == (5, 8, 8, 1)
    grids = model.validation_grids(state, rng)
    assert grids["per_class_generation"].shape == (12, 8, 8, 1)


def test_unet_requires_labels_when_conditional(rng):
    model = _tiny_cond()
    state = jax.jit(model.init_state)(rng)
    with pytest.raises(ValueError, match="requires labels"):
        model.unet.apply(
            {"params": state.params["model"]},
            jnp.zeros((1, 8, 8, 1)), jnp.zeros((1,), jnp.int32),
        )
    with pytest.raises(ValueError, match="sample_classes requires"):
        DDPM(img_channels=1, img_size=8, dim=8, diffusion_timesteps=8,
             use_bf16=False).sample_classes(state, rng, jnp.array([0]))


def test_interpolate_on_conditional_model(rng):
    """Interpolation runs unconditionally (null token) on conditional models."""
    model = _tiny_cond()
    state = jax.jit(model.init_state)(rng)
    x1 = np.zeros((2, 8, 8, 1), np.float32)
    x2 = np.ones((2, 8, 8, 1), np.float32)
    out = np.asarray(model.interpolate(state, x1, x2, rng, t=3))
    assert out.shape == (2, 8, 8, 1) and np.all(np.isfinite(out))
