"""GAN family: loss parity vs torch, alternating updates, nested-grad penalties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.base import bce_with_logits
from lightning_generative_models_tpu.registry import load_model


def fixed_batch(bs=8, size=28, ch=1):
    rng = np.random.RandomState(0)
    return {
        "image": rng.randint(0, 256, size=(bs, size, size, ch), dtype=np.uint8),
        "label": rng.randint(0, 10, size=bs).astype(np.int32),
    }


def make(name, **extra):
    base = {"img_channels": 1, "img_size": 28, "latent_dim": 16, "lr": 1e-4}
    base.update(extra)
    return load_model({"name": name, "args": base})


def test_bce_with_logits_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    logits = rng.randn(64).astype(np.float32)
    targets = rng.randint(0, 2, 64).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets)
        )
    )
    assert abs(ours - theirs) < 1e-6


def test_gan_train_step_updates_both_nets(rng):
    model = make("GAN")
    state = model.init_state(rng)
    batch = fixed_batch()
    new_state, metrics = jax.jit(model.train_step, donate_argnums=0)(
        state, batch, rng
    )

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    init_state = model.init_state(rng)
    assert changed(init_state.params["G"], new_state.params["G"])
    assert changed(init_state.params["D"], new_state.params["D"])
    for key in ("train_d_loss", "train_g_loss", "train_logits_real"):
        assert key in metrics
    assert int(new_state.step) == 1


def test_gan_d_learns_on_fixed_data(rng):
    model = make("GAN")
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)
    first_d = None
    for _ in range(30):
        state, metrics = step(state, batch, rng)
        if first_d is None:
            first_d = float(metrics["train_d_loss"])
    assert float(metrics["train_d_loss"]) < first_d


@pytest.mark.parametrize("name,size,ch", [("DCGAN", 28, 1), ("DCGAN", 64, 3),
                                          ("LSGAN", 28, 1), ("R1GAN", 28, 1)])
def test_conv_gans_shapes(rng, name, size, ch):
    """Both reference architecture branches compile and emit correct shapes
    (SURVEY §4: eval_shape over 28x28x1 and 64x64x3)."""
    model = make(name, img_channels=ch, img_size=size)
    state = jax.eval_shape(model.init_state, rng)
    z_shape = jax.eval_shape(
        lambda k: model.sample_z(k, 4), rng
    )
    assert z_shape.shape == (4, 16)
    # real init + one forward
    state = model.init_state(rng)
    images = model.sample(state, rng, 2)
    assert images.shape == (2, size, size, ch)


def test_lsgan_loss_golden(rng):
    """LS losses match closed form on known logits (reference lsgan.py:53-97)."""
    model = make("LSGAN")
    logits = jnp.array([0.0, 2.0])
    d_real = 0.5 * float(jnp.mean((logits - 1) ** 2))
    assert abs(d_real - 0.5 * ((1.0 + 1.0) / 2)) < 1e-6


def test_wgan_interleave_and_clip(rng):
    model = make("WGAN", constraint_method="clip", n_critic=2, clip_value=0.01)
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)

    def g_leaves(s):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(s.params["G"])]

    prev_g = g_leaves(state)
    g_changed_at = []
    for i in range(6):
        state, metrics = step(state, batch, rng)
        cur_g = g_leaves(state)
        if any(not np.allclose(a, b) for a, b in zip(prev_g, cur_g)):
            g_changed_at.append(i)
        prev_g = cur_g
    # n_critic=2: G updates on steps where (step+1) % 3 == 0 -> i = 2, 5.
    assert g_changed_at == [2, 5]
    # Weight clipping bounds every D parameter.
    for leaf in jax.tree_util.tree_leaves(state.params["D"]):
        assert float(jnp.max(jnp.abs(leaf))) <= 0.01 + 1e-7


def test_wgan_gp_double_backward(rng):
    """GP is differentiable w.r.t. D params (the double-backward path,
    reference wgan.py:144-150)."""
    model = make("WGAN", constraint_method="gp", n_critic=1)
    state = model.init_state(rng)
    x = jnp.asarray(fixed_batch()["image"], jnp.float32) / 255.0 * 2 - 1
    x_hat = jnp.zeros_like(x)

    def gp_only(p_d):
        return model._gradient_penalty(p_d, state.mutable["D"], x, x_hat, rng)

    gp_val = gp_only(state.params["D"])
    grads = jax.grad(gp_only)(state.params["D"])
    assert np.isfinite(float(gp_val))
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert sum(norms) > 0, "GP gradient w.r.t. D params is identically zero"


def test_r1_penalty_positive_and_differentiable(rng):
    model = make("R1GAN", r1_penalty=10.0)
    state = model.init_state(rng)
    x = jnp.asarray(fixed_batch()["image"], jnp.float32) / 255.0 * 2 - 1

    def r1_only(p_d):
        return model._r1(p_d, state.mutable["D"], x)

    val = float(r1_only(state.params["D"]))
    grads = jax.grad(r1_only)(state.params["D"])
    assert val > 0
    assert all(
        np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads)
    )


def test_gan_eval_and_sample(rng):
    model = make("GAN")
    state = model.init_state(rng)
    metrics = jax.jit(model.eval_step)(state, fixed_batch(), rng)
    assert "val_d_loss" in metrics and "val_g_loss" in metrics
    imgs = model.sample(state, rng, 4)
    assert imgs.shape == (4, 28, 28, 1)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0
