"""Optimizer semantics vs torch: the reference's Adam/RMSprop behavior."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.train.state import (
    make_adam,
    make_rmsprop,
    set_default_mu_dtype,
    set_default_nu_dtype,
)


def _run_jax(opt, steps, w0, grad_fn):
    w = jnp.asarray(w0)
    state = opt.init(w)
    for _ in range(steps):
        g = grad_fn(w)
        updates, state = opt.update(g, state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


def _run_torch(torch_opt_cls, kwargs, steps, w0, grad_fn):
    import torch

    w = torch.tensor(np.asarray(w0), requires_grad=True)
    opt = torch_opt_cls([w], **kwargs)
    for _ in range(steps):
        opt.zero_grad()
        g = grad_fn(jnp.asarray(w.detach().numpy()))
        w.grad = torch.tensor(np.asarray(g))
        opt.step()
    return w.detach().numpy()


def quad_grad(w):
    return 2.0 * (w - 3.0)


def test_adam_with_weight_decay_matches_torch():
    """make_adam reproduces torch.optim.Adam incl. its coupled L2 weight
    decay (gradient += wd * w, NOT AdamW) — reference optimizer settings."""
    import torch

    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    ours = _run_jax(make_adam(1e-2, 0.5, 0.999, weight_decay=0.1), 25, w0, quad_grad)
    theirs = _run_torch(
        torch.optim.Adam,
        dict(lr=1e-2, betas=(0.5, 0.999), weight_decay=0.1),
        25, w0, quad_grad,
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_mu_dtype_bf16_opt_in():
    """--mu_dtype bfloat16: mu is stored bf16 (nu stays f32) and the
    trajectory stays close to the f32-mu run (the measured-win opt-in;
    scripts/conv_attack.py mubf16: +1.7% on the v5e DDPM step)."""
    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    f32 = _run_jax(make_adam(1e-2, 0.9, 0.999), 25, w0, quad_grad)
    set_default_mu_dtype(jnp.bfloat16)
    try:
        opt = make_adam(1e-2, 0.9, 0.999)
        state = opt.init(jnp.asarray(w0))
        adam_state = state[0]  # scale_by_adam inside the chain
        assert adam_state.mu.dtype == jnp.bfloat16
        assert adam_state.nu.dtype == jnp.float32
        bf16 = _run_jax(opt, 25, w0, quad_grad)
    finally:
        set_default_mu_dtype(None)
    np.testing.assert_allclose(bf16, f32, rtol=2e-2, atol=2e-2)
    # and the global is properly restored for subsequent tests
    assert make_adam(1e-2).init(jnp.asarray(w0))[0].mu.dtype == jnp.float32


def test_nu_dtype_bf16_opt_in():
    """--nu_dtype bfloat16: nu stored bf16 through the with_nu_dtype
    wrapper (structure unchanged — chain tuple preserved), trajectory
    close to f32, weight decay still composes."""
    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    f32 = _run_jax(make_adam(1e-2, 0.9, 0.999, weight_decay=0.1), 25, w0, quad_grad)
    set_default_nu_dtype(jnp.bfloat16)
    try:
        opt = make_adam(1e-2, 0.9, 0.999, weight_decay=0.1)
        state = opt.init(jnp.asarray(w0))
        # weight decay prepends a transform: find the adam state in the chain
        adam_state = next(s for s in state if hasattr(s, "nu"))
        assert adam_state.nu.dtype == jnp.bfloat16
        assert adam_state.mu.dtype == jnp.float32
        bf16 = _run_jax(opt, 25, w0, quad_grad)
    finally:
        set_default_nu_dtype(None)
    np.testing.assert_allclose(bf16, f32, rtol=2e-2, atol=2e-2)
    assert next(
        s for s in make_adam(1e-2).init(jnp.asarray(w0)) if hasattr(s, "nu")
    ).nu.dtype == jnp.float32


def test_ddpm_optimizer_respects_mu_dtype():
    """DDPM builds its optimizer at __init__ via optax.adam directly — it
    must also consult the process-wide mu dtype (train.py --mu_dtype)."""
    from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM

    set_default_mu_dtype(jnp.bfloat16)
    set_default_nu_dtype(jnp.bfloat16)
    try:
        m = DDPM(img_size=8, img_channels=1, diffusion_timesteps=8, dim=8)
        state = m.init_state(jax.random.PRNGKey(0))
        adam_state = state.opt_state["model"][0]
        assert jax.tree_util.tree_leaves(adam_state.mu)[0].dtype == jnp.bfloat16
        assert jax.tree_util.tree_leaves(adam_state.nu)[0].dtype == jnp.bfloat16
    finally:
        set_default_mu_dtype(None)
        set_default_nu_dtype(None)


def test_rmsprop_matches_torch():
    import torch

    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    ours = _run_jax(make_rmsprop(1e-2), 25, w0, quad_grad)
    theirs = _run_torch(torch.optim.RMSprop, dict(lr=1e-2), 25, w0, quad_grad)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
