"""Optimizer semantics vs torch: the reference's Adam/RMSprop behavior."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.train.state import make_adam, make_rmsprop


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


def test_rmsprop_matches_torch():
    import torch

    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    ours = _run_jax(make_rmsprop(1e-2), 25, w0, quad_grad)
    theirs = _run_torch(torch.optim.RMSprop, dict(lr=1e-2), 25, w0, quad_grad)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
