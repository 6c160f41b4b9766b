"""VQ-VAE: quantizer golden math, STE gradients, EMA codebook updates, training."""

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.models.modules.vector_quantizer import (
    VectorQuantizer,
    VectorQuantizerEMA,
    nearest_code_indices,
)
from lightning_generative_models_tpu.registry import load_model


def fixed_batch(bs=8, size=32, ch=3):
    # Structured images (not pure noise) so reconstruction has signal to fit.
    from lightning_generative_models_tpu.data.datasets import synthetic_dataset

    images, labels = synthetic_dataset("CIFAR10", train=True, num_samples=bs)
    return {"image": images, "label": labels}


def make(use_ema: bool):
    return load_model(
        {
            "name": "VQVAE",
            "args": {
                "img_channels": 3,
                "img_size": 32,
                "embedding_dim": 8,
                "num_embeddings": 16,
                "hidden_dim": 32,
                "num_residual_layers": 1,
                "num_residual_hiddens": 8,
                "commitment_cost": 0.25,
                "use_ema": use_ema,
                "lr": 1e-3,
                "loss_weights": {"recon_loss": 1, "vq_loss": 1},
            },
        }
    )


def test_nearest_code_golden():
    codebook = jnp.array([[0.0, 0.0], [1.0, 1.0], [-1.0, 2.0]])
    flat = jnp.array([[0.1, -0.1], [0.9, 1.2], [-0.8, 1.7]])
    idx = nearest_code_indices(flat, codebook)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])


def test_plain_vq_ste_gradient(rng):
    """Straight-through: d(quantized)/d(latents) is identity
    (reference vector_quantizer.py:90-93)."""
    vq = VectorQuantizer(num_embeddings=4, embedding_dim=2)
    latents = jax.random.normal(rng, (1, 2, 2, 2))
    variables = vq.init(rng, latents, train=False)

    def out_sum(lat):
        q, _, _ = vq.apply(variables, lat, train=False)
        return q.sum()

    grad = jax.grad(out_sum)(latents)
    np.testing.assert_allclose(np.asarray(grad), np.ones_like(grad), rtol=1e-6)


def test_plain_vq_loss_golden(rng):
    """vq_loss = mse(q, sg(z)) + beta*mse(sg(q), z) (vector_quantizer.py:71-78)."""
    vq = VectorQuantizer(num_embeddings=2, embedding_dim=1, commitment_cost=0.5)
    variables = {"params": {"embedding": jnp.array([[0.0], [1.0]])}}
    latents = jnp.array([[[[0.2]]]])  # nearest code: 0.0
    q, vq_loss, ppl = vq.apply(variables, latents, train=False)
    # mse(q=0, z=0.2) = 0.04 for both terms -> 0.04 + 0.5*0.04 = 0.06
    assert abs(float(vq_loss) - 0.06) < 1e-6
    assert abs(float(ppl) - 1.0) < 1e-6  # single code used


def test_ema_update_matches_reference_formula(rng):
    """One EMA step vs hand-computed Laplace-smoothed update
    (reference vector_quantizer.py:128-147)."""
    decay, eps = 0.5, 1e-5
    vq = VectorQuantizerEMA(
        num_embeddings=2, embedding_dim=1, decay=decay, epsilon=eps
    )
    latents = jnp.array([[[[0.2], [0.1]], [[0.9], [1.1]]]])  # [1,2,2,1]
    variables = vq.init(rng, latents, train=False)
    cb = {
        "embedding": jnp.array([[0.0], [1.0]]),
        "ema_cluster_size": jnp.zeros(2),
        "ema_embedding": jnp.array([[0.0], [1.0]]),
    }
    (q, _, _), updated = vq.apply(
        {"params": {}, "codebook": cb}, latents, train=True, mutable=["codebook"]
    )
    new = updated["codebook"]
    # Assignments: [0.2, 0.1] -> code 0; [0.9, 1.1] -> code 1; counts [2, 2].
    expect_cluster = 0.5 * 0 + 0.5 * 2
    np.testing.assert_allclose(np.asarray(new["ema_cluster_size"]),
                               [expect_cluster] * 2, rtol=1e-6)
    # dw = sums: code0 gets 0.3, code1 gets 2.0
    np.testing.assert_allclose(
        np.asarray(new["ema_embedding"])[:, 0],
        [0.5 * 0.0 + 0.5 * 0.3, 0.5 * 1.0 + 0.5 * 2.0],
        rtol=1e-6,
    )
    n = 2 * expect_cluster
    weights = (expect_cluster + eps) / (n + 2 * eps) * n
    np.testing.assert_allclose(
        np.asarray(new["embedding"])[:, 0],
        np.asarray(new["ema_embedding"])[:, 0] / weights,
        rtol=1e-6,
    )


def test_vqvae_overfit_plain(rng):
    model = make(use_ema=False)
    state = model.init_state(rng)
    batch = fixed_batch()
    step = jax.jit(model.train_step, donate_argnums=0)
    first = None
    for _ in range(40):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["train_recon_loss"])
    assert float(metrics["train_recon_loss"]) < first * 0.9
    assert float(metrics["train_perplexity"]) >= 1.0


def test_vqvae_ema_trains_and_codebook_moves(rng):
    model = make(use_ema=True)
    state = model.init_state(rng)
    batch = fixed_batch()
    cb0 = np.asarray(state.mutable["vq"]["codebook"]["embedding"]).copy()
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(5):
        state, metrics = step(state, batch, rng)
    cb1 = np.asarray(state.mutable["vq"]["codebook"]["embedding"])
    assert not np.allclose(cb0, cb1), "EMA codebook did not update"
    # Eval must NOT update the codebook.
    state_before = np.asarray(state.mutable["vq"]["codebook"]["embedding"]).copy()
    jax.jit(model.eval_step)(state, batch, rng)
    np.testing.assert_array_equal(
        state_before, np.asarray(state.mutable["vq"]["codebook"]["embedding"])
    )


def test_vqvae_sample_and_reconstruct(rng):
    model = make(use_ema=True)
    state = model.init_state(rng)
    imgs = model.sample(state, rng, 4)
    assert imgs.shape == (4, 32, 32, 3)
    recon = model.reconstruct(state, fixed_batch())
    assert recon.shape == (8, 32, 32, 3)
