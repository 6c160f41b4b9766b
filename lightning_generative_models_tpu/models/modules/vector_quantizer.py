"""Vector quantization: plain and EMA-codebook variants.

Parity with the reference (reference:
models/modules/vector_quantizer.py:8-179): nearest-neighbor assignment via
the expanded L2 distance matrix, straight-through estimator, VQ loss
``mse(q, sg(z)) + commitment_cost * mse(sg(q), z)``, codebook-usage
perplexity, and the EMA variant's Laplace-smoothed cluster-size / embedding
moving averages updated only in training mode.

TPU design:
- inputs are NHWC; the distance computation is one [B*H*W, D] x [D, K]
  matmul (MXU) plus row/col norms — no materialized [N, K, D] broadcast.
- the EMA statistics (cluster counts and embedding sums) are computed with
  one-hot matmuls (MXU) over the *global* batch inside the jitted step, so
  under data parallelism the cross-device reduction is an XLA collective —
  the psum-averaged choice called out in SURVEY §7.3 (the reference updated
  per-replica with no sync).
- EMA state lives in a flax ``codebook`` variable collection (functional
  in-forward side effects, SURVEY §7.1 decision 5).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def nearest_code_indices(flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """argmin_k ||flat_n - codebook_k||^2 via the expanded quadratic form."""
    # ||z||^2 + ||e||^2 - 2 z.e — the cross term is a single MXU matmul.
    distances = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(codebook**2, axis=1)
        - 2.0 * flat @ codebook.T
    )
    return jnp.argmin(distances, axis=1)


def _assign_codes(flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-code assignment with Pallas dispatch for large lookups
    (ops/vq.py: fused distance+argmin, 1.2-1.5x XLA in the 256k-latent regime on v5e)."""
    from lightning_generative_models_tpu.ops.vq import nearest_codes

    return jax.lax.stop_gradient(
        nearest_codes(
            jax.lax.stop_gradient(flat), codebook, use_pallas=True
        )
    )


def perplexity_from_counts(counts: jax.Array, n: jax.Array, eps: float = 1e-10):
    avg_probs = counts / n
    return jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + eps)))


class VectorQuantizer(nn.Module):
    """Trainable-codebook VQ (reference vector_quantizer.py:8-93)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25

    def _codebook_init(self, key, shape, dtype=jnp.float32):
        bound = 1.0 / self.num_embeddings
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    @nn.compact
    def __call__(
        self, latents: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        codebook = self.param(
            "embedding",
            self._codebook_init,
            (self.num_embeddings, self.embedding_dim),
        )
        b, h, w, d = latents.shape
        flat = latents.reshape(-1, d)
        indices = _assign_codes(flat, codebook)
        quantized = codebook[indices].reshape(b, h, w, d)

        # VQ loss (reference naming, vector_quantizer.py:71-78):
        # codebook term + commitment_cost * encoder-commitment term.
        e_latent_loss = jnp.mean((quantized - jax.lax.stop_gradient(latents)) ** 2)
        q_latent_loss = jnp.mean((jax.lax.stop_gradient(quantized) - latents) ** 2)
        vq_loss = e_latent_loss + self.commitment_cost * q_latent_loss

        counts = jnp.zeros(self.num_embeddings).at[indices].add(1.0)
        perplexity = perplexity_from_counts(counts, flat.shape[0])

        # Straight-through estimator (vector_quantizer.py:90-93).
        quantized = latents + jax.lax.stop_gradient(quantized - latents)
        return quantized, vq_loss, perplexity


class VectorQuantizerEMA(nn.Module):
    """EMA-codebook VQ (reference vector_quantizer.py:96-179).

    The codebook is a non-gradient ``codebook`` collection updated in-forward
    during training: Laplace-smoothed cluster sizes and embedding sums with
    decay ``decay``, as in VQ-VAE-2.
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, latents: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        def init_embedding(key=None):
            bound = 1.0 / self.num_embeddings
            return jax.random.uniform(
                self.make_rng("params") if key is None else key,
                (self.num_embeddings, self.embedding_dim),
                jnp.float32,
                -bound,
                bound,
            )

        embedding = self.variable("codebook", "embedding", init_embedding)
        ema_cluster_size = self.variable(
            "codebook", "ema_cluster_size", lambda: jnp.zeros(self.num_embeddings)
        )
        # jnp.copy: a distinct buffer, else donation sees the same array twice.
        ema_embedding = self.variable(
            "codebook", "ema_embedding", lambda: jnp.copy(embedding.value)
        )

        b, h, w, d = latents.shape
        flat = latents.reshape(-1, d)
        codebook = embedding.value
        indices = _assign_codes(flat, codebook)

        counts = jnp.zeros(self.num_embeddings).at[indices].add(1.0)
        perplexity = perplexity_from_counts(counts, flat.shape[0])

        if train and not self.is_initializing():
            # EMA update (reference vector_quantizer.py:128-147), computed on
            # the global batch so data-parallel replicas stay in sync.
            one_hot = jax.nn.one_hot(indices, self.num_embeddings, dtype=flat.dtype)
            new_cluster = ema_cluster_size.value * self.decay + counts * (1 - self.decay)
            n = jnp.sum(new_cluster)
            cluster_weights = (
                (new_cluster + self.epsilon)
                / (n + self.num_embeddings * self.epsilon)
                * n
            )
            dw = one_hot.T @ flat  # [K, D] MXU matmul
            new_ema_emb = ema_embedding.value * self.decay + dw * (1 - self.decay)
            new_embedding = new_ema_emb / cluster_weights[:, None]

            ema_cluster_size.value = new_cluster
            ema_embedding.value = new_ema_emb
            embedding.value = new_embedding
            codebook = new_embedding

        quantized = jax.lax.stop_gradient(codebook[indices]).reshape(b, h, w, d)

        e_latent_loss = jnp.mean((quantized - jax.lax.stop_gradient(latents)) ** 2)
        q_latent_loss = jnp.mean((quantized - latents) ** 2)
        vq_loss = e_latent_loss + self.commitment_cost * q_latent_loss

        quantized = latents + jax.lax.stop_gradient(quantized - latents)
        return quantized, vq_loss, perplexity
