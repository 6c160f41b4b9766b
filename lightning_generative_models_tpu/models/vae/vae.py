"""VAE: Auto-Encoding Variational Bayes (Kingma & Welling, 2014).

Capability parity with the reference VAE (reference:
models/generative/vae/vae.py:21-268): MLP encoder 512-256-128 with mu/logvar
heads, mirrored tanh decoder, reparameterized sampling, and the loss
``l1(x_hat, x) + kld_weight * KLD`` with KLD averaged over *all* elements
(matching the reference's torch.mean over the full [B, latent] tensor,
vae.py:166).

TPU design: the whole model is two fused MLP stacks — pure MXU matmuls — and
the train step (forward, loss, backward, Adam update) compiles to one XLA
program. The latent-space embedding table logged per validation epoch
(vae.py:228-241) is reproduced by :meth:`encode_for_logging`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


class Encoder(nn.Module):
    latent_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = x.reshape(x.shape[0], -1)
        for width in (512, 256, 128):
            h = nn.Dense(width)(h)
            h = nn.leaky_relu(h, 0.2)
        mu = nn.Dense(self.latent_dim)(h)
        log_var = nn.Dense(self.latent_dim)(h)
        return mu, log_var


class Decoder(nn.Module):
    img_shape: Tuple[int, int, int]  # (H, W, C)

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = z
        for width in (128, 256, 512):
            h = nn.Dense(width)(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(int(np.prod(self.img_shape)))(h)
        h = jnp.tanh(h)
        return h.reshape(h.shape[0], *self.img_shape)


class VAE(GenerativeModel):
    def __init__(
        self,
        img_channels: int,
        img_size: int,
        latent_dim: int = 20,
        lr: float = 1e-4,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        kld_weight: float = 1e-2,
    ):
        super().__init__(img_channels, img_size)
        self.latent_dim = latent_dim
        self.kld_weight = kld_weight
        self.encoder = Encoder(latent_dim)
        self.decoder = Decoder(self.image_shape())
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    # -- state ----------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        enc_rng, dec_rng = jax.random.split(rng)
        dummy = jnp.zeros((1, *self.image_shape()))
        params = {
            "encoder": self.encoder.init(enc_rng, dummy)["params"],
            "decoder": self.decoder.init(dec_rng, jnp.zeros((1, self.latent_dim)))[
                "params"
            ],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    # -- math -----------------------------------------------------------
    def reparameterize(
        self, mu: jax.Array, log_var: jax.Array, rng: jax.Array
    ) -> jax.Array:
        std = jnp.exp(log_var / 2)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + eps * std

    def _loss(
        self, params, x01: jax.Array, rng: jax.Array
    ) -> Tuple[jax.Array, Metrics]:
        x = self.to_model_space(x01)
        mu, log_var = self.encoder.apply({"params": params["encoder"]}, x)
        z = self.reparameterize(mu, log_var, rng)
        x_hat = self.decoder.apply({"params": params["decoder"]}, z)

        recon_loss = jnp.mean(jnp.abs(x_hat - x))
        kld = -0.5 * jnp.mean(1 + log_var - mu**2 - jnp.exp(log_var))
        loss = recon_loss + self.kld_weight * kld
        return loss, {"loss": loss, "recon_loss": recon_loss, "kld": kld}

    # -- steps ----------------------------------------------------------
    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        aug_rng, z_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        x01 = prepare_batch(batch, aug_rng, train=True)["image"]
        return jax.grad(self._loss, has_aux=True)(state.params, x01, z_rng)

    def apply_grad_step(self, state: TrainState, grads, metrics):
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state["model"], state.params
        )
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state={"model": new_opt},
        )
        return new_state, self.prefix_metrics(metrics, "train")

    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        return self.apply_grad_step(state, *self.grad_step(state, batch, rng))

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x01 = prepare_batch(batch, train=False)["image"]
        _, metrics = self._loss(state.params, x01, rng)
        return self.prefix_metrics(metrics, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        z = data_shard(jax.random.normal(rng, (num_samples, self.latent_dim)))
        x_hat = self.decoder.apply({"params": state.params["decoder"]}, z)
        return self.to_image_space(x_hat)

    def reconstruct(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> jax.Array:
        x01 = prepare_batch(batch, train=False)["image"]
        x = self.to_model_space(x01)
        mu, log_var = self.encoder.apply({"params": state.params["encoder"]}, x)
        z = self.reparameterize(mu, log_var, rng)
        x_hat = self.decoder.apply({"params": state.params["decoder"]}, z)
        return self.to_image_space(x_hat)

    def encode_for_logging(self, state: TrainState, batch: Batch) -> np.ndarray:
        """Latent means for the W&B-style latent table (vae.py:228-241)."""
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        mu, _ = self.encoder.apply({"params": state.params["encoder"]}, x)
        return np.asarray(mu)
