"""DAE: denoising autoencoder.

Parity with the reference DAE (reference:
models/generative/autoencoder/dae.py:12-229): MLP encoder 784->256->128,
decoder 128->256->784 with tanh; gaussian or salt-and-pepper input noise
(dae.py:167-206); MSE reconstruction against the clean input.
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


class MLPAutoencoder(nn.Module):
    img_shape: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        flat = x.reshape(x.shape[0], -1)
        h = nn.relu(nn.Dense(256)(flat))
        h = nn.relu(nn.Dense(128)(h))
        h = nn.relu(nn.Dense(256)(h))
        h = jnp.tanh(nn.Dense(int(np.prod(self.img_shape)))(h))
        return h.reshape(x.shape[0], *self.img_shape)


class DAE(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        noise_type: str = "gaussian",
        noise_level: float = 0.1,
        lr: float = 1e-4,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 0.0,
    ):
        super().__init__(img_channels, img_size)
        if noise_type not in ("gaussian", "salt_and_pepper"):
            raise ValueError("Invalid noise type specified")
        self.noise_type = noise_type
        self.noise_level = noise_level
        self.net = MLPAutoencoder(self.image_shape())
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.net.init(rng, jnp.zeros((1, *self.image_shape())))["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    def add_noise(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Reference dae.py:167-206 (x here in [-1, 1] model space)."""
        if self.noise_type == "gaussian":
            return x + jax.random.normal(rng, x.shape) * self.noise_level
        # salt & pepper: flip pixels to min/max with prob noise_level each.
        salt_rng, pepper_rng = jax.random.split(rng)
        salted = jnp.where(
            jax.random.bernoulli(salt_rng, self.noise_level / 2, x.shape), 1.0, x
        )
        return jnp.where(
            jax.random.bernoulli(pepper_rng, self.noise_level / 2, x.shape),
            -1.0,
            salted,
        )

    def _loss(self, params, x01, rng):
        x = self.to_model_space(x01)
        noisy = self.add_noise(x, rng)
        x_hat = self.net.apply({"params": params}, noisy)
        loss = jnp.mean((x_hat - x) ** 2)
        return loss, {"loss": loss}

    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, noise_rng = jax.random.split(rng)
        x01 = prepare_batch(batch, aug_rng, train=True)["image"]
        return jax.grad(lambda p: self._loss(p, x01, noise_rng), has_aux=True)(
            state.params["model"]
        )

    def apply_grad_step(self, state: TrainState, grads, metrics):
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state["model"], state.params["model"]
        )
        new_state = state.replace(
            step=state.step + 1,
            params={"model": optax.apply_updates(state.params["model"], updates)},
            opt_state={"model": new_opt},
        )
        return new_state, self.prefix_metrics(metrics, "train")

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        return self.apply_grad_step(state, *self.grad_step(state, batch, rng))

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x01 = prepare_batch(batch, train=False)["image"]
        _, metrics = self._loss(state.params["model"], x01, jax.random.fold_in(rng, 1))
        return self.prefix_metrics(metrics, "val")

    def denoise(self, state: TrainState, batch: Batch, rng: jax.Array) -> jax.Array:
        x01 = prepare_batch(batch, train=False)["image"]
        noisy = self.add_noise(self.to_model_space(x01), rng)
        x_hat = self.net.apply({"params": state.params["model"]}, noisy)
        return self.to_image_space(x_hat)

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int):
        """DAE has no prior; decode gaussian noise images as a diagnostic."""
        noise = data_shard(jax.random.normal(rng, (num_samples, *self.image_shape())))
        x_hat = self.net.apply({"params": state.params["model"]}, noise)
        return self.to_image_space(x_hat)
