"""UNet autoencoder: classic skip-connection UNet with an identity objective.

Parity with the reference UNet (reference:
models/generative/autoencoder/unet.py:8-150): double-conv encoder stages with
max-pool downsampling, transposed-conv decoder stages with skip
concatenation, MSE identity reconstruction. The reference version was
unreachable through its loader (no config, class/module name mismatch); here
it is registered as ``UNet`` with a config (configs/autoencoder/unet.json).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        return x


class UNetAENet(nn.Module):
    out_channels: int
    base_features: int = 64
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        skips = []
        feats = self.base_features
        for _ in range(self.depth):
            x = DoubleConv(feats)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            feats *= 2
        x = DoubleConv(feats)(x)
        for _ in range(self.depth):
            feats //= 2
            x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = DoubleConv(feats)(x)
        return jnp.tanh(nn.Conv(self.out_channels, (1, 1))(x))


class UNetAE(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        base_features: int = 64,
        depth: int = 2,
        lr: float = 1e-4,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 0.0,
    ):
        super().__init__(img_channels, img_size)
        if img_size % (2**depth) != 0:
            raise ValueError(f"img_size {img_size} not divisible by {2 ** depth}")
        self.net = UNetAENet(img_channels, base_features, depth)
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.net.init(rng, jnp.zeros((1, *self.image_shape())))["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    def _loss(self, params, x01):
        x = self.to_model_space(x01)
        x_hat = self.net.apply({"params": params}, x)
        loss = jnp.mean((x_hat - x) ** 2)
        return loss, {"loss": loss}

    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        aug_rng = jax.random.fold_in(rng, state.step)
        x01 = prepare_batch(batch, aug_rng, train=True)["image"]
        return jax.grad(lambda p: self._loss(p, x01), has_aux=True)(
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
        _, metrics = self._loss(state.params["model"], x01)
        return self.prefix_metrics(metrics, "val")

    def reconstruct(self, state: TrainState, batch: Batch) -> jax.Array:
        x01 = prepare_batch(batch, train=False)["image"]
        x_hat = self.net.apply(
            {"params": state.params["model"]}, self.to_model_space(x01)
        )
        return self.to_image_space(x_hat)

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int):
        raise NotImplementedError("UNet autoencoder has no generative prior")
