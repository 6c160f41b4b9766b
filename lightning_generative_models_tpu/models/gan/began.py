"""BEGAN: boundary equilibrium GAN (Berthelot et al. 2017).

Implementation of the reference's empty stub (reference:
models/generative/gan/began.py:1-10 is a docstring only; SURVEY §2.4).

The discriminator is a convolutional autoencoder scored by pixel L1
reconstruction error ``L(v) = |v - AE(v)|``. Losses:

- D: ``L(x) - k_t * L(G(z))``
- G: ``L(G(z))``
- equilibrium: ``k_{t+1} = k_t + lambda_k * (gamma * L(x) - L(G(z)))``,
  clipped to [0, 1]; ``k_t`` lives in TrainState.mutable.
- convergence measure ``M = L(x) + |gamma * L(x) - L(G(z))|`` is logged.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.base import (
    Batch,
    Metrics,
)
from lightning_generative_models_tpu.models.gan.gan import GAN
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState


class BEGANDecoder(nn.Module):
    img_size: int
    img_channels: int
    hidden_dim: int

    @nn.compact
    def __call__(self, h):
        seed = self.img_size // 4
        x = nn.Dense(seed * seed * self.hidden_dim)(h)
        x = x.reshape(x.shape[0], seed, seed, self.hidden_dim)
        for _ in range(2):
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="nearest")
            x = nn.elu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(x))
            x = nn.elu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(x))
        return jnp.tanh(nn.Conv(self.img_channels, (3, 3), padding="SAME")(x))


class BEGANEncoder(nn.Module):
    hidden_dim: int
    latent_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.elu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(x))
        for mult in (1, 2):
            h = nn.elu(nn.Conv(self.hidden_dim * mult, (3, 3), strides=(2, 2),
                               padding="SAME")(h))
            h = nn.elu(nn.Conv(self.hidden_dim * mult, (3, 3), padding="SAME")(h))
        return nn.Dense(self.latent_dim)(h.reshape(h.shape[0], -1))


class BEGANAutoencoderD(nn.Module):
    img_size: int
    img_channels: int
    hidden_dim: int
    latent_dim: int

    @nn.compact
    def __call__(self, x):
        h = BEGANEncoder(self.hidden_dim, self.latent_dim)(x)
        return BEGANDecoder(self.img_size, self.img_channels, self.hidden_dim)(h)


class BEGAN(GAN):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        latent_dim: int = 64,
        hidden_dim: int = 64,
        gamma: float = 0.5,
        lambda_k: float = 1e-3,
        lr: float = 1e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 0.0,
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
    ):
        self.hidden_dim = hidden_dim
        self.gamma = gamma
        self.lambda_k = lambda_k
        super().__init__(
            img_channels=img_channels,
            img_size=img_size,
            latent_dim=latent_dim,
            lr=lr,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            calculate_metrics=calculate_metrics,
            metrics=metrics,
            summary=summary,
        )

    def _build_networks(self) -> None:
        self.G = BEGANDecoder(self.img_size, self.img_channels, self.hidden_dim)
        self.D = BEGANAutoencoderD(
            self.img_size, self.img_channels, self.hidden_dim, self.latent_dim
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng = jax.random.split(rng)
        z = jnp.zeros((1, self.latent_dim))
        x = jnp.zeros((1, *self.image_shape()))
        params = {
            "G": self.G.init(g_rng, z)["params"],
            "D": self.D.init(d_rng, x)["params"],
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable={"k_t": jnp.zeros(())},
            opt_state={
                "D": self.optimizers["D"].init(params["D"]),
                "G": self.optimizers["G"].init(params["G"]),
            },
        )

    def _ae_loss(self, params_d, v):
        recon = self.D.apply({"params": params_d}, v)
        return jnp.mean(jnp.abs(recon - v))

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z = jax.random.split(rng)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        z = jax.random.normal(rng_z, (x.shape[0], self.latent_dim))
        x_hat = self.G.apply({"params": state.params["G"]}, z)
        k_t = state.mutable["k_t"]

        def d_loss_fn(p_d):
            l_real = self._ae_loss(p_d, x)
            l_fake = self._ae_loss(p_d, jax.lax.stop_gradient(x_hat))
            return l_real - k_t * l_fake, (l_real, l_fake)

        d_grads, (l_real, l_fake) = jax.grad(d_loss_fn, has_aux=True)(
            state.params["D"]
        )
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d = optax.apply_updates(state.params["D"], d_updates)

        def g_loss_fn(p_g):
            x_hat2 = self.G.apply({"params": p_g}, z)
            return self._ae_loss(new_d, x_hat2)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.params["G"])
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        new_g = optax.apply_updates(state.params["G"], g_updates)

        balance = self.gamma * l_real - g_loss
        new_k = jnp.clip(k_t + self.lambda_k * balance, 0.0, 1.0)
        convergence = l_real + jnp.abs(balance)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_g, "D": new_d},
            mutable={"k_t": new_k},
            opt_state={"D": d_opt, "G": g_opt},
        )
        metrics = {
            "d_loss": l_real - k_t * l_fake,
            "g_loss": g_loss,
            "l_real": l_real,
            "k_t": new_k,
            "convergence": convergence,
        }
        return new_state, self.prefix_metrics(metrics, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        z = jax.random.normal(
            jax.random.fold_in(rng, 1), (x.shape[0], self.latent_dim)
        )
        x_hat = self.G.apply({"params": state.params["G"]}, z)
        l_real = self._ae_loss(state.params["D"], x)
        l_fake = self._ae_loss(state.params["D"], x_hat)
        balance = self.gamma * l_real - l_fake
        return self.prefix_metrics(
            {
                "d_loss": l_real - state.mutable["k_t"] * l_fake,
                "g_loss": l_fake,
                "convergence": l_real + jnp.abs(balance),
            },
            "val",
        )

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int):
        z = data_shard(jax.random.normal(rng, (num_samples, self.latent_dim)))
        x_hat = self.G.apply({"params": state.params["G"]}, z)
        return self.to_image_space(x_hat)
