"""CGAN: conditional GAN (Mirza & Osindero, 2014).

Parity with the reference CGAN (reference:
models/generative/gan/cgan.py:14-396): labels are one-hot encoded and
concatenated to z for the generator (cgan.py:63) and broadcast as extra
channel planes for the discriminator (cgan.py:111-127). G: Dense to a
7x7x256 seed then two stride-2 transposed convs with LeakyReLU and tanh head;
D: two stride-2 convs, dropout, linear head. BCE losses; per-class sample
grid via :meth:`sample_classes`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
    bce_with_logits,
)
from lightning_generative_models_tpu.models.gan.gan import GAN
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState


class CondGenerator(nn.Module):
    img_size: int
    img_channels: int

    @nn.compact
    def __call__(self, zc: jax.Array, train: bool = True) -> jax.Array:
        assert self.img_size % 4 == 0 or self.img_size == 28
        seed_hw = self.img_size // 4 if self.img_size % 4 == 0 else 7
        h = nn.Dense(seed_hw * seed_hw * 256)(zc)
        h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], seed_hw, seed_hw, 256)
        h = nn.ConvTranspose(128, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.ConvTranspose(self.img_channels, (3, 3), strides=(2, 2), padding="SAME")(h)
        return jnp.tanh(h)


class CondDiscriminator(nn.Module):
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x_with_labels: jax.Array, train: bool = True) -> jax.Array:
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME")(x_with_labels)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(128, (3, 3), strides=(2, 2), padding="SAME")(h)
        h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(1)(h)[:, 0]


class CGAN(GAN):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        latent_dim: int = 128,
        lr: float = 1e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        num_classes: int = 10,
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
    ):
        self.num_classes = num_classes
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
        self.G = CondGenerator(self.img_size, self.img_channels)
        self.D = CondDiscriminator()

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng = jax.random.split(rng)
        zc = jnp.zeros((1, self.latent_dim + self.num_classes))
        xc = jnp.zeros(
            (1, self.img_size, self.img_size, self.img_channels + self.num_classes)
        )
        g_vars = self.G.init(g_rng, zc, train=False)
        d_vars = self.D.init(d_rng, xc, train=False)
        params = {"G": g_vars["params"], "D": d_vars["params"]}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable={"G": {}, "D": {}},
            opt_state={
                "D": self.optimizers["D"].init(params["D"]),
                "G": self.optimizers["G"].init(params["G"]),
            },
        )

    # -- conditioning helpers (reference cgan.py:63, 111-127) ----------------
    def _concat_label_z(self, z: jax.Array, labels: jax.Array) -> jax.Array:
        one_hot = jax.nn.one_hot(labels, self.num_classes)
        return jnp.concatenate([z, one_hot], axis=1)

    def _concat_label_img(self, x: jax.Array, labels: jax.Array) -> jax.Array:
        one_hot = jax.nn.one_hot(labels, self.num_classes)
        planes = jnp.broadcast_to(
            one_hot[:, None, None, :],
            (x.shape[0], x.shape[1], x.shape[2], self.num_classes),
        )
        return jnp.concatenate([x, planes], axis=-1)

    def _generate_cond(self, params_g, z, labels, train):
        return self.G.apply({"params": params_g}, self._concat_label_z(z, labels),
                            train=train)

    def _discriminate_cond(self, params_d, x, labels, rng, train):
        return self.D.apply(
            {"params": params_d},
            self._concat_label_img(x, labels),
            train=train,
            rngs={"dropout": rng} if train else {},
        )

    # -- steps -----------------------------------------------------------------
    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        import optax

        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z, rng_drop1, rng_drop2, rng_drop3 = jax.random.split(rng, 5)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        labels = batch["label"]
        z = self.sample_z(rng_z, x.shape[0])
        x_hat = self._generate_cond(state.params["G"], z, labels, True)

        def d_loss_fn(p_d):
            logits_real = self._discriminate_cond(p_d, x, labels, rng_drop1, True)
            logits_fake = self._discriminate_cond(
                p_d, jax.lax.stop_gradient(x_hat), labels, rng_drop2, True
            )
            d_loss_real = bce_with_logits(logits_real, jnp.ones_like(logits_real))
            d_loss_fake = bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
            d_loss = (d_loss_real + d_loss_fake) / 2
            return d_loss, {
                "d_loss": d_loss,
                "d_loss_real": d_loss_real,
                "d_loss_fake": d_loss_fake,
                "logits_real": logits_real.mean(),
                "logits_fake": logits_fake.mean(),
            }

        d_grads, d_metrics = jax.grad(d_loss_fn, has_aux=True)(state.params["D"])
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d = optax.apply_updates(state.params["D"], d_updates)

        def g_loss_fn(p_g):
            x_hat2 = self._generate_cond(p_g, z, labels, True)
            logits_fake = self._discriminate_cond(new_d, x_hat2, labels, rng_drop3, True)
            g_loss = bce_with_logits(logits_fake, jnp.ones_like(logits_fake))
            return g_loss, {"g_loss": g_loss}

        g_grads, g_metrics = jax.grad(g_loss_fn, has_aux=True)(state.params["G"])
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        new_g = optax.apply_updates(state.params["G"], g_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_g, "D": new_d},
            opt_state={"D": d_opt, "G": g_opt},
        )
        return new_state, self.prefix_metrics({**d_metrics, **g_metrics}, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        labels = batch["label"]
        z = self.sample_z(jax.random.fold_in(rng, 1), x.shape[0])
        x_hat = self._generate_cond(state.params["G"], z, labels, False)
        logits_real = self._discriminate_cond(state.params["D"], x, labels, rng, False)
        logits_fake = self._discriminate_cond(state.params["D"], x_hat, labels, rng, False)
        d_loss_real = bce_with_logits(logits_real, jnp.ones_like(logits_real))
        d_loss_fake = bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
        g_loss = bce_with_logits(logits_fake, jnp.ones_like(logits_fake))
        return self.prefix_metrics(
            {
                "d_loss": (d_loss_real + d_loss_fake) / 2,
                "d_loss_real": d_loss_real,
                "d_loss_fake": d_loss_fake,
                "g_loss": g_loss,
            },
            "val",
        )

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        """Per-class grid: row r shows class r (reference cgan.py:331-357)."""
        labels = jnp.arange(num_samples) % self.num_classes
        z = data_shard(self.sample_z(rng, num_samples))
        x_hat = self._generate_cond(state.params["G"], z, labels, False)
        return self.to_image_space(x_hat)

    def sample_classes(
        self, state: TrainState, rng: jax.Array, labels: jax.Array
    ) -> jax.Array:
        z = data_shard(self.sample_z(rng, labels.shape[0]))
        x_hat = self._generate_cond(state.params["G"], z, labels, False)
        return self.to_image_space(x_hat)

    def validation_grids(self, state: TrainState, rng: jax.Array):
        """Per-class grid: row r = 8 samples of class r (ref cgan.py:331-357)."""
        labels = jnp.repeat(jnp.arange(self.num_classes), 8)
        return {"per_class_generation": self.sample_classes(state, rng, labels)}
