"""ACGAN: auxiliary-classifier GAN (Odena et al. 2017).

Completion of the reference ACGAN fragment (reference:
models/generative/gan/acgan.py — an 89-line copied fragment referencing
undefined globals, no LightningModule; SURVEY §2.4): class-conditional DCGAN
generator (label one-hot concatenated to z) and a discriminator with shared
conv features feeding an adversarial head and a class head.

Losses: D = BCE(adv real/fake) + CE(class | real) + CE(class | fake);
G = BCE(adv -> real) + CE(class | fake), both using the sampled condition
labels.
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
    bce_with_logits,
)
from lightning_generative_models_tpu.models.gan.dcgan import (
    ConvGenerator,
    conv_init,
)
from lightning_generative_models_tpu.models.gan.gan import GAN
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState


class ACDiscriminator(nn.Module):
    img_size: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        widths = (64, 128, 256, 512) if self.img_size % 16 == 0 else (64, 128)
        h = x
        for i, width in enumerate(widths):
            h = nn.Conv(width, (4, 4), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=conv_init)(h)
            if i > 0:
                h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.leaky_relu(h, 0.2)
        features = h.reshape(h.shape[0], -1)
        adv = nn.Dense(1)(features)[:, 0]
        cls = nn.Dense(self.num_classes)(features)
        return adv, cls


class ACGAN(GAN):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        latent_dim: int = 100,
        num_classes: int = 10,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
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
        self.G = ConvGenerator(self.img_size, self.img_channels)
        self.D = ACDiscriminator(self.img_size, self.num_classes)

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng = jax.random.split(rng)
        zc = jnp.zeros((1, self.latent_dim + self.num_classes))
        x = jnp.zeros((1, *self.image_shape()))
        g_vars = self.G.init(g_rng, zc, train=False)
        d_vars = self.D.init(d_rng, x, train=False)
        params = {"G": g_vars["params"], "D": d_vars["params"]}
        mutable = {
            "G": {k: v for k, v in g_vars.items() if k != "params"},
            "D": {k: v for k, v in d_vars.items() if k != "params"},
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable=mutable,
            opt_state={
                "D": self.optimizers["D"].init(params["D"]),
                "G": self.optimizers["G"].init(params["G"]),
            },
        )

    def _generate_cond(self, params_g, mutable_g, z, labels, train):
        zc = jnp.concatenate([z, jax.nn.one_hot(labels, self.num_classes)], axis=1)
        return self._generate(params_g, mutable_g, zc, train)

    def _apply_d(self, params_d, mutable_d, x, train):
        variables = {"params": params_d, **mutable_d}
        if train and mutable_d:
            (adv, cls), updated = self.D.apply(
                variables, x, train=True, mutable=list(mutable_d)
            )
            return adv, cls, dict(updated)
        adv, cls = self.D.apply(variables, x, train=train)
        return adv, cls, mutable_d

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z, rng_c = jax.random.split(rng, 3)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        labels = batch["label"]
        b = x.shape[0]
        z = self.sample_z(rng_z, b)
        gen_labels = jax.random.randint(rng_c, (b,), 0, self.num_classes)
        x_hat, g_mut = self._generate_cond(
            state.params["G"], state.mutable["G"], z, gen_labels, True
        )

        def d_loss_fn(p_d):
            adv_r, cls_r, d_mut = self._apply_d(p_d, state.mutable["D"], x, True)
            adv_f, cls_f, d_mut = self._apply_d(
                p_d, d_mut, jax.lax.stop_gradient(x_hat), True
            )
            adv_loss = (
                bce_with_logits(adv_r, jnp.ones_like(adv_r))
                + bce_with_logits(adv_f, jnp.zeros_like(adv_f))
            ) / 2
            cls_loss = (
                optax.softmax_cross_entropy_with_integer_labels(cls_r, labels).mean()
                + optax.softmax_cross_entropy_with_integer_labels(
                    cls_f, gen_labels
                ).mean()
            ) / 2
            d_loss = adv_loss + cls_loss
            acc = jnp.mean((jnp.argmax(cls_r, -1) == labels).astype(jnp.float32))
            metrics = {
                "d_loss": d_loss,
                "d_adv_loss": adv_loss,
                "d_cls_loss": cls_loss,
                "cls_accuracy": acc,
            }
            return d_loss, (metrics, d_mut)

        d_grads, (d_metrics, d_mut) = jax.grad(d_loss_fn, has_aux=True)(
            state.params["D"]
        )
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d = optax.apply_updates(state.params["D"], d_updates)

        def g_loss_fn(p_g):
            x_hat2, g_mut2 = self._generate_cond(
                p_g, state.mutable["G"], z, gen_labels, True
            )
            adv_f, cls_f, d_mut2 = self._apply_d(new_d, d_mut, x_hat2, True)
            g_loss = bce_with_logits(adv_f, jnp.ones_like(adv_f)) + (
                optax.softmax_cross_entropy_with_integer_labels(cls_f, gen_labels)
            ).mean()
            return g_loss, ({"g_loss": g_loss}, g_mut2, d_mut2)

        g_grads, (g_metrics, g_mut, d_mut) = jax.grad(g_loss_fn, has_aux=True)(
            state.params["G"]
        )
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        new_g = optax.apply_updates(state.params["G"], g_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_g, "D": new_d},
            mutable={"G": g_mut, "D": d_mut},
            opt_state={"D": d_opt, "G": g_opt},
        )
        return new_state, self.prefix_metrics({**d_metrics, **g_metrics}, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        labels = batch["label"]
        z = self.sample_z(jax.random.fold_in(rng, 1), x.shape[0])
        gen_labels = labels
        x_hat, _ = self._generate_cond(
            state.params["G"], state.mutable["G"], z, gen_labels, False
        )
        adv_r, cls_r, _ = self._apply_d(state.params["D"], state.mutable["D"], x, False)
        adv_f, cls_f, _ = self._apply_d(
            state.params["D"], state.mutable["D"], x_hat, False
        )
        d_loss = (
            bce_with_logits(adv_r, jnp.ones_like(adv_r))
            + bce_with_logits(adv_f, jnp.zeros_like(adv_f))
        ) / 2
        g_loss = bce_with_logits(adv_f, jnp.ones_like(adv_f))
        acc = jnp.mean((jnp.argmax(cls_r, -1) == labels).astype(jnp.float32))
        return self.prefix_metrics(
            {"d_loss": d_loss, "g_loss": g_loss, "cls_accuracy": acc}, "val"
        )

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int):
        labels = jnp.arange(num_samples) % self.num_classes
        z = data_shard(self.sample_z(rng, num_samples))
        x_hat, _ = self._generate_cond(
            state.params["G"], state.mutable["G"], z, labels, False
        )
        return self.to_image_space(x_hat)

    def sample_classes(self, state: TrainState, rng: jax.Array, labels):
        z = data_shard(self.sample_z(rng, labels.shape[0]))
        x_hat, _ = self._generate_cond(
            state.params["G"], state.mutable["G"], z, labels, False
        )
        return self.to_image_space(x_hat)

    def validation_grids(self, state: TrainState, rng: jax.Array):
        """Per-class grid: row r = 8 samples of class r (ref cgan.py:331-357 style)."""
        labels = jnp.repeat(jnp.arange(self.num_classes), 8)
        return {"per_class_generation": self.sample_classes(state, rng, labels)}
