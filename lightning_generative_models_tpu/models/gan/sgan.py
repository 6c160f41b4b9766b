"""SGAN: semi-supervised GAN (Salimans et al. 2016 / Odena 2016).

Completion of the reference SGAN sketch (reference:
models/generative/gan/sgan.py — unrunnable: NameError super call, typo'd
squeeze, arity-mismatched loss; SURVEY §2.4): DCGAN generator; discriminator
with a (num_classes + 1)-way head where class ``num_classes`` means "fake".

Losses:
- D: CE(real labeled -> true class) on the labeled fraction of the batch +
  CE(real unlabeled -> not-fake, via 1 - p_fake) + CE(fake -> fake class).
- G: non-saturating -log(1 - p_fake(x_hat)).

The labeled fraction is simulated by masking a deterministic share of each
batch's labels (``labeled_fraction``), matching semi-supervised protocol.
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
from lightning_generative_models_tpu.models.gan.dcgan import (
    ConvGenerator,
    conv_init,
)
from lightning_generative_models_tpu.models.gan.gan import GAN
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState


class ClassifierDiscriminator(nn.Module):
    img_size: int
    num_outputs: int  # num_classes + 1 (last = fake)

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
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.num_outputs)(h)


class SGAN(GAN):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        latent_dim: int = 100,
        num_classes: int = 10,
        labeled_fraction: float = 0.1,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
    ):
        self.num_classes = num_classes
        self.labeled_fraction = labeled_fraction
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
        self.D = ClassifierDiscriminator(self.img_size, self.num_classes + 1)

    # -- losses --------------------------------------------------------------
    def _fake_class(self) -> int:
        return self.num_classes

    def _p_fake(self, logits: jax.Array) -> jax.Array:
        return jax.nn.softmax(logits, axis=-1)[:, self._fake_class()]

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z = jax.random.split(rng)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        labels = batch["label"]
        b = x.shape[0]
        z = self.sample_z(rng_z, b)
        x_hat, g_mut = self._generate(state.params["G"], state.mutable["G"], z, True)

        n_labeled = max(int(b * self.labeled_fraction), 1)
        labeled_mask = (jnp.arange(b) < n_labeled).astype(jnp.float32)
        fake_labels = jnp.full((b,), self._fake_class(), jnp.int32)

        def d_loss_fn(p_d):
            variables = {"params": p_d, **state.mutable["D"]}
            logits_real, d_mut = self.D.apply(
                variables, x, train=True, mutable=list(state.mutable["D"])
            )
            logits_fake, d_mut2 = self.D.apply(
                {"params": p_d, **dict(d_mut)},
                jax.lax.stop_gradient(x_hat),
                train=True,
                mutable=list(state.mutable["D"]),
            )
            # supervised CE on labeled reals
            ce_real = optax.softmax_cross_entropy_with_integer_labels(
                logits_real, labels
            )
            supervised = jnp.sum(ce_real * labeled_mask) / jnp.sum(labeled_mask)
            # unsupervised: real -> not fake; fake -> fake class
            p_fake_real = self._p_fake(logits_real)
            unsup_real = -jnp.mean(jnp.log(1.0 - p_fake_real + 1e-8))
            unsup_fake = optax.softmax_cross_entropy_with_integer_labels(
                logits_fake, fake_labels
            ).mean()
            d_loss = supervised + unsup_real + unsup_fake
            acc = jnp.sum(
                (jnp.argmax(logits_real[:, : self.num_classes], -1) == labels)
                * labeled_mask
            ) / jnp.sum(labeled_mask)
            metrics = {
                "d_loss": d_loss,
                "supervised_loss": supervised,
                "d_loss_real": unsup_real,
                "d_loss_fake": unsup_fake,
                "labeled_acc": acc,
            }
            return d_loss, (metrics, dict(d_mut2))

        d_grads, (d_metrics, d_mut) = jax.grad(d_loss_fn, has_aux=True)(
            state.params["D"]
        )
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d = optax.apply_updates(state.params["D"], d_updates)

        def g_loss_fn(p_g):
            x_hat2, g_mut2 = self._generate(p_g, state.mutable["G"], z, True)
            logits_fake, d_mut2 = self.D.apply(
                {"params": new_d, **d_mut},
                x_hat2,
                train=True,
                mutable=list(d_mut),
            )
            g_loss = -jnp.mean(jnp.log(1.0 - self._p_fake(logits_fake) + 1e-8))
            return g_loss, ({"g_loss": g_loss}, g_mut2, dict(d_mut2))

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
        x_hat, _ = self._generate(state.params["G"], state.mutable["G"], z, False)
        logits_real = self.D.apply(
            {"params": state.params["D"], **state.mutable["D"]}, x, train=False
        )
        logits_fake = self.D.apply(
            {"params": state.params["D"], **state.mutable["D"]}, x_hat, train=False
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits_real, labels)
        acc = jnp.mean(
            (jnp.argmax(logits_real[:, : self.num_classes], -1) == labels).astype(
                jnp.float32
            )
        )
        g_loss = -jnp.mean(jnp.log(1.0 - self._p_fake(logits_fake) + 1e-8))
        return self.prefix_metrics(
            {"supervised_loss": ce.mean(), "accuracy": acc, "g_loss": g_loss}, "val"
        )

    def classify(self, state: TrainState, batch: Batch) -> jax.Array:
        """Semi-supervised classifier head predictions."""
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        logits = self.D.apply(
            {"params": state.params["D"], **state.mutable["D"]}, x, train=False
        )
        return jnp.argmax(logits[:, : self.num_classes], axis=-1)
