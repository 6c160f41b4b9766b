"""GAN: Goodfellow et al. 2014, MLP generator/discriminator.

Capability parity with the reference GAN (reference:
models/generative/gan/gan.py:15-354): G = latent->256->512->1024->img MLP
with BatchNorm+LeakyReLU(0.2) and tanh head; D = img->512->256->1 MLP;
BCE-with-logits losses with "min-max" or "non-saturating" generator
objectives; D updated before G each step with two Adam optimizers.

TPU design: the reference's manual two-optimizer Lightning step
(gan.py:118,151-165: detach -> d_backward -> d_step -> g_backward -> g_step)
becomes ONE jitted program: jax.grad over D params with stop_gradient on the
fake batch (the .detach() boundary), an optax D update, then jax.grad over G
params *through the updated D*, and a G update. No host round-trips between
the phases; XLA schedules both backward passes onto the MXU back-to-back.

This class is also the base for the conv GAN family (DCGAN/LSGAN/WGAN/R1GAN
subclass it, mirroring the reference's inheritance).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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
    bce_with_logits,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


class MLPGenerator(nn.Module):
    img_shape: Tuple[int, int, int]

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        h = z
        for width in (256, 512, 1024):
            h = nn.Dense(width)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(int(np.prod(self.img_shape)))(h)
        h = jnp.tanh(h)
        return h.reshape(h.shape[0], *self.img_shape)


class MLPDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        h = x.reshape(x.shape[0], -1)
        for width in (512, 256):
            h = nn.Dense(width)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Dense(1)(h)[:, 0]


class GAN(GenerativeModel):
    monitor = "val_g_loss"  # GANs never log val_loss (fixes SURVEY §2.8(3))
    supports_grad_accum = False  # manual multi-optimizer updates (ref parity)

    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        latent_dim: int = 100,
        lr: float = 1e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        loss_type: str = "non-saturating",
        calculate_metrics: bool = False,
        metrics: Optional[list] = None,
        summary: bool = True,
    ):
        super().__init__(img_channels, img_size)
        assert loss_type in ("min-max", "non-saturating")
        self.latent_dim = latent_dim
        self.loss_type = loss_type
        self.calculate_metrics = calculate_metrics
        self.metrics = metrics or []
        self._build_networks()
        self._build_optimizers(lr, b1, b2, weight_decay)

    # Subclass hooks ---------------------------------------------------------
    def _build_networks(self) -> None:
        self.G = MLPGenerator(self.image_shape())
        self.D = MLPDiscriminator()

    def _build_optimizers(self, lr, b1, b2, weight_decay) -> None:
        self.optimizers = {
            "D": make_adam(lr, b1, b2, weight_decay),
            "G": make_adam(lr, b1, b2, weight_decay),
        }

    def _latent_shape(self, batch_size: int) -> Tuple[int, ...]:
        return (batch_size, self.latent_dim)

    def summary_spec(self):
        """Per-layer G/D tables (reference torchinfo summaries, gan.py:323-354)."""
        return {
            "G": (self.G, (jnp.zeros(self._latent_shape(1)),), {"train": False}),
            "D": (self.D, (jnp.zeros((1, *self.image_shape())),), {"train": False}),
        }

    # State ------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng = jax.random.split(rng)
        z = jnp.zeros(self._latent_shape(1))
        x = jnp.zeros((1, *self.image_shape()))
        g_vars = self.G.init(g_rng, z, train=False)
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

    # Forward helpers ----------------------------------------------------------
    def sample_z(self, rng: jax.Array, batch_size: int) -> jax.Array:
        return jax.random.normal(rng, self._latent_shape(batch_size))

    def _generate(
        self, params_g: Any, mutable_g: Dict, z: jax.Array, train: bool
    ) -> Tuple[jax.Array, Dict]:
        variables = {"params": params_g, **mutable_g}
        if train and mutable_g:
            x_hat, updated = self.G.apply(
                variables, z, train=True, mutable=list(mutable_g)
            )
            return x_hat, dict(updated)
        return self.G.apply(variables, z, train=train), mutable_g

    def _discriminate(
        self, params_d: Any, mutable_d: Dict, x: jax.Array, train: bool
    ) -> Tuple[jax.Array, Dict]:
        variables = {"params": params_d, **mutable_d}
        if train and mutable_d:
            logits, updated = self.D.apply(
                variables, x, train=True, mutable=list(mutable_d)
            )
            return logits, dict(updated)
        return self.D.apply(variables, x, train=train), mutable_d

    # Losses (subclass override points; reference gan.py:258-308) -------------
    def _d_loss(
        self,
        params_d: Any,
        mutable_d: Dict,
        x: jax.Array,
        x_hat: jax.Array,
        rng: jax.Array,
        train: bool,
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_real, mutable_d = self._discriminate(params_d, mutable_d, x, train)
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        d_loss_real = bce_with_logits(logits_real, jnp.ones_like(logits_real))
        d_loss_fake = bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
        d_loss = (d_loss_real + d_loss_fake) / 2
        metrics = {
            "d_loss": d_loss,
            "d_loss_real": d_loss_real,
            "d_loss_fake": d_loss_fake,
            "logits_real": logits_real.mean(),
            "logits_fake": logits_fake.mean(),
        }
        return d_loss, (metrics, mutable_d)

    def _g_loss(
        self,
        params_d: Any,
        mutable_d: Dict,
        x_hat: jax.Array,
        train: bool,
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        if self.loss_type == "non-saturating":
            g_loss = bce_with_logits(logits_fake, jnp.ones_like(logits_fake))
        else:  # min-max: maximize D's error on fakes
            g_loss = -bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
        return g_loss, ({"g_loss": g_loss}, mutable_d)

    # Steps --------------------------------------------------------------------
    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z, rng_d = jax.random.split(rng, 3)
        x01 = prepare_batch(batch, rng_aug, train=True)["image"]
        x = self.to_model_space(x01)
        z = self.sample_z(rng_z, x.shape[0])

        # Fake batch from the current generator (train-mode normalization);
        # recomputed inside the G grad closure with identical z and params.
        x_hat, g_mut = self._generate(state.params["G"], state.mutable["G"], z, True)

        # --- D phase (x_hat detached: stop_gradient mirrors gan.py:271) ------
        def d_loss_fn(p_d):
            return self._d_loss(
                p_d, state.mutable["D"], x, jax.lax.stop_gradient(x_hat), rng_d, True
            )

        d_grads, (d_metrics, d_mut) = jax.grad(d_loss_fn, has_aux=True)(
            state.params["D"]
        )
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d_params = optax.apply_updates(state.params["D"], d_updates)
        new_d_params = self._post_d_update(new_d_params)

        # --- G phase (through the *updated* D, as in the reference) ----------
        def g_loss_fn(p_g):
            x_hat2, g_mut2 = self._generate(p_g, state.mutable["G"], z, True)
            g_loss, (g_metrics, d_mut2) = self._g_loss(new_d_params, d_mut, x_hat2, True)
            return g_loss, (g_metrics, g_mut2, d_mut2)

        g_grads, (g_metrics, g_mut, d_mut) = jax.grad(g_loss_fn, has_aux=True)(
            state.params["G"]
        )
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        new_g_params = optax.apply_updates(state.params["G"], g_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_g_params, "D": new_d_params},
            mutable={"G": g_mut, "D": d_mut},
            opt_state={"D": d_opt, "G": g_opt},
        )
        return new_state, self.prefix_metrics({**d_metrics, **g_metrics}, "train")

    def _post_d_update(self, params_d: Any) -> Any:
        """Hook for WGAN weight clipping; identity by default."""
        return params_d

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x01 = prepare_batch(batch, train=False)["image"]
        x = self.to_model_space(x01)
        z = self.sample_z(jax.random.fold_in(rng, 1), x.shape[0])
        x_hat, _ = self._generate(state.params["G"], state.mutable["G"], z, False)
        _, (d_metrics, _) = self._d_loss(
            state.params["D"], state.mutable["D"], x, x_hat, rng, False
        )
        _, (g_metrics, _) = self._g_loss(
            state.params["D"], state.mutable["D"], x_hat, False
        )
        return self.prefix_metrics({**d_metrics, **g_metrics}, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        z = data_shard(self.sample_z(rng, num_samples))
        x_hat, _ = self._generate(state.params["G"], state.mutable["G"], z, False)
        return self.to_image_space(x_hat)
