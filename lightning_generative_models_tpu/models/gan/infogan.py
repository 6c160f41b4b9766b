"""InfoGAN: interpretable latent codes via mutual information (Chen et al. 2016).

Parity with the reference InfoGAN (reference:
models/generative/gan/infogan.py:32-541): DCGAN-style G/D; latent =
[z, categorical one-hot, continuous codes]; D carries a shared feature
extractor with a real/fake head and a Q head (Dense 128 + norm + LeakyReLU ->
categorical logits, continuous mu, continuous logvar); three optimizers — D
over D params, G over G params, Q over D+G jointly (infogan.py:429-449); MI
loss = lambda_cat * CE + lambda_cont * GaussianNLL (utils/loss_functions.py,
log-2pi dropped); structured code-transition sampling grid
(infogan.py:110-144).

TPU design: all three optimizer phases run inside ONE jitted step. Functional
deviation (documented): the reference computes Q-phase gradients on the
pre-update graph but applies them to post-update parameters (a torch
manual-optimization artifact); here the Q loss is recomputed with the
already-updated G/D parameters — the intended InfoGAN update — so gradients
and parameters are consistent.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
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


def gaussian_nll(x: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Diagonal-Gaussian NLL without the log(2*pi) term, mean over batch
    (reference utils/loss_functions.py:4-37)."""
    nll = 0.5 * (logvar + (x - mu) ** 2 / jnp.exp(logvar)).sum(axis=-1)
    return nll.mean()


class QDiscriminator(nn.Module):
    """Shared conv features -> (real/fake logit, Q outputs)."""

    img_size: int
    categorical_code_dim: int
    continuous_code_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        widths = (64, 128, 256, 512) if self.img_size % 16 == 0 else (64, 128)
        h = x
        for i, width in enumerate(widths):
            h = nn.Conv(width, (4, 4), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=conv_init)(h)
            if i > 0:
                h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.leaky_relu(h, 0.2)
        features = h.reshape(h.shape[0], -1)

        logit = nn.Dense(1)(features)[:, 0]

        q = nn.Dense(128)(features)
        q = nn.BatchNorm(use_running_average=not train)(q)
        q = nn.leaky_relu(q, 0.2)
        q = nn.Dense(self.categorical_code_dim + 2 * self.continuous_code_dim)(q)
        cat_logits = q[:, : self.categorical_code_dim]
        mu = q[:, self.categorical_code_dim : self.categorical_code_dim + self.continuous_code_dim]
        logvar = q[:, self.categorical_code_dim + self.continuous_code_dim :]
        return logit, cat_logits, mu, logvar


class InfoGAN(GAN):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        latent_dim: int = 100,
        categorical_code_dim: int = 10,
        continuous_code_dim: int = 2,
        lambda_cat: float = 1.0,
        lambda_cont: float = 0.1,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
    ):
        self.categorical_code_dim = categorical_code_dim
        self.continuous_code_dim = continuous_code_dim
        self.lambda_cat = lambda_cat
        self.lambda_cont = lambda_cont
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
        self.D = QDiscriminator(
            self.img_size, self.categorical_code_dim, self.continuous_code_dim
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        g_rng, d_rng = jax.random.split(rng)
        code_dim = self.latent_dim + self.categorical_code_dim + self.continuous_code_dim
        g_vars = self.G.init(g_rng, jnp.zeros((1, code_dim)), train=False)
        d_vars = self.D.init(
            d_rng, jnp.zeros((1, *self.image_shape())), train=False
        )
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
                # Q optimizes D and G jointly (reference infogan.py:442-447).
                "Q": self.optimizers["G"].init(params),
            },
        )

    # -- codes (reference infogan.py:110-144) ----------------------------------
    def generate_codes(
        self, rng: jax.Array, batch_size: int, structured: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        z_rng, cat_rng, cont_rng, cont_rng2 = jax.random.split(rng, 4)
        z = jax.random.normal(z_rng, (batch_size, self.latent_dim))
        if structured:
            # Step through categories; linearly interpolate continuous codes.
            step = max(batch_size // self.categorical_code_dim, 1)
            cats = (jnp.arange(batch_size) // step) % self.categorical_code_dim
            start = jax.random.uniform(cont_rng, (1, self.continuous_code_dim))
            end = jax.random.uniform(cont_rng2, (1, self.continuous_code_dim))
            alpha = jnp.linspace(0, 1, batch_size)[:, None]
            cont = start * (1 - alpha) + end * alpha
        else:
            cats = jax.random.randint(
                cat_rng, (batch_size,), 0, self.categorical_code_dim
            )
            cont = jax.random.uniform(cont_rng, (batch_size, self.continuous_code_dim))
        cat_onehot = jax.nn.one_hot(cats, self.categorical_code_dim)
        return z, cat_onehot, cont

    def _generate_coded(self, params_g, mutable_g, z, cat, cont, train):
        zc = jnp.concatenate([z, cat, cont], axis=1)
        return self._generate(params_g, mutable_g, zc, train)

    def _discriminate_full(self, params_d, mutable_d, x, train):
        variables = {"params": params_d, **mutable_d}
        if train and mutable_d:
            out, updated = self.D.apply(variables, x, train=True, mutable=list(mutable_d))
            return out, dict(updated)
        return self.D.apply(variables, x, train=train), mutable_d

    def _discriminate(self, params_d, mutable_d, x, train):
        (logit, *_), mutable_d = self._discriminate_full(params_d, mutable_d, x, train)
        return logit, mutable_d

    # -- step --------------------------------------------------------------------
    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_codes = jax.random.split(rng)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        z, cat, cont = self.generate_codes(rng_codes, x.shape[0])

        x_hat, g_mut = self._generate_coded(
            state.params["G"], state.mutable["G"], z, cat, cont, True
        )

        # --- D phase ---------------------------------------------------------
        def d_loss_fn(p_d):
            return self._d_loss(
                p_d, state.mutable["D"], x, jax.lax.stop_gradient(x_hat), rng, True
            )

        d_grads, (d_metrics, d_mut) = jax.grad(d_loss_fn, has_aux=True)(
            state.params["D"]
        )
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        p_d = optax.apply_updates(state.params["D"], d_updates)

        # --- G phase ---------------------------------------------------------
        def g_loss_fn(p_g):
            x_hat2, g_mut2 = self._generate_coded(
                p_g, state.mutable["G"], z, cat, cont, True
            )
            g_loss, (g_metrics, d_mut2) = self._g_loss(p_d, d_mut, x_hat2, True)
            return g_loss, (g_metrics, g_mut2, d_mut2)

        g_grads, (g_metrics, g_mut, d_mut) = jax.grad(g_loss_fn, has_aux=True)(
            state.params["G"]
        )
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        p_g = optax.apply_updates(state.params["G"], g_updates)

        # --- Q phase: MI loss over G and D jointly ----------------------------
        def mi_loss_fn(p_joint):
            x_hat3, g_mut3 = self._generate_coded(
                p_joint["G"], g_mut, z, cat, cont, True
            )
            (_, cat_logits, mu, logvar), d_mut3 = self._discriminate_full(
                p_joint["D"], d_mut, x_hat3, True
            )
            ce = optax.softmax_cross_entropy(cat_logits, cat).mean()
            nll = gaussian_nll(cont, mu, logvar)
            mi = self.lambda_cat * ce + self.lambda_cont * nll
            metrics = {"mi_loss": mi, "mi_categorical": ce, "mi_continuous": nll}
            return mi, (metrics, g_mut3, d_mut3)

        joint = {"G": p_g, "D": p_d}
        q_grads, (mi_metrics, g_mut, d_mut) = jax.grad(mi_loss_fn, has_aux=True)(joint)
        q_updates, q_opt = self.optimizers["G"].update(
            q_grads, state.opt_state["Q"], joint
        )
        joint = optax.apply_updates(joint, q_updates)

        new_state = state.replace(
            step=state.step + 1,
            params=joint,
            mutable={"G": g_mut, "D": d_mut},
            opt_state={"D": d_opt, "G": g_opt, "Q": q_opt},
        )
        all_metrics = {**d_metrics, **g_metrics, **mi_metrics}
        return new_state, self.prefix_metrics(all_metrics, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x = self.to_model_space(prepare_batch(batch, train=False)["image"])
        z, cat, cont = self.generate_codes(jax.random.fold_in(rng, 1), x.shape[0])
        x_hat, _ = self._generate_coded(
            state.params["G"], state.mutable["G"], z, cat, cont, False
        )
        _, (d_metrics, _) = self._d_loss(
            state.params["D"], state.mutable["D"], x, x_hat, rng, False
        )
        _, (g_metrics, _) = self._g_loss(
            state.params["D"], state.mutable["D"], x_hat, False
        )
        (_, cat_logits, mu, logvar), _ = self._discriminate_full(
            state.params["D"], state.mutable["D"], x_hat, False
        )
        ce = optax.softmax_cross_entropy(cat_logits, cat).mean()
        nll = gaussian_nll(cont, mu, logvar)
        mi = self.lambda_cat * ce + self.lambda_cont * nll
        metrics = {
            **d_metrics,
            **g_metrics,
            "mi_loss": mi,
            # reference logs val_loss = g_loss (infogan.py:354-356)
            "loss": g_metrics["g_loss"],
        }
        return self.prefix_metrics(metrics, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        """Code-transition grid (reference infogan.py:499-510)."""
        z, cat, cont = self.generate_codes(rng, num_samples, structured=True)
        z = data_shard(z)
        x_hat, _ = self._generate_coded(
            state.params["G"], state.mutable["G"], z, cat, cont, False
        )
        return self.to_image_space(x_hat)

    def validation_grids(self, state: TrainState, rng: jax.Array):
        """Structured code-transition grid: rows step the categorical code,
        columns interpolate the continuous codes (ref infogan.py:499-510)."""
        n = self.categorical_code_dim * 8
        return {"code_transition": self.sample(state, rng, n)}
