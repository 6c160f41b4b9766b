"""WGAN: Wasserstein GAN with gradient penalty or weight clipping.

Parity with the reference WGAN (reference:
models/generative/gan/wgan.py:10-197): DCGAN nets; critic loss
``E[D(x_hat)] - E[D(x)]``, generator loss ``-E[D(x_hat)]``; an
``n_critic : 1`` interleave of D and G updates; 1-Lipschitz constraint via
gradient penalty (``gp``, Adam) or weight clipping (``clip``, RMSprop).

TPU design:
- The reference alternates D/G by step parity in Python
  (wgan.py:64: ``(global_step+1) % (n_critic+1)``). Under jit that becomes a
  ``lax.cond`` on the step counter selecting the D- or G-update branch — both
  branches compile once, no retracing, and the whole interleave lives on
  device.
- The gradient penalty's double-backward (wgan.py:144-150:
  ``autograd.grad(..., create_graph=True)``) is a nested ``jax.grad``: the
  inner grad w.r.t. the interpolated images is differentiated again by the
  outer grad w.r.t. D's parameters. The inner forward uses frozen
  normalization stats (eval-mode), matching torch's treatment of running
  stats as constants.
- Deviation (documented): the penalty uses the standard WGAN-GP gradient norm
  over *all* non-batch axes; the reference's ``norm(2, dim=1)`` (wgan.py:153)
  norms only the channel axis, a known quirk of that implementation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.models.base import Batch, Metrics
from lightning_generative_models_tpu.models.gan.dcgan import DCGAN
from lightning_generative_models_tpu.models.gan.gan import GAN
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import (
    TrainState,
    make_adam,
    make_rmsprop,
)


class WGAN(DCGAN):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        latent_dim: int = 100,
        lr: float = 5e-5,
        weight_decay: float = 0.0,
        b1: float = 0.5,
        b2: float = 0.9,
        n_critic: int = 5,
        clip_value: float = 0.01,
        grad_penalty: float = 10.0,
        constraint_method: str = "gp",
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
        use_bf16: bool = False,  # f32 default: GP/clip precision sensitivity
    ):
        assert constraint_method in ("gp", "clip"), (
            "Either gradient penalty (gp) or weight clipping (clip) to "
            "enforce the 1-Lipschitz constraint."
        )
        self.n_critic = n_critic
        self.clip_value = clip_value
        self.grad_penalty = grad_penalty
        self.constraint_method = constraint_method
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
            use_bf16=use_bf16,
        )

    def _build_optimizers(self, lr, b1, b2, weight_decay) -> None:
        if self.constraint_method == "clip":
            # WGAN authors recommend a non-momentum optimizer for the critic
            # (reference wgan.py:170-181).
            self.optimizers = {"D": make_rmsprop(lr), "G": make_rmsprop(lr)}
        else:
            self.optimizers = {
                "D": make_adam(lr, b1, b2, weight_decay),
                "G": make_adam(lr, b1, b2, weight_decay),
            }

    # -- losses -----------------------------------------------------------
    def _gradient_penalty(
        self, params_d, mutable_d, x: jax.Array, x_hat: jax.Array, rng: jax.Array
    ) -> jax.Array:
        alpha = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype)
        interp = alpha * x + (1.0 - alpha) * x_hat

        def d_sum(x_in):
            logits, _ = self._discriminate(params_d, mutable_d, x_in, train=False)
            return logits.sum()

        grads = jax.grad(d_sum)(interp)
        grad_norm = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
        return jnp.mean((grad_norm - 1.0) ** 2) * self.grad_penalty

    def _d_loss(
        self, params_d, mutable_d, x, x_hat, rng, train
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_real, mutable_d = self._discriminate(params_d, mutable_d, x, train)
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        d_loss_real = logits_real.mean()
        d_loss_fake = logits_fake.mean()
        d_loss = d_loss_fake - d_loss_real
        gp = jnp.zeros(())
        if train and self.constraint_method == "gp":
            gp = self._gradient_penalty(params_d, mutable_d, x, x_hat, rng)
            d_loss = d_loss + gp
        metrics = {
            "d_loss": d_loss,
            "d_loss_real": d_loss_real,
            "d_loss_fake": d_loss_fake,
            "gradient_penalty": gp,
        }
        return d_loss, (metrics, mutable_d)

    def _g_loss(
        self, params_d, mutable_d, x_hat, train
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        g_loss = -logits_fake.mean()
        return g_loss, ({"g_loss": g_loss}, mutable_d)

    def _post_d_update(self, params_d):
        if self.constraint_method == "clip":
            return jax.tree_util.tree_map(
                lambda p: jnp.clip(p, -self.clip_value, self.clip_value), params_d
            )
        return params_d

    # -- interleaved step ----------------------------------------------------
    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_z, rng_gp = jax.random.split(rng, 3)
        x = self.to_model_space(prepare_batch(batch, rng_aug, train=True)["image"])
        z = self.sample_z(rng_z, x.shape[0])
        x_hat, g_mut = self._generate(state.params["G"], state.mutable["G"], z, True)

        # Both lax.cond branches must return the same metric pytree.
        zero = jnp.zeros((), jnp.float32)
        zero_metrics = {
            "d_loss": zero,
            "d_loss_real": zero,
            "d_loss_fake": zero,
            "gradient_penalty": zero,
            "g_loss": zero,
        }

        def d_branch(_):
            def d_loss_fn(p_d):
                return self._d_loss(
                    p_d,
                    state.mutable["D"],
                    x,
                    jax.lax.stop_gradient(x_hat),
                    rng_gp,
                    True,
                )

            d_grads, (d_metrics, d_mut) = jax.grad(d_loss_fn, has_aux=True)(
                state.params["D"]
            )
            updates, d_opt = self.optimizers["D"].update(
                d_grads, state.opt_state["D"], state.params["D"]
            )
            new_d = self._post_d_update(
                optax.apply_updates(state.params["D"], updates)
            )
            metrics = {**zero_metrics, **{k: v.astype(jnp.float32) for k, v in d_metrics.items()}}
            return (
                {"G": state.params["G"], "D": new_d},
                {"G": state.mutable["G"], "D": d_mut},
                {"D": d_opt, "G": state.opt_state["G"]},
                metrics,
            )

        def g_branch(_):
            def g_loss_fn(p_g):
                x_hat2, g_mut2 = self._generate(p_g, state.mutable["G"], z, True)
                g_loss, (g_metrics, d_mut2) = self._g_loss(
                    state.params["D"], state.mutable["D"], x_hat2, True
                )
                return g_loss, (g_metrics, g_mut2, d_mut2)

            g_grads, (g_metrics, g_mut2, d_mut2) = jax.grad(
                g_loss_fn, has_aux=True
            )(state.params["G"])
            updates, g_opt = self.optimizers["G"].update(
                g_grads, state.opt_state["G"], state.params["G"]
            )
            new_g = optax.apply_updates(state.params["G"], updates)
            metrics = {**zero_metrics, **{k: v.astype(jnp.float32) for k, v in g_metrics.items()}}
            return (
                {"G": new_g, "D": state.params["D"]},
                {"G": g_mut2, "D": d_mut2},
                {"D": state.opt_state["D"], "G": g_opt},
                metrics,
            )

        # n_critic D-steps for every G-step (reference wgan.py:64).
        do_d = (state.step + 1) % (self.n_critic + 1) != 0
        params, mutable, opt_state, metrics = jax.lax.cond(
            do_d, d_branch, g_branch, operand=None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            mutable=mutable,
            opt_state=opt_state,
        )
        return new_state, self.prefix_metrics(metrics, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        # Wasserstein metrics without penalty terms.
        return GAN.eval_step(self, state, batch, rng)
