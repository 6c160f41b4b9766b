"""VQGAN: VQ-VAE with a PatchGAN adversarial decoder (Esser et al. 2021).

Completion of the reference VQGAN (reference: models/generative/vae/vqgan.py
— broken: imports the absent ``taming`` package, references a nonexistent
``self.model`` in configure_optimizers, adds an un-reduced adversarial loss;
~600/755 lines commented out; SURVEY §2.4). This is a working taming-style
recipe:

- VQVAE backbone (inherited) with L1 reconstruction + VQ loss,
- PatchGAN discriminator trained with hinge loss, gated on after
  ``disc_start`` steps (lax-masked so one compiled program covers both
  phases),
- adaptive adversarial weight
  ``lambda = ||grad_{last} L_rec|| / (||grad_{last} L_adv|| + 1e-4)``
  computed against the decoder's final conv kernel, clipped to [0, 1e4],
  scaled by ``disc_weight`` — the taming-transformers balance rule, here as
  two extra ``jax.grad`` calls on one parameter leaf inside the same jit,
- perceptual (LPIPS/VGG16) reconstruction term, weight ``perceptual_weight``
  (default 0 = off): ``nll = L1 + perceptual_weight * LPIPS(x_hat, x)``,
  with the adaptive-lambda numerator taken on the same nll (the taming
  recipe). The frozen LPIPS variables ride in ``TrainState.mutable["lpips"]``
  (the LatentDiffusion frozen-weights pattern); pretrained VGG16/lin weights
  load via metrics/lpips.py's sha256-pinned drop-in, with a deterministic
  random-init relative fallback when offline (loud warning).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.models.base import Batch, Metrics
from lightning_generative_models_tpu.models.vae.vqvae import VQVAE
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


class NLayerDiscriminator(nn.Module):
    """PatchGAN (reference vqgan.py:26-90 intent, taming-style)."""

    base_features: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_features, (4, 4), strides=(2, 2), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        feats = self.base_features
        for i in range(1, self.n_layers + 1):
            feats = min(self.base_features * (2**i), 512)
            stride = (2, 2) if i < self.n_layers else (1, 1)
            h = nn.Conv(feats, (4, 4), strides=stride, padding="SAME",
                        use_bias=False)(h)
            h = nn.GroupNorm(num_groups=None, group_size=1)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding="SAME")(h)[..., 0]


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


class VQGAN(VQVAE):
    monitor = "val_recon_loss"

    def __init__(
        self,
        *,
        disc_start: int = 10000,
        disc_weight: float = 0.8,
        disc_lr: float = None,
        perceptual_weight: float = 0.0,
        **vqvae_kwargs,
    ):
        super().__init__(**vqvae_kwargs)
        self.disc_start = disc_start
        self.disc_weight = disc_weight
        self.perceptual_weight = perceptual_weight
        self.discriminator = NLayerDiscriminator()
        lr = vqvae_kwargs.get("lr", 1e-4)
        self.disc_optimizer = make_adam(disc_lr or lr, 0.5, 0.9)
        if perceptual_weight > 0:
            from lightning_generative_models_tpu.metrics.lpips import LPIPS

            self._lpips = LPIPS()

    def init_state(self, rng: jax.Array) -> TrainState:
        base = super().init_state(jax.random.fold_in(rng, 0))
        d_params = self.discriminator.init(
            jax.random.fold_in(rng, 1), jnp.zeros((1, *self.image_shape()))
        )["params"]
        params = dict(base.params)
        params["disc"] = d_params
        opt_state = dict(base.opt_state)
        opt_state["disc"] = self.disc_optimizer.init(d_params)
        mutable = dict(base.mutable)
        if self.perceptual_weight > 0:
            # Frozen: lives in mutable (never differentiated, checkpointed
            # with the run) — the LatentDiffusion frozen-autoencoder pattern.
            mutable["lpips"] = jax.tree_util.tree_map(
                jnp.asarray, self._lpips.variables
            )
        return base.replace(params=params, opt_state=opt_state,
                            mutable=mutable)

    def _perceptual(self, mutable, x_hat, x) -> jax.Array:
        """Mean LPIPS distance in model space ([-1, 1], LPIPS's convention)."""
        from lightning_generative_models_tpu.metrics.lpips import (
            lpips_distance,
        )

        return jnp.mean(
            lpips_distance(
                jax.lax.stop_gradient(mutable["lpips"]), x_hat, x
            )
        )

    # -- helpers -----------------------------------------------------------
    def _last_decoder_kernel_path(self, dec_params) -> str:
        # Sort by the numeric suffix, not lexicographically: with >=10
        # transpose convs "ConvTranspose_10" sorts before "ConvTranspose_2"
        # and the adaptive weight would silently use the wrong layer.
        def index(k: str) -> int:
            _, _, suffix = k.rpartition("_")
            return int(suffix) if suffix.isdigit() else -1

        convs = sorted(
            (k for k in dec_params if k.startswith("ConvTranspose")), key=index
        )
        return convs[-1]

    def _forward_g(self, params, mutable, x, train):
        latents = self.encoder.apply({"params": params["encoder"]}, x)
        (q, vq_loss, ppl), new_mut = self._apply_vq(
            params["vq"], mutable["vq"], latents, train
        )
        x_hat = self.decoder.apply({"params": params["decoder"]}, q)
        return x_hat, vq_loss, ppl, new_mut

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        x01 = prepare_batch(batch, rng, train=True)["image"]
        x = self.to_model_space(x01)
        disc_on = (state.step >= self.disc_start).astype(jnp.float32)

        last_key = self._last_decoder_kernel_path(state.params["decoder"])

        def g_loss_fn(g_params):
            x_hat, vq_loss, ppl, new_mut = self._forward_g(
                g_params, state.mutable, x, True
            )
            recon_loss = jnp.mean(jnp.abs(x_hat - x))
            if self.perceptual_weight > 0:
                p_loss = self._perceptual(state.mutable, x_hat, x)
            else:
                p_loss = jnp.float32(0.0)
            # taming's nll: reconstruction + perceptual, jointly balanced
            # against the adversarial term by the adaptive weight below.
            nll_loss = recon_loss + self.perceptual_weight * p_loss
            logits_fake = self.discriminator.apply(
                {"params": state.params["disc"]}, x_hat
            )
            g_adv = -jnp.mean(logits_fake)

            # Adaptive weight via grads on the final decoder kernel.
            def recon_of_last(kernel):
                p = {**g_params["decoder"], last_key: {
                    **g_params["decoder"][last_key], "kernel": kernel}}
                latents = self.encoder.apply({"params": g_params["encoder"]}, x)
                (q, _, _), _ = self._apply_vq(
                    g_params["vq"], state.mutable["vq"], latents, False
                )
                xh = self.decoder.apply({"params": p}, q)
                out = jnp.mean(jnp.abs(xh - x))
                if self.perceptual_weight > 0:
                    out = out + self.perceptual_weight * self._perceptual(
                        state.mutable, xh, x
                    )
                return out

            def adv_of_last(kernel):
                p = {**g_params["decoder"], last_key: {
                    **g_params["decoder"][last_key], "kernel": kernel}}
                latents = self.encoder.apply({"params": g_params["encoder"]}, x)
                (q, _, _), _ = self._apply_vq(
                    g_params["vq"], state.mutable["vq"], latents, False
                )
                xh = self.decoder.apply({"params": p}, q)
                return -jnp.mean(
                    self.discriminator.apply({"params": state.params["disc"]}, xh)
                )

            kernel = g_params["decoder"][last_key]["kernel"]
            g_rec = optax.global_norm(jax.grad(recon_of_last)(kernel))
            g_adv_norm = optax.global_norm(jax.grad(adv_of_last)(kernel))
            adaptive_w = jnp.clip(g_rec / (g_adv_norm + 1e-4), 0.0, 1e4)
            adaptive_w = jax.lax.stop_gradient(adaptive_w) * self.disc_weight

            loss = (
                self.loss_weights["recon_loss"] * nll_loss
                + self.loss_weights["vq_loss"] * vq_loss
                + disc_on * adaptive_w * g_adv
            )
            metrics = {
                "loss": loss,
                "recon_loss": recon_loss,
                "vq_loss": vq_loss,
                "perplexity": ppl,
                "g_adv_loss": g_adv,
                "adaptive_weight": adaptive_w,
            }
            if self.perceptual_weight > 0:
                metrics["perceptual_loss"] = p_loss
            return loss, (metrics, new_mut, x_hat)

        g_param_tree = {k: state.params[k] for k in ("encoder", "decoder", "vq")}
        g_grads, (g_metrics, new_mut, x_hat) = jax.grad(g_loss_fn, has_aux=True)(
            g_param_tree
        )
        g_updates, g_opt = self.optimizer.update(
            g_grads, state.opt_state["model"], g_param_tree
        )
        new_g = optax.apply_updates(g_param_tree, g_updates)

        def d_loss_fn(d_params):
            logits_real = self.discriminator.apply({"params": d_params}, x)
            logits_fake = self.discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(x_hat)
            )
            return disc_on * hinge_d_loss(logits_real, logits_fake)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.params["disc"])
        d_updates, d_opt = self.disc_optimizer.update(
            d_grads, state.opt_state["disc"], state.params["disc"]
        )
        new_d = optax.apply_updates(state.params["disc"], d_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={**new_g, "disc": new_d},
            # Preserve non-vq mutables (the frozen LPIPS variables).
            mutable={**state.mutable, "vq": new_mut},
            opt_state={"model": g_opt, "disc": d_opt},
        )
        g_metrics["d_loss"] = d_loss
        return new_state, self.prefix_metrics(g_metrics, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x01 = prepare_batch(batch, train=False)["image"]
        x = self.to_model_space(x01)
        x_hat, vq_loss, ppl, _ = self._forward_g(
            {k: state.params[k] for k in ("encoder", "decoder", "vq")},
            state.mutable,
            x,
            False,
        )
        recon_loss = jnp.mean(jnp.abs(x_hat - x))
        logits_fake = self.discriminator.apply({"params": state.params["disc"]}, x_hat)
        metrics = {
            "recon_loss": recon_loss,
            "vq_loss": vq_loss,
            "perplexity": ppl,
            "g_adv_loss": -jnp.mean(logits_fake),
            "loss": recon_loss + vq_loss,
        }
        if self.perceptual_weight > 0:
            p_loss = self._perceptual(state.mutable, x_hat, x)
            metrics["perceptual_loss"] = p_loss
            metrics["loss"] = metrics["loss"] + self.perceptual_weight * p_loss
        return self.prefix_metrics(metrics, "val")
