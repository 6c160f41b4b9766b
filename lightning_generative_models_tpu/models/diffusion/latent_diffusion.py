"""Latent diffusion: DDPM in a frozen VQ autoencoder's latent space.

Beyond reference (the reference diffusion stack is pixel-space only). This is
the Rombach et al. 2022 (arXiv:2112.10752) VQ-regularized recipe: pre-train a
VQVAE/VQGAN, freeze it, and train the SAME GaussianDiffusion + UNet stack on
the continuous pre-quantization latents; sampling diffuses a latent and
decodes it through the quantizer + decoder. On an f8 autoencoder every UNet
evaluation sees 64x fewer pixels, so training and sampling throughput scale
accordingly at fixed image resolution — the production recipe for high-res
generation.

Design (TPU-first, zero new diffusion code):

- The frozen autoencoder rides in ``TrainState.mutable["autoencoder"]`` and
  is returned untouched by every step: it is checkpointed WITH the diffusion
  run, so an LDM checkpoint is self-contained (restoring it recovers the
  exact encoder/decoder even if the original AE experiment is gone), and the
  whole encode -> p_losses -> update pipeline stays one jitted program — the
  encoder fuses into the train step, no host round-trip between AE and UNet.
- All DDPM machinery (objectives, schedules, ddpm/ddim/dpmpp samplers, EMA
  gating, classifier-free guidance, grad-accum protocol) is inherited; only
  the two ``_to/_from_diffusion_space`` hooks differ.
- Latents are unbounded, so the diffusion runs with ``auto_normalize=False``
  and ``x_start_clip=None`` (the pixel-space [-1,1] clamp would corrupt
  them); ``latent_scale`` rescales latents toward unit variance — pick it as
  1 / the ``val_latent_std`` metric this model logs (LDM's 1/std rule).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.base import Batch, Metrics
from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

#: attributes an autoencoder must expose (VQVAE and VQGAN both qualify).
_AE_PROTOCOL = ("encoder", "decoder", "_apply_vq", "embedding_dim")


class LatentDiffusion(DDPM):
    """DDPM over a frozen VQ autoencoder's continuous latents.

    ``autoencoder`` configures the frozen stage-1 model::

        {"config_path": "configs/vae/vqvae_cifar10.json",
         "experiment_name": "<trained AE run>",   # optional, see below
         "which": "last"}

    With ``experiment_name`` the AE weights are restored from that
    experiment's checkpoint (strict: missing checkpoint is an error).
    Without it the AE is RANDOM-INIT and a loud warning is emitted — only
    meaningful for smoke tests, except that restoring an LDM checkpoint
    overwrites the AE with the one stored inside it (LDM checkpoints are
    self-contained), so ``--resume`` / ``--eval`` / ``generate.py`` on an
    existing run never need the AE experiment.

    ``img_size``/``img_channels`` keep their IMAGE-space meaning (config
    cross-checks, FID, sample grids); the UNet and diffusion run at
    ``img_size / 8`` spatial with ``embedding_dim`` channels (the VQ
    backbone's f8 factor).
    """

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        autoencoder: Optional[dict] = None,
        latent_scale: float = 1.0,
        dim_mults=(1, 2, 4),
        **ddpm_kwargs,
    ):
        self.ae, ae_tree, downsample = self._build_autoencoder(
            autoencoder, img_channels, img_size
        )
        self._ae_host_tree = ae_tree
        if img_size % downsample:
            raise ValueError(
                f"img_size {img_size} not divisible by the autoencoder's "
                f"downsample factor {downsample}"
            )
        latent_hw = img_size // downsample
        latent_c = self.ae.embedding_dim

        super().__init__(
            img_channels=latent_c,
            img_size=latent_hw,
            dim_mults=tuple(dim_mults),
            **ddpm_kwargs,
        )
        # External surface stays image-space; latent geometry is internal.
        self.img_channels = img_channels
        self.img_size = img_size
        self.latent_hw = latent_hw
        self.latent_c = latent_c
        self.latent_scale = float(latent_scale)
        # Latents are unbounded: no [0,1]<->[-1,1] mapping, no x0 clamp.
        # (Plain trace-time attributes on GaussianDiffusion — see its
        # x_start_clip docstring.)
        self.diffusion.auto_normalize = False
        self.diffusion.x_start_clip = None

    # -- stage-1 autoencoder ---------------------------------------------------
    @staticmethod
    def _build_autoencoder(spec, img_channels, img_size):
        """Instantiate + (optionally) restore the frozen AE; returns
        ``(model, host_param_tree, downsample_factor)``."""
        # Local imports: registry/config import model modules (cycle).
        from lightning_generative_models_tpu.config import ConfigError, load_config
        from lightning_generative_models_tpu.registry import load_model

        if not spec or "config_path" not in spec:
            raise ValueError(
                "LatentDiffusion requires autoencoder={'config_path': ..., "
                "'experiment_name': <trained run, optional>}"
            )
        spec = dict(spec)
        ae_config = load_config(spec["config_path"])
        ae_name = ae_config["model"]["name"]
        ae_args = ae_config["model"]["args"]
        if ae_args.get("img_size") != img_size or (
            ae_args.get("img_channels") != img_channels
        ):
            raise ConfigError(
                f"autoencoder config {spec['config_path']} is "
                f"{ae_args.get('img_size')}x{ae_args.get('img_size')}x"
                f"{ae_args.get('img_channels')} but LatentDiffusion is "
                f"{img_size}x{img_size}x{img_channels}"
            )
        ae = load_model(ae_config["model"])
        missing = [a for a in _AE_PROTOCOL if not hasattr(ae, a)]
        if missing:
            raise ValueError(
                f"{ae_name} cannot back LatentDiffusion (missing {missing}); "
                "use VQVAE or VQGAN"
            )

        state = ae.init_state(jax.random.PRNGKey(0))
        exp_name = spec.get("experiment_name")
        if exp_name:
            from lightning_generative_models_tpu.train.checkpoint import (
                CheckpointManager,
            )
            from lightning_generative_models_tpu.utils.path import EXPERIMENT_DIR

            which = spec.get("which", "last")
            mgr = CheckpointManager(
                EXPERIMENT_DIR / ae_name / exp_name / "checkpoints",
                monitor=ae.monitor,
            )
            state, step, _ = mgr.restore(state, which)
            logger.info(
                "LatentDiffusion: frozen %s from experiment %s (%s, step %s)",
                ae_name, exp_name, which, step,
            )
        else:
            logger.warning(
                "LatentDiffusion: autoencoder has NO experiment_name — using "
                "RANDOM-INIT %s weights (smoke testing only). Restoring an "
                "LDM checkpoint will replace them with the AE stored inside "
                "it.", ae_name,
            )

        tree = {
            "params": {k: state.params[k] for k in ("encoder", "decoder", "vq")},
            "vq": state.mutable["vq"],
        }
        # VQ backbone: three stride-2 convs -> f8 (vqvae.py:49-53,110).
        downsample = ae.img_size // ae.latent_hw
        return ae, tree, downsample

    # -- state -------------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        z = jnp.zeros((1, self.latent_hw, self.latent_hw, self.latent_c))
        t = jnp.zeros((1,), jnp.int32)
        kwargs = (
            {"labels": jnp.zeros((1,), jnp.int32)} if self.num_classes else {}
        )
        params = self.unet.init(rng, z, t, **kwargs)["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={
                "autoencoder": jax.tree_util.tree_map(
                    jnp.asarray, self._ae_host_tree
                )
            },
            opt_state={"model": self.optimizer.init(params)},
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )

    # -- diffusion-space hooks ------------------------------------------------------
    def _to_diffusion_space(self, state: TrainState, x01: jax.Array) -> jax.Array:
        """[0,1] images -> scaled continuous (pre-quantization) latents.
        stop_gradient keeps the AE frozen (its params receive no grads and
        every step returns ``mutable`` untouched)."""
        ae = state.mutable["autoencoder"]
        x = self.to_model_space(x01)
        z = self.ae.encoder.apply({"params": ae["params"]["encoder"]}, x)
        return jax.lax.stop_gradient(z) * self.latent_scale

    def _from_diffusion_space(self, state: TrainState, z: jax.Array) -> jax.Array:
        """Scaled latents -> [0,1] images, through the VQ quantizer + decoder
        (the VQ-reg LDM decode path: quantization lives in the decoder)."""
        ae = state.mutable["autoencoder"]
        latents = z / self.latent_scale
        (q, _, _), _ = self.ae._apply_vq(
            ae["params"]["vq"], ae["vq"], latents, False
        )
        x = self.ae.decoder.apply({"params": ae["params"]["decoder"]}, q)
        return self.to_image_space(x)

    # -- steps -------------------------------------------------------------------
    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        metrics = super().eval_step(state, batch, rng)
        # Unscaled latent std — set latent_scale ~= 1/this (LDM's rule).
        z = self._to_diffusion_space(
            state, prepare_batch(batch, train=False)["image"]
        )
        metrics["val_latent_std"] = jnp.std(z) / self.latent_scale
        return metrics

    def summary_spec(self):
        kwargs = (
            {"labels": jnp.zeros((1,), jnp.int32)} if self.num_classes else {}
        )
        return {
            "unet": (
                self.unet,
                (
                    jnp.zeros((1, self.latent_hw, self.latent_hw, self.latent_c)),
                    jnp.zeros((1,), jnp.int32),
                ),
                kwargs,
            )
        }
