"""LSGAN: least-squares GAN (Mao et al. 2017).

Parity with the reference LSGAN (reference:
models/generative/gan/lsgan.py:9-97): DCGAN architecture with quadratic
losses ``d = 0.5 E[(D(x)-1)^2] + 0.5 E[D(x_hat)^2]`` and
``g = 0.5 E[(D(x_hat)-1)^2]``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.base import Metrics
from lightning_generative_models_tpu.models.gan.dcgan import DCGAN


class LSGAN(DCGAN):
    def _d_loss(
        self, params_d, mutable_d, x, x_hat, rng, train
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_real, mutable_d = self._discriminate(params_d, mutable_d, x, train)
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        d_loss_real = 0.5 * jnp.mean((logits_real - 1.0) ** 2)
        d_loss_fake = 0.5 * jnp.mean(logits_fake**2)
        d_loss = d_loss_real + d_loss_fake
        metrics = {
            "d_loss": d_loss,
            "d_loss_real": d_loss_real,
            "d_loss_fake": d_loss_fake,
            "logits_real": logits_real.mean(),
            "logits_fake": logits_fake.mean(),
        }
        return d_loss, (metrics, mutable_d)

    def _g_loss(
        self, params_d, mutable_d, x_hat, train
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        g_loss = 0.5 * jnp.mean((logits_fake - 1.0) ** 2)
        return g_loss, ({"g_loss": g_loss}, mutable_d)
