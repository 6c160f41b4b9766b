"""R1GAN: BCE GAN with R1 gradient penalty on reals (Mescheder et al. 2018).

Parity with the reference R1GAN (reference:
models/generative/gan/r1gan.py:10-94): DCGAN nets; D loss = mean BCE +
``r1_penalty * 0.5 * E[ ||d D(x) / d x||^2 ]`` computed on the real batch.

TPU design: the reference's ``torch.enable_grad`` + ``autograd.grad(...,
create_graph=True)`` double-backward (r1gan.py:73-83) is a nested ``jax.grad``
over the *input*: the penalty term is an ordinary differentiable function of
D's parameters, so the outer parameter gradient differentiates through the
inner input gradient automatically. The inner D forward runs with frozen
normalization statistics (eval-mode BN), matching how torch's autograd treats
running stats as constants inside the penalty.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.base import Metrics, bce_with_logits
from lightning_generative_models_tpu.models.gan.dcgan import DCGAN


class R1GAN(DCGAN):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        latent_dim: int = 100,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        r1_penalty: float = 10.0,
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
        use_bf16: bool = False,  # f32 default: R1 penalty precision
    ):
        self.r1_penalty = r1_penalty
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

    def _r1(self, params_d, mutable_d, x: jax.Array) -> jax.Array:
        def d_sum(x_in):
            logits, _ = self._discriminate(params_d, mutable_d, x_in, train=False)
            return logits.sum()

        grad_x = jax.grad(d_sum)(x)
        return 0.5 * jnp.mean(jnp.sum(grad_x**2, axis=(1, 2, 3)))

    def _d_loss(
        self, params_d, mutable_d, x, x_hat, rng, train
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        logits_real, mutable_d = self._discriminate(params_d, mutable_d, x, train)
        logits_fake, mutable_d = self._discriminate(params_d, mutable_d, x_hat, train)
        d_loss_real = bce_with_logits(logits_real, jnp.ones_like(logits_real))
        d_loss_fake = bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
        d_loss = (d_loss_real + d_loss_fake) / 2

        r1 = self._r1(params_d, mutable_d, x) if train else jnp.zeros(())
        d_loss = d_loss + self.r1_penalty * r1
        metrics = {
            "d_loss": d_loss,
            "d_loss_real": d_loss_real,
            "d_loss_fake": d_loss_fake,
            "r1_penalty": r1,
            "logits_real": logits_real.mean(),
            "logits_fake": logits_fake.mean(),
        }
        return d_loss, (metrics, mutable_d)
