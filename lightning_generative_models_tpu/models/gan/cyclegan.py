"""CycleGAN: unpaired image-to-image translation (Zhu et al. 2017).

Parity-and-completion of the reference CycleGAN (reference:
models/generative/gan/cyclegan.py:11-338): two ResNet generators
(reflection-padded 7x7 stem, stride-2 downsampling, residual blocks with
InstanceNorm, mirrored upsampling, tanh head) and two PatchGAN
discriminators; BCE adversarial + L1 identity + L1 cycle-consistency losses
with lambda weights. The reference had no (A, B) data pipeline and its
identity loss compared ``fake_B`` to ``real_A`` (cyclegan.py:202-205 — a
defect noted in SURVEY §2.4); here the identity loss is the standard
``||G_AB(B) - B|| + ||G_BA(A) - A||`` and the paired-domain DataModule
(data/datamodule.py PairedDataModule) supplies ``image_A``/``image_B``
batches.

TPU notes: InstanceNorm = GroupNorm(group_size=1) in NHWC; reflection
padding via jnp.pad(mode='reflect') + VALID convs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
    bce_with_logits,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


def instance_norm(x: jax.Array) -> nn.Module:
    return nn.GroupNorm(num_groups=None, group_size=1)(x)


def reflect_conv(x: jax.Array, features: int, kernel: int) -> jax.Array:
    pad = kernel // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(features, (kernel, kernel), padding="VALID")(x)


class ResnetGenBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = reflect_conv(x, self.features, 3)
        h = instance_norm(h)
        h = nn.leaky_relu(h, 0.2)
        h = reflect_conv(h, self.features, 3)
        h = instance_norm(h)
        return x + h


class ResnetGenerator(nn.Module):
    out_channels: int
    base_features: int = 64
    num_downsamples: int = 2
    num_residual_blocks: int = 6

    @nn.compact
    def __call__(self, x):
        feats = self.base_features
        h = reflect_conv(x, feats, 7)
        h = instance_norm(h)
        h = nn.leaky_relu(h, 0.2)
        for _ in range(self.num_downsamples):
            feats *= 2
            h = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = instance_norm(h)
            h = nn.leaky_relu(h, 0.2)
        for _ in range(self.num_residual_blocks):
            h = ResnetGenBlock(feats)(h)
        for _ in range(self.num_downsamples):
            feats //= 2
            h = nn.ConvTranspose(feats, (3, 3), strides=(2, 2), padding="SAME")(h)
            h = instance_norm(h)
            h = nn.leaky_relu(h, 0.2)
        h = reflect_conv(h, self.out_channels, 7)
        return jnp.tanh(h)


class PatchDiscriminator(nn.Module):
    """70x70-receptive-field PatchGAN (cyclegan.py:124-150)."""

    @nn.compact
    def __call__(self, x):
        feats = 64
        h = nn.Conv(feats, (4, 4), strides=(2, 2), padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        for feats in (128, 256, 512):
            stride = (2, 2) if feats < 512 else (1, 1)
            h = nn.Conv(feats, (4, 4), strides=stride, padding="SAME")(h)
            h = instance_norm(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding="SAME")(h)[..., 0]


class CycleGAN(GenerativeModel):
    monitor = "val_g_loss"
    supports_grad_accum = False

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        img_size: int = 64,
        lambda_identity: float = 0.5,
        lambda_cycle: float = 10.0,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 0.0,
        num_residual_blocks: int = 6,
        img_channels: int = None,  # config-compat alias for in/out channels
    ):
        if img_channels is not None:
            in_channels = out_channels = img_channels
        super().__init__(in_channels, img_size)
        self.lambda_identity = lambda_identity
        self.lambda_cycle = lambda_cycle
        self.G_AB = ResnetGenerator(out_channels, num_residual_blocks=num_residual_blocks)
        self.G_BA = ResnetGenerator(in_channels, num_residual_blocks=num_residual_blocks)
        self.D_A = PatchDiscriminator()
        self.D_B = PatchDiscriminator()
        self.optimizers = {
            "G": make_adam(lr, b1, b2, weight_decay),
            "D": make_adam(lr, b1, b2, weight_decay),
        }

    def init_state(self, rng: jax.Array) -> TrainState:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        x = jnp.zeros((1, self.img_size, self.img_size, self.img_channels))
        params = {
            "G": {
                "AB": self.G_AB.init(r1, x)["params"],
                "BA": self.G_BA.init(r2, x)["params"],
            },
            "D": {
                "A": self.D_A.init(r3, x)["params"],
                "B": self.D_B.init(r4, x)["params"],
            },
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable={},
            opt_state={
                "G": self.optimizers["G"].init(params["G"]),
                "D": self.optimizers["D"].init(params["D"]),
            },
        )

    # -- losses ---------------------------------------------------------------
    def _g_loss(self, g_params, d_params, real_A, real_B):
        fake_B = self.G_AB.apply({"params": g_params["AB"]}, real_A)
        fake_A = self.G_BA.apply({"params": g_params["BA"]}, real_B)
        cycled_A = self.G_BA.apply({"params": g_params["BA"]}, fake_B)
        cycled_B = self.G_AB.apply({"params": g_params["AB"]}, fake_A)

        logits_fake_A = self.D_A.apply({"params": d_params["A"]}, fake_A)
        logits_fake_B = self.D_B.apply({"params": d_params["B"]}, fake_B)
        adv_loss = bce_with_logits(
            logits_fake_A, jnp.ones_like(logits_fake_A)
        ) + bce_with_logits(logits_fake_B, jnp.ones_like(logits_fake_B))

        # Correct identity loss (the reference compared across domains).
        id_B = self.G_AB.apply({"params": g_params["AB"]}, real_B)
        id_A = self.G_BA.apply({"params": g_params["BA"]}, real_A)
        identity_loss = jnp.mean(jnp.abs(id_B - real_B)) + jnp.mean(
            jnp.abs(id_A - real_A)
        )

        cycle_loss = jnp.mean(jnp.abs(cycled_A - real_A)) + jnp.mean(
            jnp.abs(cycled_B - real_B)
        )
        g_loss = (
            adv_loss
            + identity_loss * self.lambda_identity
            + cycle_loss * self.lambda_cycle
        )
        metrics = {
            "adv_loss": adv_loss,
            "identity_loss": identity_loss,
            "cycle_loss": cycle_loss,
            "g_loss": g_loss,
        }
        return g_loss, (metrics, fake_A, fake_B)

    def _d_loss(self, d_params, real_A, real_B, fake_A, fake_B):
        def single(d_mod, p, real, fake):
            logits_real = d_mod.apply({"params": p}, real)
            logits_fake = d_mod.apply({"params": p}, fake)
            return (
                bce_with_logits(logits_real, jnp.ones_like(logits_real))
                + bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))
            ) / 2

        d_loss_A = single(self.D_A, d_params["A"], real_A, fake_A)
        d_loss_B = single(self.D_B, d_params["B"], real_B, fake_B)
        d_loss = d_loss_A + d_loss_B
        return d_loss, {"d_loss": d_loss, "d_loss_A": d_loss_A, "d_loss_B": d_loss_B}

    # -- steps --------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        ra, rb = jax.random.split(rng)
        real_A = self.to_model_space(
            prepare_batch({"image": batch["image_A"]}, ra, train=True)["image"]
        )
        real_B = self.to_model_space(
            prepare_batch({"image": batch["image_B"]}, rb, train=True)["image"]
        )

        (g_grads, (g_metrics, fake_A, fake_B)) = jax.grad(
            lambda p: self._g_loss(p, state.params["D"], real_A, real_B),
            has_aux=True,
        )(state.params["G"])
        g_updates, g_opt = self.optimizers["G"].update(
            g_grads, state.opt_state["G"], state.params["G"]
        )
        new_g = optax.apply_updates(state.params["G"], g_updates)

        fake_A = jax.lax.stop_gradient(fake_A)
        fake_B = jax.lax.stop_gradient(fake_B)
        d_grads, d_metrics = jax.grad(
            lambda p: self._d_loss(p, real_A, real_B, fake_A, fake_B),
            has_aux=True,
        )(state.params["D"])
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_state["D"], state.params["D"]
        )
        new_d = optax.apply_updates(state.params["D"], d_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={"G": new_g, "D": new_d},
            opt_state={"G": g_opt, "D": d_opt},
        )
        return new_state, self.prefix_metrics({**g_metrics, **d_metrics}, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        real_A = self.to_model_space(
            prepare_batch({"image": batch["image_A"]}, train=False)["image"]
        )
        real_B = self.to_model_space(
            prepare_batch({"image": batch["image_B"]}, train=False)["image"]
        )
        _, (g_metrics, fake_A, fake_B) = self._g_loss(
            state.params["G"], state.params["D"], real_A, real_B
        )
        _, d_metrics = self._d_loss(state.params["D"], real_A, real_B, fake_A, fake_B)
        return self.prefix_metrics({**g_metrics, **d_metrics}, "val")

    def translate(self, state: TrainState, images01: jax.Array, direction="AB"):
        x = self.to_model_space(images01)
        mod, key = (self.G_AB, "AB") if direction == "AB" else (self.G_BA, "BA")
        out = mod.apply({"params": state.params["G"][key]}, x)
        return self.to_image_space(out)

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int):
        raise NotImplementedError("CycleGAN translates images; use translate()")
