"""PixelCNN: masked-convolution autoregressive model (van den Oord et al. 2016).

Parity-and-completion of the reference PixelCNN (reference:
models/generative/autoregressive/pixelcnn.py): type-A initial masked conv,
gated residual blocks (tanh * sigmoid over a type-B 7x7 masked conv), 1x1
output head, 256-way cross-entropy per pixel. The reference's ``sample()``
referenced undefined attributes and its loss mis-shaped multi-channel
targets; both are implemented properly here.

TPU design:
- Masks are applied to the kernel *inside* the forward pass
  (``kernel * mask``) — a constant elementwise multiply XLA folds into the
  conv; no parameter mutation like the reference's in-place
  ``weight.data *= mask`` (which destructively zeroes weights at every step).
- Sampling runs as ONE jitted ``lax.fori_loop`` over pixels with a full
  forward per pixel (the reference's Python double loop re-dispatched a
  kernel per pixel per step).
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
)
from lightning_generative_models_tpu.train.state import TrainState, make_adam


def causal_mask(kh: int, kw: int, mask_type: str) -> jnp.ndarray:
    """[kh, kw] mask: 1 for allowed taps. Type A excludes the center pixel."""
    assert mask_type in ("A", "B")
    mask = jnp.ones((kh, kw), jnp.float32)
    center_h, center_w = kh // 2, kw // 2
    mask = mask.at[center_h, center_w + (1 if mask_type == "B" else 0):].set(0.0)
    mask = mask.at[center_h + 1:, :].set(0.0)
    return mask


class MaskedConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    mask_type: str

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_feat, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = causal_mask(kh, kw, self.mask_type)[:, :, None, None]
        return (
            jax.lax.conv_general_dilated(
                x,
                kernel * mask,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )


class GatedBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = MaskedConv(2 * self.features, (7, 7), "B")(x)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        t, s = jnp.split(out, 2, axis=-1)
        return x + jnp.tanh(t) * jax.nn.sigmoid(s)


class PixelCNNNet(nn.Module):
    hidden_dim: int
    num_layers: int
    img_channels: int
    num_levels: int

    @nn.compact
    def __call__(self, x):
        h = MaskedConv(self.hidden_dim, (7, 7), "A")(x)
        for _ in range(self.num_layers):
            h = GatedBlock(self.hidden_dim)(h)
        logits = nn.Conv(self.img_channels * self.num_levels, (1, 1))(h)
        b, hh, ww, _ = logits.shape
        return logits.reshape(b, hh, ww, self.img_channels, self.num_levels)


class PixelCNN(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        hidden_dim: int = 64,
        num_layers: int = 7,
        num_levels: int = 256,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 0.0,
    ):
        super().__init__(img_channels, img_size)
        self.num_levels = num_levels
        self.net = PixelCNNNet(hidden_dim, num_layers, img_channels, num_levels)
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.net.init(rng, jnp.zeros((1, *self.image_shape())))["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    def _loss(self, params, images_u8):
        # Input in [0,1]; targets are the discrete levels.
        levels = (images_u8.astype(jnp.int32) * self.num_levels) // 256
        x = images_u8.astype(jnp.float32) / 255.0
        logits = self.net.apply({"params": params}, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, levels).mean()
        bits_per_dim = loss / jnp.log(2.0)
        return loss, {"loss": loss, "bits_per_dim": bits_per_dim}

    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        return jax.grad(lambda p: self._loss(p, batch["image"]), has_aux=True)(
            state.params["model"]
        )

    def apply_grad_step(self, state: TrainState, grads, metrics):
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state["model"], state.params["model"]
        )
        new_state = state.replace(
            step=state.step + 1,
            params={"model": optax.apply_updates(state.params["model"], updates)},
            opt_state={"model": new_opt},
        )
        return new_state, self.prefix_metrics(metrics, "train")

    def train_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        return self.apply_grad_step(state, *self.grad_step(state, batch, rng))

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        _, metrics = self._loss(state.params["model"], batch["image"])
        return self.prefix_metrics(metrics, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        """Raster-order ancestral sampling as one jitted pixel loop."""
        h = w = self.img_size
        c = self.img_channels
        params = state.params["model"]

        def body(idx, carry):
            images, loop_rng = carry
            i, j = idx // w, idx % w
            logits = self.net.apply({"params": params}, images)  # [n,h,w,c,L]
            pixel_logits = jax.lax.dynamic_slice(
                logits, (0, i, j, 0, 0), (num_samples, 1, 1, c, self.num_levels)
            )[:, 0, 0]
            step_rng = jax.random.fold_in(loop_rng, idx)
            sampled = jax.random.categorical(step_rng, pixel_logits, axis=-1)
            value = (sampled.astype(jnp.float32) + 0.5) / self.num_levels
            images = jax.lax.dynamic_update_slice(
                images, value[:, None, None, :], (0, i, j, 0)
            )
            return images, loop_rng

        images0 = data_shard(jnp.zeros((num_samples, h, w, c)))
        images, _ = jax.lax.fori_loop(0, h * w, body, (images0, rng))
        return jnp.clip(images, 0.0, 1.0)
