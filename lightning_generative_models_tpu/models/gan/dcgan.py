"""DCGAN: Radford et al. 2016 — conv generator/discriminator.

Capability parity with the reference DCGAN (reference:
models/generative/gan/dcgan.py:23-245): 64x64 and 28x28 architecture
branches, BatchNorm in both nets (none on D's first/last block), N(0, 0.02)
conv weight init and N(1, 0.02) BN scale init, BCE losses, and the GAN base
class's alternating D-then-G step. (The reference file itself was
import-broken — ``from torch import List`` — and unreachable through the
loader; here it is first-class.)

TPU design choices:
- NHWC layout throughout; bf16-friendly conv stacks sized in multiples the
  MXU tiles well (feature dims 64..1024).
- The reference's stride-1 "projection" conv-transposes on 1x1 latents
  (dcgan.py:47,57 — k4/k7, padding 0) are a Dense layer in disguise; they are
  implemented as Dense -> reshape, a pure MXU matmul instead of a degenerate
  convolution.
- Stride-2 up/down blocks use ConvTranspose/Conv with SAME padding, which XLA
  lowers to MXU-tiled (transposed) convolutions on TPU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.gan.gan import GAN

# DCGAN paper init: conv kernels ~ N(0, 0.02); BN scale ~ N(1, 0.02).
conv_init = nn.initializers.normal(stddev=0.02)


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


class ConvGenerator(nn.Module):
    """64x64: 4x4x1024 seed -> 4 up-blocks; 28x28: 7x7x256 seed -> 2 up-blocks
    (reference dcgan.py:45-60). ``dtype`` sets the conv compute precision
    (bf16 on TPU); BatchNorm statistics stay f32."""

    img_size: int
    img_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        if self.img_size % 16 == 0:
            seed_hw, widths = self.img_size // 16, (1024, 512, 256, 128)
        elif self.img_size == 28:
            seed_hw, widths = 7, (256, 128)
        else:
            raise ValueError(f"DCGAN supports 28 or multiples of 16, got {self.img_size}")

        h = nn.Dense(
            seed_hw * seed_hw * widths[0], kernel_init=conv_init, dtype=self.dtype
        )(z.astype(self.dtype))
        h = h.reshape(h.shape[0], seed_hw, seed_hw, widths[0])
        h = nn.BatchNorm(
            use_running_average=not train, scale_init=bn_scale_init,
            dtype=jnp.float32,
        )(h)
        h = nn.relu(h).astype(self.dtype)
        for width in widths[1:]:
            h = nn.ConvTranspose(
                width, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, scale_init=bn_scale_init,
                dtype=jnp.float32,
            )(h)
            h = nn.relu(h).astype(self.dtype)
        h = nn.ConvTranspose(
            self.img_channels, (4, 4), strides=(2, 2), padding="SAME",
            use_bias=False, kernel_init=conv_init, dtype=self.dtype,
        )(h)
        return jnp.tanh(h.astype(jnp.float32))


class ConvDiscriminator(nn.Module):
    """Mirrored strided-conv stack (reference dcgan.py:115-130)."""

    img_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.img_size % 16 == 0:
            widths = (64, 128, 256, 512)
        else:  # 28x28
            widths = (64, 128)

        h = x.astype(self.dtype)
        for i, width in enumerate(widths):
            h = nn.Conv(
                width, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            )(h)
            if i > 0:
                h = nn.BatchNorm(
                    use_running_average=not train, scale_init=bn_scale_init,
                    dtype=jnp.float32,
                )(h)
            h = nn.leaky_relu(h, 0.2).astype(self.dtype)

        if self.img_size == 28:
            # 7x7 feature map -> 256 via VALID k7 conv, then 1x1 head
            h = nn.Conv(256, (7, 7), padding="VALID", use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype)(h)
            h = nn.BatchNorm(
                use_running_average=not train, scale_init=bn_scale_init,
                dtype=jnp.float32,
            )(h)
            h = nn.leaky_relu(h, 0.2).astype(self.dtype)
            h = nn.Conv(1, (1, 1), use_bias=False, kernel_init=conv_init,
                        dtype=jnp.float32)(h)
        else:
            final_hw = self.img_size // 16
            h = nn.Conv(1, (final_hw, final_hw), padding="VALID",
                        use_bias=False, kernel_init=conv_init,
                        dtype=jnp.float32)(h)
        return h.reshape(h.shape[0]).astype(jnp.float32)


class DCGAN(GAN):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        latent_dim: int = 100,
        lr: float = 2e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        loss_type: str = "non-saturating",
        calculate_metrics: bool = False,
        metrics=None,
        summary: bool = True,
        use_bf16: bool = True,
    ):
        # Set before super().__init__ — _build_networks reads it.
        self.dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        super().__init__(
            img_channels=img_channels,
            img_size=img_size,
            latent_dim=latent_dim,
            lr=lr,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            loss_type=loss_type,
            calculate_metrics=calculate_metrics,
            metrics=metrics,
            summary=summary,
        )

    def _build_networks(self) -> None:
        dtype = getattr(self, "dtype", jnp.bfloat16)
        self.G = ConvGenerator(self.img_size, self.img_channels, dtype=dtype)
        self.D = ConvDiscriminator(self.img_size, dtype=dtype)

    def _latent_shape(self, batch_size: int) -> Tuple[int, ...]:
        return (batch_size, self.latent_dim)
