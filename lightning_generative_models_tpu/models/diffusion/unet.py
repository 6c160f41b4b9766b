"""Diffusion UNet (NHWC, TPU-first).

Capability parity with the reference UNet (reference:
models/generative/diffusion/ddpm.py:93-471): 7x7 init conv; per-resolution
[2 x FiLM ResnetBlock + attention + downsample]; mid block/attn/block;
symmetric up path with skip concatenations; final residual block over the
concatenated init features; time conditioning through sinusoidal (or
random/learned Fourier) embeddings -> MLP -> per-block scale/shift; linear
attention at outer resolutions, full attention innermost; space-to-depth
downsample (ddpm.py:100-104) and nearest-neighbor-x2 + conv upsample
(ddpm.py:93-97).

TPU design:
- NHWC layout: channels-last is the native TPU conv layout (lane dimension),
  so every conv lands on the MXU without layout transposes.
- space-to-depth / depth-to-space are pure reshapes in NHWC — zero-copy in
  XLA, vs. the reference's einops rearrange of a strided NCHW view.
- ``dtype`` selects the compute precision (bf16 by default on TPU callers);
  params and normalization statistics stay f32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.modules.attention import (
    Attention,
    LinearAttention,
)
from lightning_generative_models_tpu.models.modules.time_embedding import (
    RandomOrLearnedSinusoidalPosEmb,
    SinusoidalPosEmb,
)


class Block(nn.Module):
    """conv 3x3 -> GroupNorm -> (FiLM scale/shift) -> SiLU (ddpm.py:157-173).

    The GN/FiLM/SiLU chain deliberately stays in XLA: a fused Pallas
    version was built and measured SLOWER end-to-end on v5e (UNet fwd
    7.1 -> 10.8 ms, step 22.8 -> 30.3 ms) because the opaque custom call
    breaks XLA's fusion of the chain into the surrounding convs — the
    kernel was removed in r4; the full record lives in
    docs/PERFORMANCE.md "Closed levers".
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, dtype=jnp.float32)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale[:, None, None, :] + 1) + shift[:, None, None, :]
        return nn.silu(x).astype(self.dtype)


class ResnetBlock(nn.Module):
    """Two blocks + FiLM time conditioning + skip (ddpm.py:176-200)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if time_emb is not None:
            t = nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=jnp.float32)(t)
            scale_shift = jnp.split(t, 2, axis=-1)
        h = Block(self.dim_out, self.groups, self.dtype)(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)
        return h + x


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C] — a pure reshape/transpose in NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class Downsample(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Batch-only pin: under FSDP the 1x1 kernel is channel-sharded and
        # the space-to-depth reshape's backward otherwise inherits a channel
        # sharding GSPMD can only resolve by full rematerialization (see
        # models/modules/attention.py for the same pattern). No-op without
        # an ambient data mesh.
        from lightning_generative_models_tpu.parallel.mesh import data_shard

        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(
            data_shard(space_to_depth(x))
        )


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x via broadcast+reshape (no gather — XLA folds this
    into the following conv's input layout far better than image.resize)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype)(x)


def _cast_tuple(value, length: int) -> Tuple:
    if isinstance(value, (tuple, list)):
        assert len(value) == length
        return tuple(value)
    return (value,) * length


class UNet(nn.Module):
    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    # Class conditioning (beyond reference, which has unconditional diffusion
    # only): an Embed(num_classes + 1, time_dim) table added to the time
    # embedding; index ``num_classes`` is the learned null token used for
    # classifier-free-guidance dropout and unconditional evals.
    num_classes: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    sinusoidal_pos_emb_theta: float = 10000.0
    attn_dim_head: Union[int, Sequence[int]] = 32
    attn_heads: Union[int, Sequence[int]] = 4
    full_attn: Optional[Sequence[bool]] = None  # default: innermost only
    flash_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    @property
    def output_channels(self) -> int:
        if self.out_dim is not None:
            return self.out_dim
        return self.channels * (2 if self.learned_variance else 1)

    @property
    def null_class(self) -> int:
        """Label value meaning 'unconditional' when ``num_classes`` is set."""
        assert self.num_classes is not None
        return self.num_classes

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        x_self_cond: Optional[jax.Array] = None,
        labels: Optional[jax.Array] = None,
    ) -> jax.Array:
        num_stages = len(self.dim_mults)
        full_attn = self.full_attn or ((False,) * (num_stages - 1) + (True,))
        full_attn = _cast_tuple(full_attn, num_stages)
        heads = _cast_tuple(self.attn_heads, num_stages)
        dim_heads = _cast_tuple(self.attn_dim_head, num_stages)

        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        x = x.astype(self.dtype)
        x = nn.Conv(init_dim, (7, 7), padding="SAME", dtype=self.dtype)(x)
        r = x

        # time embedding -> MLP (ddpm.py:311-333)
        time_dim = self.dim * 4
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features
            )(time)
        else:
            emb = SinusoidalPosEmb(self.dim, self.sinusoidal_pos_emb_theta)(time)
        t = nn.Dense(time_dim)(emb)
        t = nn.gelu(t)
        t = nn.Dense(time_dim)(t)

        if self.num_classes is not None:
            if labels is None:
                raise ValueError(
                    "UNet(num_classes=...) requires labels; pass "
                    f"jnp.full((B,), {self.null_class}) for unconditional"
                )
            # Additive class conditioning through the same FiLM pathway the
            # time signal uses — zero extra parameters downstream, and the
            # embedding lookup fuses into the (tiny) time-MLP fusion.
            t = t + nn.Embed(
                self.num_classes + 1, time_dim, name="class_emb"
            )(labels.astype(jnp.int32))

        def attn_layer(stage: int, dim: int):
            # residual=True folds the `attn(x) + x` into the attention block
            # (one fused kernel on TPU; saves a full activation round-trip).
            if full_attn[stage]:
                return Attention(
                    dim, heads=heads[stage], dim_head=dim_heads[stage],
                    flash=self.flash_attn, dtype=self.dtype, residual=True,
                )
            return LinearAttention(
                dim, heads=heads[stage], dim_head=dim_heads[stage],
                dtype=self.dtype, residual=True,
            )

        skips = []
        for stage, (dim_in, dim_out) in enumerate(in_out):
            is_last = stage == num_stages - 1
            x = ResnetBlock(dim_in, self.resnet_block_groups, self.dtype)(x, t)
            skips.append(x)
            x = ResnetBlock(dim_in, self.resnet_block_groups, self.dtype)(x, t)
            x = attn_layer(stage, dim_in)(x)
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, self.dtype)(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding="SAME", dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, self.resnet_block_groups, self.dtype)(x, t)
        x = Attention(
            mid_dim, heads=heads[-1], dim_head=dim_heads[-1],
            flash=self.flash_attn, dtype=self.dtype, residual=True,
        )(x)
        x = ResnetBlock(mid_dim, self.resnet_block_groups, self.dtype)(x, t)

        for stage, (dim_in, dim_out) in enumerate(reversed(in_out)):
            rev_stage = num_stages - 1 - stage
            is_last = stage == num_stages - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, self.resnet_block_groups, self.dtype)(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, self.resnet_block_groups, self.dtype)(x, t)
            x = attn_layer(rev_stage, dim_out)(x)
            if not is_last:
                x = Upsample(dim_in, self.dtype)(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, self.resnet_block_groups, self.dtype)(x, t)
        out = nn.Conv(self.output_channels, (1, 1), dtype=jnp.float32)(x)
        return out.astype(jnp.float32)
