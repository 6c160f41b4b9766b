"""On-device input preprocessing.

The reference runs ToTensor/Normalize/Flip in CPU DataLoader workers
(reference: data/datamodule.py:41-76), shipping float32 to the device. Here
batches arrive as uint8 (4x less host->HBM traffic) and the
uint8 -> [0, 1] float conversion + random horizontal flip happen *inside* the
jitted train step, where XLA fuses them into the first conv's input pipeline.

``prepare_batch`` is the single entry point used by every model's train/eval
step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_float01(images: jax.Array, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """uint8 [B,H,W,C] -> float [0, 1]."""
    if images.dtype == jnp.uint8:
        return images.astype(dtype) * (1.0 / 255.0)
    return images.astype(dtype)


def random_hflip(images: jax.Array, rng: jax.Array, prob: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip (reference train transform)."""
    flip = jax.random.bernoulli(rng, prob, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def _fused_kernel(flip_ref, img_ref, out_ref):
    """One image per program: uint8 -> [0,1] float with conditional h-flip."""
    x = img_ref[0].astype(jnp.float32) * (1.0 / 255.0)
    flipped = x[:, ::-1, :]
    out_ref[0] = jnp.where(flip_ref[0] > 0, flipped, x)


def fused_normalize_flip_pallas(
    images_u8: jax.Array, flip: jax.Array, dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Pallas TPU kernel fusing uint8->float normalization with the random
    horizontal flip (BASELINE north star's fused preprocessing kernel).

    One grid program per image; the flip decision rides in as a prefetched
    scalar. For the reference's image sizes XLA's own fusion of
    ``prepare_batch`` is equally fast — benchmark before switching
    (``prepare_batch(backend=...)``).
    """
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    b, h, w, c = images_u8.shape
    wc = w * c
    # 2D-native layout for Mosaic: [B, H, W*C]; reshapes live outside the
    # kernel where XLA handles them for free.
    x2d = images_u8.reshape(b, h, wc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i, flip_ref: (i, 0, 0)),
            pl.BlockSpec((wc, wc), lambda i, flip_ref: (0, 0)),
            pl.BlockSpec((wc, wc), lambda i, flip_ref: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i, flip_ref: (i, 0, 0)),
    )

    # Mosaic supports neither `rev` nor uint8->f32 casts directly; the flip
    # becomes a [W*C, W*C] permutation matmul (MXU) selected per sample, and
    # the cast widens through int32.
    eye = jnp.asarray(np.eye(wc, dtype=np.float32))
    anti = jnp.asarray(
        np.kron(np.eye(w, dtype=np.float32)[::-1], np.eye(c, dtype=np.float32))
    )

    def kernel(flip_pref, img_ref, eye_ref, anti_ref, out_ref):
        i = pl.program_id(0)
        x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        perm = jnp.where(flip_pref[i] > 0, anti_ref[...], eye_ref[...])
        out = jnp.dot(x, perm, preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wc), dtype),
        interpret=interpret,
    )(flip.astype(jnp.int32), x2d, eye, anti)
    return out.reshape(b, h, w, c)


def prepare_batch(
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    hflip: bool = True,
    dtype: jnp.dtype = jnp.float32,
    backend: str = "xla",
) -> Dict[str, jax.Array]:
    """uint8 host batch -> float [0, 1] model batch, with train-time flip.

    ``backend='pallas'`` routes through the fused Pallas kernel; the default
    XLA path compiles to the same fused loop for these shapes.
    """
    out = dict(batch)
    if backend == "pallas" and batch["image"].dtype == jnp.uint8:
        do_flip = train and hflip and rng is not None
        flip = (
            jax.random.bernoulli(rng, 0.5, (batch["image"].shape[0],))
            if do_flip
            else jnp.zeros((batch["image"].shape[0],), jnp.bool_)
        )
        out["image"] = fused_normalize_flip_pallas(batch["image"], flip, dtype)
        return out
    images = to_float01(batch["image"], dtype)
    if train and hflip and rng is not None:
        images = random_hflip(images, rng)
    out["image"] = images
    return out
