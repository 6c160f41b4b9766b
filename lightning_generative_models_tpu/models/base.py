"""GenerativeModel: the framework's model protocol.

Replaces the reference's ``pl.LightningModule`` protocol (forward /
training_step / validation_step / configure_optimizers; see e.g.
reference models/generative/gan/gan.py:92-200) with pure functions over an
explicit :class:`~lightning_generative_models_tpu.train.state.TrainState`:

- ``init_state(rng)``            -> TrainState (params, mutable, opt states)
- ``train_step(state, batch, rng)`` -> (new_state, metrics)   [pure, jitted]
- ``eval_step(state, batch, rng)``  -> metrics                [pure, jitted]
- ``sample(state, rng, n)``      -> images in [0, 1], NHWC    [pure, jitted]

Conventions (TPU-first, deliberately diverging from the torch reference):
- images are NHWC; batches are dicts ``{"image": f32[B,H,W,C] in [0,1],
  "label": i32[B]}``. Models that train in [-1, 1] space rescale internally
  (the reference instead normalized in the data pipeline,
  data/datamodule.py:44-51, and DDPM then re-normalized — a quirk we fix).
- every source of randomness takes an explicit PRNG key.
- losses are means over the global (sharded) batch, so multi-chip metric
  reduction happens inside the jitted program (reference: sync_dist=True).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]
Metrics = Dict[str, jax.Array]


class GenerativeModel:
    """Base class for all generative models in the framework."""

    #: metric key the checkpointer monitors (reference train.py:116 monitors
    #: "val_loss"; GAN subclasses override with "val_g_loss" so the monitored
    #: key always exists — fixing reference bug SURVEY §2.8(3)).
    monitor: str = "val_loss"

    def __init__(self, img_channels: int, img_size: int):
        self.img_channels = img_channels
        self.img_size = img_size

    # -- protocol ------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        raise NotImplementedError

    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        raise NotImplementedError

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        raise NotImplementedError

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        raise NotImplementedError

    # -- gradient accumulation (optional) -------------------------------------
    # Single-optimizer models decompose train_step into grad_step (pure
    # gradient evaluation, no state change) + apply_grad_step (optimizer /
    # EMA / counter updates), so the Trainer can accumulate gradients over
    # micro-batches in fixed memory with a lax.scan (reference: Lightning's
    # accumulate_grad_batches, train.py:39,129). Invariant:
    # ``train_step(s, b, r) == apply_grad_step(s, *grad_step(s, b, r))``.
    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        raise NotImplementedError

    def apply_grad_step(self, state: TrainState, grads, metrics):
        raise NotImplementedError

    def summary_spec(self):
        """Optional ``{name: (module, example_args, apply_kwargs)}`` for
        per-layer summaries (reference: torchinfo tables, gan.py:323-354).
        The Trainer renders each through ``flax.linen.tabulate``."""
        return {}

    def validation_grids(
        self, state: TrainState, rng: jax.Array
    ) -> Dict[str, jax.Array]:
        """Optional named sample grids logged every validation epoch.

        Conditional models override this with structured grids (reference:
        CGAN's per-class grid cgan.py:331-357, InfoGAN's code-transition grid
        infogan.py:499-510). Returns ``{name: images[N,H,W,C] in [0,1]}``;
        the Trainer lays each out with 8 images per row.
        """
        return {}

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def to_model_space(x01: jax.Array) -> jax.Array:
        """[0, 1] -> [-1, 1] (tanh output space)."""
        return x01 * 2.0 - 1.0

    @staticmethod
    def to_image_space(xm11: jax.Array) -> jax.Array:
        """[-1, 1] -> [0, 1], clipped."""
        return jnp.clip(xm11 * 0.5 + 0.5, 0.0, 1.0)

    def image_shape(self) -> Tuple[int, int, int]:
        return (self.img_size, self.img_size, self.img_channels)

    @staticmethod
    def prefix_metrics(metrics: Metrics, mode: str) -> Metrics:
        return {f"{mode}_{k}": v for k, v in metrics.items()}


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (torch bce_with_logits parity)."""
    # max(l,0) - l*t + log(1+exp(-|l|)) — numerically stable form.
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
