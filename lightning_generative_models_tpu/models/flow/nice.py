"""NICE: non-linear independent components estimation (Dinh et al. 2015).

Parity-and-completion of the reference NICE (reference:
models/generative/flow/nice.py:7-90): additive coupling layers with MLP
transformations and a diagonal scaling layer under a standard-normal prior.
Reference defects fixed here (SURVEY §2.4):

- the reference's loss double-negated the sign convention
  (nice.py:68-79: returns -(LL - logdet) where logdet should be *added*);
  here NLL = -(log N(z) + sum(log_scale)) directly;
- the reference never alternated coupling partitions, so half the input was
  never transformed; here partitions swap between layers (the paper's
  scheme), making the flow expressive and exactly invertible;
- sampling (absent in the reference) is implemented via the exact inverse;
- inputs are uniformly dequantized (standard for discrete-image flows).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
)
from lightning_generative_models_tpu.train.state import TrainState, make_adam

LOG_2PI = float(np.log(2 * np.pi))


class CouplingNet(nn.Module):
    out_dim: int
    hidden_dim: int
    num_hidden_layers: int

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(self.num_hidden_layers):
            h = nn.leaky_relu(nn.Dense(self.hidden_dim)(h), 0.2)
        return nn.Dense(self.out_dim)(h)


class NICENet(nn.Module):
    dim: int
    hidden_dim: int
    num_coupling_layers: int
    num_hidden_layers: int

    def setup(self):
        half = self.dim // 2
        self.nets = [
            CouplingNet(self.dim - half, self.hidden_dim, self.num_hidden_layers)
            for _ in range(self.num_coupling_layers)
        ]
        self.log_scale = self.param(
            "log_scale", nn.initializers.zeros, (self.dim,)
        )

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x -> (z, log|det J|). Alternating additive couplings + scaling."""
        half = self.dim // 2
        x1, x2 = x[:, :half], x[:, half:]
        for i, net in enumerate(self.nets):
            if i % 2 == 0:
                x2 = x2 + net(x1)
            else:
                x1 = x1 + net(x2)[:, :half]
        z = jnp.concatenate([x1, x2], axis=1) * jnp.exp(self.log_scale)
        log_det = jnp.sum(self.log_scale)
        return z, log_det

    def inverse(self, z: jax.Array) -> jax.Array:
        half = self.dim // 2
        x = z * jnp.exp(-self.log_scale)
        x1, x2 = x[:, :half], x[:, half:]
        for i in reversed(range(len(self.nets))):
            net = self.nets[i]
            if i % 2 == 0:
                x2 = x2 - net(x1)
            else:
                x1 = x1 - net(x2)[:, :half]
        return jnp.concatenate([x1, x2], axis=1)

    def __call__(self, x):
        return self.forward(x)


class NICE(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 1,
        img_size: int = 28,
        hidden_dim: int = 1000,
        num_coupling_layers: int = 4,
        num_hidden_layers: int = 5,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 0.0,
        dequantize: bool = True,
    ):
        super().__init__(img_channels, img_size)
        self.dim = img_size * img_size * img_channels
        self.dequantize = dequantize
        self.net = NICENet(self.dim, hidden_dim, num_coupling_layers, num_hidden_layers)
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.net.init(rng, jnp.zeros((1, self.dim)))["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    def _flatten(self, images_u8: jax.Array, rng=None) -> jax.Array:
        x = images_u8.astype(jnp.float32)
        if self.dequantize and rng is not None:
            x = x + jax.random.uniform(rng, x.shape)
        else:
            x = x + 0.5
        x = x / 256.0
        return x.reshape(x.shape[0], -1)

    def _nll(self, params, x_flat):
        z, log_det = self.net.apply({"params": params}, x_flat)
        log_prob = jnp.sum(-0.5 * z**2 - 0.5 * LOG_2PI, axis=1)
        ll = log_prob + log_det
        nll = -jnp.mean(ll)
        bits_per_dim = nll / (self.dim * jnp.log(2.0)) + 8.0  # dequant correction
        return nll, {"loss": nll, "bits_per_dim": bits_per_dim}

    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        x = self._flatten(batch["image"], rng)
        return jax.grad(lambda p: self._nll(p, x), has_aux=True)(
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
        x = self._flatten(batch["image"])
        _, metrics = self._nll(state.params["model"], x)
        return self.prefix_metrics(metrics, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        z = data_shard(jax.random.normal(rng, (num_samples, self.dim)))
        x = self.net.apply({"params": state.params["model"]}, z, method="inverse")
        x = jnp.clip(x, 0.0, 1.0)
        return x.reshape(num_samples, *self.image_shape())

    def log_likelihood(self, state: TrainState, batch: Batch) -> jax.Array:
        """Per-sample log-likelihood in nats (continuous, dequantized)."""
        x = self._flatten(batch["image"])
        z, log_det = self.net.apply({"params": state.params["model"]}, x)
        return jnp.sum(-0.5 * z**2 - 0.5 * LOG_2PI, axis=1) + log_det
