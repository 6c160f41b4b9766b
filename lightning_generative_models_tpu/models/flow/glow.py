"""Glow: generative flow with invertible 1x1 convolutions (Kingma &
Dhariwal 2018, arXiv:1807.03039).

Beyond-reference extension of the flow family (the reference ships only
NICE, models/generative/flow/nice.py): a multi-scale convolutional
normalizing flow — (squeeze -> K x [actnorm -> invertible 1x1 conv ->
affine coupling] -> split) repeated over L levels — trained by exact
maximum likelihood under a standard-normal prior.

TPU-native design points:

- everything is static-shape NHWC: squeeze/unsqueeze are reshapes and
  transposes, the 1x1 "convolution" is one ``[B*H*W, C] @ [C, C]`` MXU
  matmul per step, and the coupling nets are 3x3/1x1 convs that XLA tiles
  onto the MXU directly;
- the 1x1 conv's ``log|det W|`` and its inverse are computed with
  ``jnp.linalg.slogdet`` / ``jnp.linalg.inv`` on the tiny per-step
  ``[C, C]`` weight inside the traced program — C is at most a few
  hundred, so this costs nothing next to the convs and avoids the PLU
  pivot bookkeeping (dynamic gather/scatter) a torch implementation
  carries;
- both directions of every layer are plain methods on one Flax module, so
  ``inverse(forward(x)) == x`` holds exactly and sampling is a single
  jitted program (no Python-side layer loop at run time);
- coupling scales use Glow's ``sigmoid(raw + 2)`` stabilization and the
  final coupling conv is zero-initialized, so the whole flow starts as an
  (actnorm-scaled) identity with log-det 0 from the orthogonal-init 1x1
  convs;
- all multi-scale latents are flattened into one ``[B, H*W*C]`` vector in
  a fixed order, so the prior, sampling and ``log_likelihood`` reuse the
  NICE conventions and ``sample`` shards its noise over the data axis.

Divergences from the paper (documented, not accidental): no
data-dependent actnorm initialization (a stateful warm-up pass is at odds
with the functional init; zeros-init actnorm trains fine at these sizes)
and a standard-normal prior instead of the learned split prior.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
)
from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.train.state import TrainState, make_adam

LOG_2PI = float(np.log(2 * np.pi))


def squeeze2x2(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C] space-to-depth (static reshapes)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unsqueeze2x2(x: jax.Array) -> jax.Array:
    """Exact inverse of :func:`squeeze2x2`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


class ActNorm(nn.Module):
    """Per-channel affine y = (x + bias) * exp(log_scale).

    log|det J| = H*W * sum(log_scale), identical for every example.
    """

    channels: int

    def setup(self):
        self.log_scale = self.param(
            "log_scale", nn.initializers.zeros, (self.channels,)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        _, h, w, _ = x.shape
        y = (x + self.bias) * jnp.exp(self.log_scale)
        return y, h * w * jnp.sum(self.log_scale)

    def inverse(self, y: jax.Array) -> jax.Array:
        return y * jnp.exp(-self.log_scale) - self.bias

    def __call__(self, x):  # init path
        return self.forward(x)


class Inv1x1Conv(nn.Module):
    """Invertible 1x1 convolution: one [BHW,C]@[C,C] MXU matmul.

    Orthogonal init => log|det| = 0 at t=0. The determinant and inverse of
    the small [C,C] weight are computed in-trace; XLA constant-folds
    nothing here (W is a parameter) but the cost is negligible vs convs.
    """

    channels: int

    def setup(self):
        self.w = self.param(
            "w", nn.initializers.orthogonal(), (self.channels, self.channels)
        )

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        _, h, w, _ = x.shape
        y = jnp.einsum("bhwc,cd->bhwd", x, self.w)
        _, logabsdet = jnp.linalg.slogdet(self.w)
        return y, h * w * logabsdet

    def inverse(self, y: jax.Array) -> jax.Array:
        return jnp.einsum("bhwc,cd->bhwd", y, jnp.linalg.inv(self.w))

    def __call__(self, x):  # init path
        return self.forward(x)


class CouplingNet(nn.Module):
    """Conv3x3 -> ReLU -> Conv1x1 -> ReLU -> zero-init Conv3x3."""

    width: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.width, (3, 3), padding="SAME")(x))
        h = nn.relu(nn.Conv(self.width, (1, 1))(h))
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)


class AffineCoupling(nn.Module):
    """y_b = (x_b + t(x_a)) * s(x_a), s = sigmoid(raw + 2).

    Zero-init net => t=0, s=sigmoid(2)≈0.88 at init; per-example
    log|det J| = sum log s.
    """

    channels: int
    width: int

    def setup(self):
        self.ca = self.channels // 2
        self.net = CouplingNet(self.width, 2 * (self.channels - self.ca))

    def _scale_shift(self, xa: jax.Array) -> Tuple[jax.Array, jax.Array]:
        raw = self.net(xa)
        t, raw_s = jnp.split(raw, 2, axis=-1)
        return jax.nn.sigmoid(raw_s + 2.0), t

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        xa, xb = x[..., : self.ca], x[..., self.ca :]
        s, t = self._scale_shift(xa)
        yb = (xb + t) * s
        log_det = jnp.sum(jnp.log(s), axis=(1, 2, 3))
        return jnp.concatenate([xa, yb], axis=-1), log_det

    def inverse(self, y: jax.Array) -> jax.Array:
        ya, yb = y[..., : self.ca], y[..., self.ca :]
        s, t = self._scale_shift(ya)
        xb = yb / s - t
        return jnp.concatenate([ya, xb], axis=-1)

    def __call__(self, x):  # init path
        return self.forward(x)


class FlowStep(nn.Module):
    """actnorm -> invertible 1x1 conv -> affine coupling."""

    channels: int
    width: int

    def setup(self):
        self.actnorm = ActNorm(self.channels)
        self.inv_conv = Inv1x1Conv(self.channels)
        self.coupling = AffineCoupling(self.channels, self.width)

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x, ld1 = self.actnorm.forward(x)
        x, ld2 = self.inv_conv.forward(x)
        x, ld3 = self.coupling.forward(x)
        return x, ld1 + ld2 + ld3

    def inverse(self, y: jax.Array) -> jax.Array:
        y = self.coupling.inverse(y)
        y = self.inv_conv.inverse(y)
        return self.actnorm.inverse(y)

    def __call__(self, x):  # init path
        return self.forward(x)


def _level_channels(img_channels: int, levels: int) -> List[int]:
    """Channel count after the squeeze at each level (static)."""
    out, c = [], img_channels
    for _ in range(levels):
        c *= 4
        out.append(c)
        c //= 2  # split keeps half (ignored for the last level)
    return out


class GlowNet(nn.Module):
    """The full multi-scale flow. forward: x -> (z[B,dim], logdet[B])."""

    img_size: int
    img_channels: int
    levels: int
    depth: int
    width: int

    def setup(self):
        chans = _level_channels(self.img_channels, self.levels)
        self.steps = [
            [FlowStep(c, self.width) for _ in range(self.depth)] for c in chans
        ]

    def latent_shapes(self) -> List[Tuple[int, int, int]]:
        """Static [H,W,C] of each factored-out latent, in flatten order."""
        shapes, s, c = [], self.img_size, self.img_channels
        for lvl in range(self.levels):
            s, c = s // 2, c * 4
            if lvl < self.levels - 1:
                shapes.append((s, s, c // 2))
                c //= 2
            else:
                shapes.append((s, s, c))
        return shapes

    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        h = x
        zs: List[jax.Array] = []
        log_det = jnp.zeros((b,), x.dtype)
        for lvl in range(self.levels):
            h = squeeze2x2(h)
            for step in self.steps[lvl]:
                h, ld = step.forward(h)
                log_det = log_det + ld
            if lvl < self.levels - 1:
                z, h = jnp.split(h, 2, axis=-1)
                zs.append(z.reshape(b, -1))
        zs.append(h.reshape(b, -1))
        return jnp.concatenate(zs, axis=1), log_det

    def inverse(self, z_flat: jax.Array) -> jax.Array:
        b = z_flat.shape[0]
        shapes = self.latent_shapes()
        sizes = [int(np.prod(s)) for s in shapes]
        offsets = np.cumsum([0] + sizes)
        zs = [
            z_flat[:, offsets[i] : offsets[i + 1]].reshape(b, *shapes[i])
            for i in range(self.levels)
        ]
        h = zs[-1]
        for lvl in reversed(range(self.levels)):
            if lvl < self.levels - 1:
                h = jnp.concatenate([zs[lvl], h], axis=-1)
            for step in reversed(self.steps[lvl]):
                h = step.inverse(h)
            h = unsqueeze2x2(h)
        return h

    def __call__(self, x):  # init path
        return self.forward(x)


class Glow(GenerativeModel):
    """Maximum-likelihood trainer over :class:`GlowNet`.

    Input convention: batches arrive as ``[0, 1]`` floats (or uint8); the
    model uniformly dequantizes onto the 1/256 grid and recenters to
    ``[-0.5, 0.5]`` (the paper's preprocessing, arXiv:1807.03039 §3).
    bits/dim carries the standard +8 discrete-grid correction, matching
    the NICE convention (models/flow/nice.py).
    """

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 32,
        levels: int = 3,
        depth: int = 8,
        width: int = 256,
        lr: float = 1e-4,
        b1: float = 0.9,
        b2: float = 0.999,
        weight_decay: float = 0.0,
        sample_temperature: float = 1.0,
        dequantize: bool = True,
    ):
        super().__init__(img_channels, img_size)
        if img_size % (2**levels) != 0:
            raise ValueError(
                f"img_size={img_size} must be divisible by 2^levels={2**levels}"
            )
        self.dim = img_size * img_size * img_channels
        self.dequantize = dequantize
        self.sample_temperature = sample_temperature
        self.net = GlowNet(img_size, img_channels, levels, depth, width)
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    def init_state(self, rng: jax.Array) -> TrainState:
        x0 = jnp.zeros((1, self.img_size, self.img_size, self.img_channels))
        params = self.net.init(rng, x0)["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
        )

    def _prepare(self, images: jax.Array, rng=None) -> jax.Array:
        """[0,1] float (or uint8) -> dequantized [-0.5, 0.5] input."""
        if images.dtype == jnp.uint8:
            x01 = images.astype(jnp.float32) / 255.0
        else:
            x01 = images.astype(jnp.float32)
        if self.dequantize and rng is not None:
            u = jax.random.uniform(rng, x01.shape)
        else:
            u = 0.5
        return (x01 * 255.0 + u) / 256.0 - 0.5

    def _nll(self, params, x):
        z, log_det = self.net.apply({"params": params}, x)
        log_prob = jnp.sum(-0.5 * z**2 - 0.5 * LOG_2PI, axis=1)
        nll = -jnp.mean(log_prob + log_det)
        bits_per_dim = nll / (self.dim * jnp.log(2.0)) + 8.0
        return nll, {"loss": nll, "bits_per_dim": bits_per_dim}

    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        x = self._prepare(batch["image"], rng)
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
        x = self._prepare(batch["image"])
        _, metrics = self._nll(state.params["model"], x)
        return self.prefix_metrics(metrics, "val")

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        z = data_shard(
            jax.random.normal(rng, (num_samples, self.dim))
            * self.sample_temperature
        )
        x = self.net.apply({"params": state.params["model"]}, z, method="inverse")
        return jnp.clip(x + 0.5, 0.0, 1.0)

    def log_likelihood(self, state: TrainState, batch: Batch) -> jax.Array:
        """Per-sample log-likelihood in nats (continuous, dequantized)."""
        x = self._prepare(batch["image"])
        z, log_det = self.net.apply({"params": state.params["model"]}, x)
        return jnp.sum(-0.5 * z**2 - 0.5 * LOG_2PI, axis=1) + log_det

    def summary_spec(self):
        x0 = jnp.zeros((1, self.img_size, self.img_size, self.img_channels))
        return {"glow": (self.net, (x0,), {})}
