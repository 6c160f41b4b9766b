"""VQ-VAE: van den Oord et al. 2017 (plain + EMA codebook).

Parity with the reference VQVAE (reference:
models/generative/vae/vqvae.py:17-294): encoder = three stride-2 convs
(hidden/4 -> hidden/2 -> hidden) + 3x3 conv + residual stack + 1x1 projection
to the embedding dim; decoder mirrors with transposed convs and tanh;
loss = weighted MSE reconstruction + weighted VQ loss (``loss_weights``);
codebook perplexity logged; ``use_ema`` selects the EMA codebook
(vqvae.py:146-160); ``random_sample`` decodes random codebook indices
(vqvae.py:229-256).

TPU notes: NHWC conv stacks; the VQ nearest-neighbor is a single MXU matmul
(see modules/vector_quantizer.py); the EMA codebook lives in a mutable
``codebook`` collection carried in TrainState.mutable and updated inside the
jitted train step over the global batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
from lightning_generative_models_tpu.models.modules.residual import ResidualStack
from lightning_generative_models_tpu.models.modules.vector_quantizer import (
    VectorQuantizer,
    VectorQuantizerEMA,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import TrainState, make_adam


class Encoder(nn.Module):
    embedding_dim: int
    hidden_dim: int
    num_residual_layers: int
    num_residual_hiddens: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.hidden_dim // 4, (4, 4), strides=(2, 2), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_dim // 2, (4, 4), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_dim, (4, 4), strides=(2, 2), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(h)
        h = ResidualStack(
            self.hidden_dim, self.num_residual_layers, self.num_residual_hiddens
        )(h)
        return nn.Conv(self.embedding_dim, (1, 1))(h)


class Decoder(nn.Module):
    img_channels: int
    hidden_dim: int
    num_residual_layers: int
    num_residual_hiddens: int

    @nn.compact
    def __call__(self, q: jax.Array) -> jax.Array:
        h = nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(q)
        h = ResidualStack(
            self.hidden_dim, self.num_residual_layers, self.num_residual_hiddens
        )(h)
        h = nn.ConvTranspose(self.hidden_dim // 2, (4, 4), strides=(2, 2),
                             padding="SAME")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.hidden_dim // 4, (4, 4), strides=(2, 2),
                             padding="SAME")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.img_channels, (4, 4), strides=(2, 2),
                             padding="SAME")(h)
        return jnp.tanh(h)


class VQVAE(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        embedding_dim: int = 64,
        num_embeddings: int = 512,
        hidden_dim: int = 256,
        num_residual_layers: int = 2,
        num_residual_hiddens: int = 256,
        commitment_cost: float = 0.25,
        use_ema: bool = True,
        decay: float = 0.99,
        epsilon: float = 1e-5,
        lr: float = 1e-4,
        b1: float = 0.5,
        b2: float = 0.999,
        weight_decay: float = 1e-5,
        loss_weights: Optional[Dict[str, float]] = None,
    ):
        super().__init__(img_channels, img_size)
        self.embedding_dim = embedding_dim
        self.num_embeddings = num_embeddings
        self.use_ema = use_ema
        self.loss_weights = loss_weights or {"recon_loss": 1.0, "vq_loss": 1.0}
        self.latent_hw = img_size // 8  # three stride-2 convs

        self.encoder = Encoder(
            embedding_dim, hidden_dim, num_residual_layers, num_residual_hiddens
        )
        self.decoder = Decoder(
            img_channels, hidden_dim, num_residual_layers, num_residual_hiddens
        )
        if use_ema:
            self.vq = VectorQuantizerEMA(
                num_embeddings, embedding_dim, commitment_cost, decay, epsilon
            )
        else:
            self.vq = VectorQuantizer(num_embeddings, embedding_dim, commitment_cost)
        self.optimizer = make_adam(lr, b1, b2, weight_decay)

    # -- state ------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        enc_rng, vq_rng, dec_rng = jax.random.split(rng, 3)
        x = jnp.zeros((1, *self.image_shape()))
        enc_params = self.encoder.init(enc_rng, x)["params"]
        latents = self.encoder.apply({"params": enc_params}, x)
        vq_vars = self.vq.init({"params": vq_rng}, latents, train=False)
        dec_params = self.decoder.init(dec_rng, latents)["params"]
        params = {
            "encoder": enc_params,
            "decoder": dec_params,
            "vq": vq_vars.get("params", {}),
        }
        mutable = {"vq": {k: v for k, v in vq_vars.items() if k != "params"}}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable=mutable,
            opt_state={"model": self.optimizer.init(params)},
        )

    # -- forward ------------------------------------------------------------
    def _apply_vq(self, params_vq, mutable_vq, latents, train):
        variables = {"params": params_vq, **mutable_vq}
        if train and mutable_vq:
            (q, vq_loss, ppl), updated = self.vq.apply(
                variables, latents, train=True, mutable=list(mutable_vq)
            )
            return (q, vq_loss, ppl), dict(updated)
        return self.vq.apply(variables, latents, train=train), mutable_vq

    def _loss(
        self, params, mutable, x01: jax.Array, train: bool
    ) -> Tuple[jax.Array, Tuple[Metrics, Dict]]:
        x = self.to_model_space(x01)
        latents = self.encoder.apply({"params": params["encoder"]}, x)
        (q, vq_loss, perplexity), new_mutable_vq = self._apply_vq(
            params["vq"], mutable["vq"], latents, train
        )
        x_hat = self.decoder.apply({"params": params["decoder"]}, q)
        recon_loss = jnp.mean((x_hat - x) ** 2)
        loss = (
            self.loss_weights["recon_loss"] * recon_loss
            + self.loss_weights["vq_loss"] * vq_loss
        )
        metrics = {
            "loss": loss,
            "recon_loss": recon_loss,
            "vq_loss": vq_loss,
            "perplexity": perplexity,
        }
        return loss, (metrics, {"vq": new_mutable_vq})

    # -- steps ----------------------------------------------------------------
    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        aug_rng = jax.random.fold_in(rng, state.step)
        x01 = prepare_batch(batch, aug_rng, train=True)["image"]
        grads, (metrics, new_mutable) = jax.grad(
            lambda p: self._loss(p, state.mutable, x01, True), has_aux=True
        )(state.params)
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state["model"], state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            mutable=new_mutable,
            opt_state={"model": new_opt},
        )
        return new_state, self.prefix_metrics(metrics, "train")

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        x01 = prepare_batch(batch, train=False)["image"]
        _, (metrics, _) = self._loss(state.params, state.mutable, x01, False)
        return self.prefix_metrics(metrics, "val")

    def reconstruct(self, state: TrainState, batch: Batch) -> jax.Array:
        x01 = prepare_batch(batch, train=False)["image"]
        x = self.to_model_space(x01)
        latents = self.encoder.apply({"params": state.params["encoder"]}, x)
        (q, _, _), _ = self._apply_vq(state.params["vq"], state.mutable["vq"],
                                      latents, False)
        x_hat = self.decoder.apply({"params": state.params["decoder"]}, q)
        return self.to_image_space(x_hat)

    def sample(self, state: TrainState, rng: jax.Array, num_samples: int) -> jax.Array:
        """Decode uniformly random codebook indices (reference
        vqvae.py:229-256 ``random_sample``)."""
        indices = data_shard(jax.random.randint(
            rng,
            (num_samples, self.latent_hw, self.latent_hw),
            0,
            self.num_embeddings,
        ))
        codebook = self._codebook(state)
        q = codebook[indices]
        x_hat = self.decoder.apply({"params": state.params["decoder"]}, q)
        return self.to_image_space(x_hat)

    def _codebook(self, state: TrainState) -> jax.Array:
        if self.use_ema:
            return state.mutable["vq"]["codebook"]["embedding"]
        return state.params["vq"]["embedding"]

    def codebook_table(self, state: TrainState):
        """Codebook entries for table logging (reference vqvae.py:258-267)."""
        import numpy as np

        return np.asarray(self._codebook(state))
