"""lightning-generative-models-tpu: a TPU-native generative modeling framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
seungjunlee96/lightning-generative-models (reference: /root/reference), designed
TPU-first:

- All compute paths are jit-compiled XLA programs with static shapes.
- Data layout is NHWC (TPU-native), compute dtype is configurable bf16/f32.
- Multi-chip scaling goes through ``jax.sharding.Mesh`` + NamedSharding data
  parallelism (XLA inserts ICI collectives), not a translated DDP/NCCL layer.
- Hot inner ops (attention, VQ codebook lookup, input normalization) have
  Pallas TPU kernels under ``ops/``.

Public surface mirrors the reference framework: the same ``configs/*.json``
schema drives ``train.py``, a registry maps model names to implementations, and
every reference model family (GAN, VAE, diffusion, autoencoder, autoregressive,
flow) is provided.
"""

__version__ = "0.1.0"

from lightning_generative_models_tpu.config import load_config  # noqa: F401
from lightning_generative_models_tpu.registry import load_model  # noqa: F401
