"""Model registry: config name -> model factory.

The reference resolves model names by attempting an import of
``models.generative.<family>.<name.lower()>`` across six families and
swallowing ImportErrors (utils/loader.py:5-44) — which silently masked broken
models. Here the registry is an explicit table: every supported name maps to a
lazily-imported factory, and unknown names raise immediately with the list of
valid choices.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Tuple

# name -> (module path, class name). Lazy import keeps CLI startup fast and
# lets individual model files have heavy deps without taxing everyone.
_REGISTRY: Dict[str, Tuple[str, str]] = {
    # GAN family (reference: models/generative/gan/)
    "GAN": ("lightning_generative_models_tpu.models.gan.gan", "GAN"),
    "CGAN": ("lightning_generative_models_tpu.models.gan.cgan", "CGAN"),
    "InfoGAN": ("lightning_generative_models_tpu.models.gan.infogan", "InfoGAN"),
    "DCGAN": ("lightning_generative_models_tpu.models.gan.dcgan", "DCGAN"),
    "LSGAN": ("lightning_generative_models_tpu.models.gan.lsgan", "LSGAN"),
    "WGAN": ("lightning_generative_models_tpu.models.gan.wgan", "WGAN"),
    "R1GAN": ("lightning_generative_models_tpu.models.gan.r1gan", "R1GAN"),
    "CycleGAN": ("lightning_generative_models_tpu.models.gan.cyclegan", "CycleGAN"),
    "SGAN": ("lightning_generative_models_tpu.models.gan.sgan", "SGAN"),
    "ACGAN": ("lightning_generative_models_tpu.models.gan.acgan", "ACGAN"),
    "BEGAN": ("lightning_generative_models_tpu.models.gan.began", "BEGAN"),
    # VAE family (reference: models/generative/vae/)
    "VAE": ("lightning_generative_models_tpu.models.vae.vae", "VAE"),
    "VQVAE": ("lightning_generative_models_tpu.models.vae.vqvae", "VQVAE"),
    "VQGAN": ("lightning_generative_models_tpu.models.vae.vqgan", "VQGAN"),
    # Diffusion family (reference: models/generative/diffusion/ddpm.py)
    "DDPM": ("lightning_generative_models_tpu.models.diffusion.ddpm", "DDPM"),
    # Beyond reference: DDPM in a frozen VQ autoencoder's latent space.
    "LatentDiffusion": (
        "lightning_generative_models_tpu.models.diffusion.latent_diffusion",
        "LatentDiffusion",
    ),
    # Beyond reference: rectified-flow / flow-matching generative ODE,
    # pixel-space and in a frozen VQ autoencoder's latent space.
    "FlowMatching": (
        "lightning_generative_models_tpu.models.diffusion.flow_matching",
        "FlowMatching",
    ),
    "LatentFlowMatching": (
        "lightning_generative_models_tpu.models.diffusion.flow_matching",
        "LatentFlowMatching",
    ),
    # Beyond reference: the Karras et al. 2022 (arXiv:2206.00364) EDM
    # formulation — preconditioned denoiser, log-normal sigma training,
    # rho-grid Heun sampler with optional stochastic churn.
    "EDM": ("lightning_generative_models_tpu.models.diffusion.edm", "EDM"),
    "LatentEDM": (
        "lightning_generative_models_tpu.models.diffusion.edm",
        "LatentEDM",
    ),
    # Beyond reference: consistency model trained with improved consistency
    # training (arXiv:2303.01469 + arXiv:2310.14189) — 1-2 network evals
    # per sample, the low-latency serving recipe.
    "ConsistencyModel": (
        "lightning_generative_models_tpu.models.diffusion.consistency",
        "ConsistencyModel",
    ),
    # Autoencoder family (reference: models/generative/autoencoder/)
    "DAE": ("lightning_generative_models_tpu.models.autoencoder.dae", "DAE"),
    "UNet": ("lightning_generative_models_tpu.models.autoencoder.unet", "UNetAE"),
    # Autoregressive family (reference: models/generative/autoregressive/)
    "PixelCNN": (
        "lightning_generative_models_tpu.models.autoregressive.pixelcnn",
        "PixelCNN",
    ),
    # Flow family (reference: models/generative/flow/nice.py)
    "NICE": ("lightning_generative_models_tpu.models.flow.nice", "NICE"),
    # Beyond reference: Glow (arXiv:1807.03039) — multi-scale convolutional
    # flow with invertible 1x1 convs, exact likelihood and exact inverse.
    "Glow": ("lightning_generative_models_tpu.models.flow.glow", "Glow"),
}

# Case-insensitive lookup, mirroring the reference's name.lower() resolution.
_LOWER = {k.lower(): k for k in _REGISTRY}


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def resolve_model_class(name: str) -> Any:
    key = _LOWER.get(name.lower())
    if key is None:
        raise ValueError(
            f"Unknown model '{name}'. Available: {', '.join(available_models())}"
        )
    module_path, class_name = _REGISTRY[key]
    module = importlib.import_module(module_path)
    return getattr(module, class_name)


def load_model(model_config: Dict[str, Any]) -> Any:
    """Instantiate a model from the config's model section.

    Parity with reference ``load_model`` (utils/loader.py:15-44):
    ``{"name": ..., "args": {...}}`` -> ``ModelClass(**args)``.
    """
    cls = resolve_model_class(model_config["name"])
    return cls(**model_config.get("args", {}))
