from lightning_generative_models_tpu.metrics.generative import (  # noqa: F401
    FrechetInceptionDistance,
    InceptionScore,
    KernelInceptionDistance,
)
