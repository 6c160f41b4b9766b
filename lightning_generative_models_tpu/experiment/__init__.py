from lightning_generative_models_tpu.experiment.logger import (  # noqa: F401
    ExperimentLogger,
)
