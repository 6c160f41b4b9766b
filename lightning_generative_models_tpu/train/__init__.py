from lightning_generative_models_tpu.train.state import TrainState  # noqa: F401
from lightning_generative_models_tpu.train.trainer import Trainer  # noqa: F401
