from lightning_generative_models_tpu.data.datamodule import DataModule  # noqa: F401
