from lightning_generative_models_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
    local_batch_size,
)
