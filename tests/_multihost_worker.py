"""One process of a REAL 2-process jax.distributed run (CPU backend).

Launched by tests/test_distributed.py::test_two_process_update_matches_single.
Each process: coordinator handshake via jax.distributed.initialize, gloo CPU
collectives, process-local feeding through process_local_slice +
make_array_from_process_local_data (the exact multi-host path in
parallel/mesh.py shard_batch/replicate), then two jitted train steps on the
global batch. Process 0 writes {loss, param_abs_sum} JSON for the parent to
compare against a single-process run of :func:`train_two_steps`.

Usage: python _multihost_worker.py <coordinator> <process_id> <num_processes> <out_json>
"""

import json
import sys


def train_two_steps():
    """Two deterministic VAE train steps on the default mesh; returns
    (loss, sum-of-|params|). Backend/distributed must be initialized."""
    import jax
    import numpy as np

    from lightning_generative_models_tpu.parallel import mesh as mesh_lib
    from lightning_generative_models_tpu.registry import load_model

    model = load_model(
        {
            "name": "VAE",
            "args": {"img_channels": 1, "img_size": 28, "latent_dim": 8,
                     "lr": 1e-3},
        }
    )
    rng = jax.random.PRNGKey(0)
    mesh = mesh_lib.create_mesh()

    state = jax.jit(model.init_state)(rng)
    state = mesh_lib.replicate(state, mesh)

    # Every host materializes the identical seeded global batch; shard_batch
    # slices this host's rows and assembles the global array.
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.randint(0, 256, size=(16, 28, 28, 1), dtype=np.uint8),
        "label": rs.randint(0, 10, size=16).astype(np.int32),
    }
    batch_dev = mesh_lib.shard_batch(batch, mesh)

    step_fn = jax.jit(model.train_step, donate_argnums=0)
    metrics = None
    for _ in range(2):
        state, metrics = step_fn(state, batch_dev, rng)

    loss = float(jax.device_get(metrics["train_loss"]))
    param_abs_sum = float(
        sum(
            np.abs(np.asarray(jax.device_get(x), dtype=np.float64)).sum()
            for x in jax.tree_util.tree_leaves(state.params)
        )
    )
    return loss, param_abs_sum


def main() -> None:
    coord, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    import jax

    # Must precede any backend-initializing call (sitecustomize may have
    # imported jax already, but not initialized a backend).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_threefry_partitionable", True)
    jax.distributed.initialize(coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    loss, param_abs_sum = train_two_steps()
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "param_abs_sum": param_abs_sum}, f)
    # Clean shutdown so the coordinator releases the barrier.
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
