"""One process of a REAL 2-process jax.distributed run (CPU backend).

Launched by tests/test_distributed.py::test_two_process_matches_single.
Each process: coordinator handshake via jax.distributed.initialize, gloo CPU
collectives, per-process feeding through shard_batch's
``make_array_from_callback`` path (each host materialises only its
addressable shards' slices of the identical seeded global batch — the exact
multi-host path in parallel/mesh.py shard_batch/replicate), then two jitted
train steps on the global batch plus a validation-style sampling pass.
Process 0 writes a JSON of scalars for the parent to compare against a
single-process run of :func:`run_mode`.

Modes:
- ``vae``       — data-parallel VAE (the original r3 leg), now also sampling
  under the ambient mesh: the sampler output is sharded over the data axis,
  which SPANS the two processes, so fetching it exercises
  ``parallel.mesh.to_host``'s process_allgather path (ADVICE r3: a plain
  device_get raises "spans non-addressable devices" here).
- ``dit_tp``    — tiny DiT on a dp1 x tp2 mesh (the model axis spans the two
  processes): Megatron tp sharding over real cross-process collectives, the
  strongest offline proxy for the tp path on a pod (VERDICT r3 #7).

Usage: python _multihost_worker.py <coordinator> <pid> <nprocs> <out_json> [mode]
"""

import json
import sys


def _tiny_dit_model():
    from lightning_generative_models_tpu.registry import load_model

    return load_model({"name": "DDPM", "args": {
        "img_size": 16, "img_channels": 1, "dim": 32, "network": "dit",
        "patch_size": 4, "depth": 2, "num_heads": 4, "use_bf16": False,
        "qkv_layout": "h3d", "lr": 1e-3, "ema_update_after_step": 0,
        "ema_update_every": 1, "diffusion_timesteps": 10,
        "sampling_timesteps": 2,
    }})


def run_mode(mode: str = "vae"):
    """Two deterministic train steps + a sampling pass; returns a dict of
    scalars. Backend/distributed must be initialized. Works identically in
    a 2-process run and single-process (the parity reference)."""
    import jax
    import numpy as np

    from lightning_generative_models_tpu.parallel import mesh as mesh_lib
    from lightning_generative_models_tpu.registry import load_model

    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)

    if mode == "vae":
        model = load_model({"name": "VAE", "args": {
            "img_channels": 1, "img_size": 28, "latent_dim": 8, "lr": 1e-3,
        }})
        mesh = mesh_lib.create_mesh()
        batch = {
            "image": rs.randint(0, 256, size=(16, 28, 28, 1), dtype=np.uint8),
            "label": rs.randint(0, 10, size=16).astype(np.int32),
        }
        state = jax.jit(model.init_state)(rng)
        state = mesh_lib.replicate(state, mesh)
    elif mode == "dit_tp":
        model = _tiny_dit_model()
        # dp1 x tp2: the model axis spans both processes (1 device each in
        # the worker run; the first 2 of the parent's devices single-process).
        mesh = mesh_lib.create_mesh(
            devices=jax.devices()[:2],
            axis_names=(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS),
            shape=(1, 2),
        )
        batch = {
            "image": rs.randint(0, 256, size=(8, 16, 16, 1), dtype=np.uint8),
            "label": np.zeros(8, np.int32),
        }
        state = mesh_lib.shard_state(
            jax.jit(model.init_state)(rng), mesh, tp=True)
    else:
        raise ValueError(f"unknown mode {mode}")

    batch_dev = mesh_lib.shard_batch(batch, mesh)
    step_fn = jax.jit(model.train_step, donate_argnums=0)
    metrics = None
    with jax.set_mesh(mesh):
        for i in range(2):
            state, metrics = step_fn(
                state, batch_dev, jax.random.fold_in(rng, i))
        # Validation-style sampling: output sharded over the data axis
        # (multi-host: spans non-addressable devices -> to_host gathers).
        images = jax.jit(model.sample, static_argnums=2)(
            state, jax.random.fold_in(rng, 7), 8)

    host_images = mesh_lib.to_host(images)
    loss = float(jax.device_get(metrics["train_loss"]))
    param_abs_sum = float(sum(
        np.abs(mesh_lib.to_host(x).astype(np.float64)).sum()
        for x in jax.tree_util.tree_leaves(state.params)
    ))
    return {
        "loss": loss,
        "param_abs_sum": param_abs_sum,
        "sample_abs_sum": float(np.abs(host_images.astype(np.float64)).sum()),
        "sample_shape": list(host_images.shape),
    }


def main() -> None:
    coord, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "vae"
    import jax

    # Must precede any backend-initializing call (sitecustomize may have
    # imported jax already, but not initialized a backend).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_threefry_partitionable", True)
    jax.distributed.initialize(coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    result = run_mode(mode)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    # Clean shutdown so the coordinator releases the barrier.
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
