"""Distributed semantics on the 8-virtual-device CPU mesh.

SURVEY §4: mesh construction, batch sharding, global-batch metric reduction,
and parity between single-device and sharded execution — the properties the
reference delegated to Lightning/DDP (sync_dist, per-process batch division).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.registry import load_model


def vae():
    return load_model(
        {
            "name": "VAE",
            "args": {"img_channels": 1, "img_size": 28, "latent_dim": 8, "lr": 1e-3},
        }
    )


def batch(bs=16):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 28, 28, 1), dtype=np.uint8),
        "label": rs.randint(0, 10, size=bs).astype(np.int32),
    }


def test_sharded_loss_matches_single_device(rng):
    """The global-batch loss must be identical whether the batch lives on one
    device or is sharded across 8 (the jitted mean IS the sync_dist reduce)."""
    model = vae()
    state = model.init_state(rng)
    b = batch()

    single = jax.jit(model.eval_step)(state, jax.device_put(b), rng)

    mesh = mesh_lib.create_mesh()
    state_r = mesh_lib.replicate(state, mesh)
    b_sharded = mesh_lib.shard_batch(b, mesh)
    sharded = jax.jit(model.eval_step)(state_r, b_sharded, rng)

    for key in single:
        np.testing.assert_allclose(
            float(single[key]), float(sharded[key]), rtol=1e-5,
            err_msg=f"metric {key} diverged between single and sharded",
        )


def test_sharded_train_step_keeps_params_replicated(rng):
    model = vae()
    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(model.init_state(rng), mesh)
    b = mesh_lib.shard_batch(batch(), mesh)
    step = jax.jit(model.train_step, donate_argnums=0)
    state, metrics = step(state, b, rng)
    assert np.isfinite(float(metrics["train_loss"]))
    # Updated params must remain fully replicated (no silent divergence).
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_train_matches_single_device_updates(rng):
    """One sharded train step == one single-device train step (same global
    batch, same rng) — data parallelism must not change the math."""
    model = vae()
    b = batch()

    s1 = model.init_state(rng)
    s1, m1 = jax.jit(model.train_step)(s1, jax.device_put(b), rng)

    mesh = mesh_lib.create_mesh()
    s8 = mesh_lib.replicate(model.init_state(rng), mesh)
    s8, m8 = jax.jit(model.train_step)(s8, mesh_lib.shard_batch(b, mesh), rng)

    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m8["train_loss"]), rtol=1e-5
    )
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)
    ):
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l8), rtol=1e-4, atol=1e-6
        )


def test_fsdp_sharding_rule():
    """The FSDP rule shards the largest divisible dim and replicates small
    or indivisible leaves — and is a pure function of the shape (restore
    re-derives identical shardings)."""
    mesh = mesh_lib.create_mesh()  # 8 devices, axis "data"
    big = jnp.zeros((784, 512))
    s = mesh_lib.fsdp_sharding(big, mesh, min_size=64)
    assert s.spec == jax.sharding.PartitionSpec("data", None)  # 784 > 512

    tall = jnp.zeros((3, 3, 64, 128))
    s = mesh_lib.fsdp_sharding(tall, mesh, min_size=64)
    assert s.spec == jax.sharding.PartitionSpec(None, None, None, "data")

    # Small leaves (biases) and indivisible shapes stay replicated.
    assert mesh_lib.fsdp_sharding(jnp.zeros((63,)), mesh, min_size=64).spec \
        == jax.sharding.PartitionSpec()
    assert mesh_lib.fsdp_sharding(
        jnp.zeros((9, 9)), mesh, min_size=4
    ).spec == jax.sharding.PartitionSpec()
    assert mesh_lib.fsdp_sharding(jnp.zeros(()), mesh).spec \
        == jax.sharding.PartitionSpec()


def test_fsdp_update_matches_replicated(rng):
    """One FSDP-sharded train step == one replicated train step (same batch,
    same rng): parameter sharding is a layout annotation, not a math change.
    Also: the donated step must RETURN state with the sharding intact (GSPMD
    propagation), or every step would silently re-gather to replicated."""
    model = vae()
    b = batch()
    mesh = mesh_lib.create_mesh()

    s_rep = mesh_lib.shard_state(model.init_state(rng), mesh, fsdp=False)
    s_fsdp = mesh_lib.shard_state(
        model.init_state(rng), mesh, fsdp=True, min_size=64
    )
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(s_fsdp.params)
        if not leaf.sharding.is_fully_replicated
    )
    assert n_sharded >= 10, "min_size=64 must actually shard the VAE weights"
    # Optimizer moments follow the same rule (that's where FSDP memory wins).
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(s_fsdp.opt_state)
    )

    bs = mesh_lib.shard_batch(b, mesh)
    step = jax.jit(model.train_step, donate_argnums=0)
    s_rep, m_rep = step(s_rep, bs, rng)
    s_fsdp, m_fsdp = step(s_fsdp, bs, rng)

    np.testing.assert_allclose(
        float(m_rep["train_loss"]), float(m_fsdp["train_loss"]), rtol=1e-6
    )
    assert n_sharded == sum(
        1 for leaf in jax.tree_util.tree_leaves(s_fsdp.params)
        if not leaf.sharding.is_fully_replicated
    ), "updated params lost their FSDP sharding"
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(s_rep.params),
        jax.tree_util.tree_leaves(s_fsdp.params),
    ):
        # atol 1e-5: reduce-scatter vs all-reduce grad reduction order.
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_sharded_train_step_has_no_involuntary_remat():
    """The FSDP-sharded DDPM/UNet train step must compile WITHOUT GSPMD
    "Involuntary full rematerialization" warnings (VERDICT r3 #2: the r3
    MULTICHIP tail showed 7 on the UNet attention transpose/pad and the
    Downsample reshape — a resharding perf cliff on real hardware).

    Root cause: FSDP channel-shards the qkv/out-projection conv kernels and
    the sharding propagated into the attention intermediates. The fix is the
    data_shard pins in models/modules/attention.py + unet.py Downsample
    (active under the ambient mesh, which the Trainer enters for every
    strategy). GSPMD emits the warning via C++ logging on fd 2, so stderr
    is captured at the file-descriptor level around the compile."""
    import os
    import tempfile

    from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM

    model = DDPM(img_channels=3, img_size=16, dim=8, diffusion_timesteps=10,
                 use_bf16=False)
    rng = jax.random.PRNGKey(0)
    mesh = mesh_lib.create_mesh()
    # Eager init (jit-compiling init_state takes minutes on XLA-CPU and is
    # irrelevant to the partitioner behavior under test).
    state = mesh_lib.shard_state(model.init_state(rng), mesh, fsdp=True,
                                 min_size=8)
    b = mesh_lib.shard_batch({
        "image": np.zeros((16, 16, 16, 3), np.uint8),
        "label": np.zeros((16,), np.int32),
    }, mesh)

    fd = os.dup(2)
    with tempfile.TemporaryFile(mode="w+b") as f:
        os.dup2(f.fileno(), 2)
        try:
            with jax.set_mesh(mesh):
                jax.jit(model.train_step, donate_argnums=0).lower(
                    state, b, rng).compile()
        finally:
            import sys as _sys

            _sys.stderr.flush()
            os.dup2(fd, 2)
            os.close(fd)
        f.seek(0)
        err = f.read().decode(errors="replace")
    bad = [l for l in err.splitlines()
           if "Involuntary full rematerialization" in l]
    assert not bad, "GSPMD resharding cliffs reappeared:\n" + "\n".join(
        l[:200] for l in bad)


def test_graft_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_mesh_shapes():
    mesh = mesh_lib.create_mesh(axis_names=("data", "model"), shape=(4, 2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_process_local_slice_tiles_global_batch():
    """Multi-host feeding correctness: the per-process slices must tile the
    global batch exactly, in order, with no overlap (reference analog:
    per-rank batch division, data/datamodule.py:33)."""
    import numpy as np

    from lightning_generative_models_tpu.parallel.mesh import process_local_slice

    x = np.arange(16 * 3 * 2).reshape(16, 3, 2)
    n = 4
    slices = [
        process_local_slice(x, 0, process_index=p, process_count=n)
        for p in range(n)
    ]
    assert all(s.shape == (4, 3, 2) for s in slices)
    np.testing.assert_array_equal(np.concatenate(slices), x)

    # Axis-1 stacked batches (unroll/scan-accum layout) slice on axis 1.
    y = np.arange(2 * 8 * 3).reshape(2, 8, 3)
    slices = [
        process_local_slice(y, 1, process_index=p, process_count=2)
        for p in range(2)
    ]
    np.testing.assert_array_equal(np.concatenate(slices, axis=1), y)

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        process_local_slice(x, 0, process_index=0, process_count=5)


@pytest.mark.parametrize("mode", ["vae", "dit_tp"])
def test_two_process_matches_single(tmp_path, mode):
    """REAL 2-process multi-host run (jax.distributed.initialize on CPU with
    gloo collectives): coordinator handshake, per-process feeding through
    shard_batch's make_array_from_callback path, two jitted train steps AND
    a validation-style sampling pass — losses, updates and samples must
    equal the single-process run.

    ``vae``: data-parallel; the sampler output is sharded over the data axis
    spanning both processes, so the fetch exercises to_host's
    process_allgather path (ADVICE r3: device_get raises there).
    ``dit_tp``: dp1 x tp2 — the Megatron model axis spans the two processes,
    the strongest offline proxy for tp on a real pod (VERDICT r3 #7)."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    out_json = tmp_path / "out.json"
    worker = Path(__file__).parent / "_multihost_worker.py"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    # One CPU device per process (conftest's 8-device flag would leak in).
    env["XLA_FLAGS"] = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in t
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), "2", str(out_json),
             mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            logs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-4000:]
    result = json.loads(out_json.read_text())

    from _multihost_worker import run_mode

    ref = run_mode(mode)  # this process: single-process multi-device mesh
    assert np.isclose(result["loss"], ref["loss"], rtol=1e-5, atol=1e-6), (
        result, ref,
    )
    assert np.isclose(
        result["param_abs_sum"], ref["param_abs_sum"], rtol=1e-5
    ), (result, ref)
    assert result["sample_shape"] == ref["sample_shape"]
    assert np.isclose(
        result["sample_abs_sum"], ref["sample_abs_sum"], rtol=1e-4
    ), (result, ref)
