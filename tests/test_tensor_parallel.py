"""Tensor parallelism (--strategy tp): Megatron sharding for DiT backbones.

Beyond reference (the reference's only strategy is DDP data parallelism,
utils/lightning_utils.py:23-56). Semantics pinned here:

- the "h3d" packed-qkv layout is the same math as "s3hd" under the column
  permutation that regroups (3, heads, d) -> (heads, 3, d) — verified at the
  op level AND at the model level (permuted checkpoints agree exactly);
- parallel/mesh.py:tp_sharding shards qkv/fc1 column-parallel, proj/fc2
  row-parallel, replicates everything else, and raises on indivisible dims;
- a dp2 x tp4 sharded DiT train step computes the same loss and the same
  parameter update as the single-device step (GSPMD inserts the 2 psums per
  block; the math must not change);
- TP sharding survives the donated train step (no silent re-replication);
- Trainer validation fails loudly for non-DiT models, the s3hd layout, and
  head counts not divisible by the model axis; a real 2-step Trainer.fit
  runs end-to-end under strategy="tp".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lightning_generative_models_tpu.ops.attention import (
    _einsum_attention_qkv,
    fused_attention_qkv,
)
from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.registry import load_model

HEADS, D = 4, 8
HD = HEADS * D


def h3d_permutation(heads: int, d: int) -> np.ndarray:
    """Column index map: h3d column j reads s3hd column perm[j]."""
    hd = heads * d
    perm = np.zeros(3 * hd, np.int64)
    for h in range(heads):
        for s in range(3):
            for dd in range(d):
                perm[h * 3 * d + s * d + dd] = s * hd + h * d + dd
    return perm


def tiny_dit_args(**kw):
    args = {
        "img_size": 16, "img_channels": 1, "dim": 4 * HEADS * 2,  # hidden 32
        "network": "dit", "patch_size": 4, "depth": 2, "num_heads": HEADS,
        "use_bf16": False, "qkv_layout": "h3d", "lr": 1e-3,
        "ema_update_after_step": 0, "ema_update_every": 1,
        "diffusion_timesteps": 10,
    }
    args.update(kw)
    return args


def make_batch(bs=8):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 16, 16, 1), dtype=np.uint8),
        "label": np.zeros(bs, np.int32),
    }


def test_h3d_equals_s3hd_op_level(rng):
    qkv = jax.random.normal(rng, (2, 16, 3 * HD))
    perm = h3d_permutation(HEADS, D)
    out_s = fused_attention_qkv(qkv, HEADS, "s3hd")
    out_h = fused_attention_qkv(qkv[..., perm], HEADS, "h3d")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_h),
                               atol=1e-6)
    # And against the einsum reference directly for both layouts.
    np.testing.assert_allclose(
        np.asarray(_einsum_attention_qkv(qkv, HEADS, "s3hd")),
        np.asarray(_einsum_attention_qkv(qkv[..., perm], HEADS, "h3d")),
        atol=1e-6,
    )


def test_h3d_equals_s3hd_model_level(rng):
    """Permuting a s3hd checkpoint's qkv columns into h3d order must give a
    bit-matching forward — the layout is a column relabeling, nothing else."""
    m_s = load_model({"name": "DDPM", "args": tiny_dit_args(qkv_layout="s3hd")})
    m_h = load_model({"name": "DDPM", "args": tiny_dit_args()})
    params = jax.jit(m_s.init_state)(rng).params["model"]
    perm = h3d_permutation(HEADS, D)

    def permute(p):
        p = jax.tree_util.tree_map(np.asarray, jax.device_get(p))
        for blk in ("block_0", "block_1"):
            p[blk]["qkv"]["kernel"] = p[blk]["qkv"]["kernel"][:, perm]
            p[blk]["qkv"]["bias"] = p[blk]["qkv"]["bias"][perm]
        return p

    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 1))
    t = jnp.asarray([1.0, 3.0])
    out_s = m_s.unet.apply({"params": params}, x, t)
    out_h = m_h.unet.apply({"params": permute(params)}, x, t)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_h),
                               atol=1e-6)


def test_unknown_layout_rejected(rng):
    with pytest.raises(ValueError, match="layout"):
        fused_attention_qkv(jnp.zeros((1, 8, 3 * HD)), HEADS, "hd3")
    with pytest.raises(ValueError, match="qkv_layout"):
        load_model({"name": "DDPM", "args": tiny_dit_args(
            network="unet", patch_size=2, qkv_layout="h3d", dim=8,
            dim_mults=[1, 2])})


def tp_mesh():
    return mesh_lib.create_mesh(
        axis_names=(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), shape=(2, 4)
    )


def test_tp_sharding_rules():
    mesh = tp_mesh()
    model = load_model({"name": "DDPM", "args": tiny_dit_args()})
    state = model.init_state(jax.random.PRNGKey(0))
    sharded = mesh_lib.shard_state(state, mesh, tp=True)
    p = sharded.params["model"]["block_0"]

    def spec(leaf):
        return leaf.sharding.spec

    assert spec(p["qkv"]["kernel"]) == P(None, "model")
    assert spec(p["qkv"]["bias"]) == P("model")
    assert spec(p["fc1"]["kernel"]) == P(None, "model")
    assert spec(p["fc1"]["bias"]) == P("model")
    assert spec(p["proj"]["kernel"]) == P("model", None)
    assert spec(p["fc2"]["kernel"]) == P("model", None)
    # Row-parallel biases and everything else replicated.
    assert p["proj"]["bias"].sharding.is_fully_replicated
    assert p["adaLN_modulation"]["kernel"].sharding.is_fully_replicated
    assert sharded.params["model"]["patch_embed"]["kernel"].sharding.is_fully_replicated
    # The optax moments mirror the param sharding (same path suffixes).
    mu_leaf = jax.tree_util.tree_leaves_with_path(sharded.opt_state)
    qkv_mu = [
        leaf for path, leaf in mu_leaf
        if "qkv" in str(path) and "kernel" in str(path)
    ]
    assert qkv_mu and all(l.sharding.spec == P(None, "model") for l in qkv_mu)


def test_tp_sharding_indivisible_raises():
    mesh = tp_mesh()  # model axis = 4

    class Leaf:
        shape = (8, 9)  # 9 % 4 != 0

    path = (jax.tree_util.DictKey("qkv"), jax.tree_util.DictKey("kernel"))
    with pytest.raises(ValueError, match="not divisible"):
        mesh_lib.tp_sharding(path, Leaf(), mesh)


def test_tp_train_step_matches_single_device(rng):
    model = load_model({"name": "DDPM", "args": tiny_dit_args()})
    batch = make_batch()

    s1 = model.init_state(rng)
    step = jax.jit(model.train_step, donate_argnums=0)
    s1, m1 = step(s1, jax.device_put(batch), rng)
    s1, m1b = step(s1, jax.device_put(batch), jax.random.fold_in(rng, 1))

    mesh = tp_mesh()
    s_tp = mesh_lib.shard_state(model.init_state(rng), mesh, tp=True)
    b_tp = mesh_lib.shard_batch(batch, mesh)
    s_tp, t1 = step(s_tp, b_tp, rng)
    s_tp, t1b = step(s_tp, b_tp, jax.random.fold_in(rng, 1))

    np.testing.assert_allclose(float(m1["train_loss"]), float(t1["train_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1b["train_loss"]),
                               float(t1b["train_loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_tp.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"param diverged under tp: {path}",
        )
    # Sharding must survive the donated step — no silent re-replication.
    qkv_kernel = s_tp.params["model"]["block_0"]["qkv"]["kernel"]
    assert qkv_kernel.sharding.spec == P(None, "model")


def test_sp_train_step_matches_single_device(rng):
    """Megatron sequence parallelism (seq_parallel=true on the tp mesh) is a
    layout annotation, not math: losses and parameter updates must match the
    single-device step exactly as tp's do."""
    model = load_model({"name": "DDPM", "args": tiny_dit_args()})
    model_sp = load_model(
        {"name": "DDPM", "args": tiny_dit_args(seq_parallel=True)}
    )
    batch = make_batch()

    s1 = model.init_state(rng)
    step = jax.jit(model.train_step, donate_argnums=0)
    s1, m1 = step(s1, jax.device_put(batch), rng)
    s1, m1b = step(s1, jax.device_put(batch), jax.random.fold_in(rng, 1))

    mesh = tp_mesh()
    s_sp = mesh_lib.shard_state(model_sp.init_state(rng), mesh, tp=True)
    b_sp = mesh_lib.shard_batch(batch, mesh)
    step_sp = jax.jit(model_sp.train_step, donate_argnums=0)
    with jax.set_mesh(mesh):
        s_sp, t1 = step_sp(s_sp, b_sp, rng)
        s_sp, t1b = step_sp(s_sp, b_sp, jax.random.fold_in(rng, 1))

    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(t1["train_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1b["train_loss"]),
                               float(t1b["train_loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_sp.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"param diverged under tp+sp: {path}",
        )
    qkv_kernel = s_sp.params["model"]["block_0"]["qkv"]["kernel"]
    assert qkv_kernel.sharding.spec == P(None, "model")


def test_sp_restructures_collectives(rng):
    """The constraint must change the partitioned program: with sp the
    residual stream stays token-sharded and GSPMD inserts all-gathers at the
    matmul entries (zero in plain tp, where activations are replicated over
    the model axis). On TPU the paired all-reduce->reduce-scatter conversion
    then halves the LN-region traffic; on the CPU test backend that pass
    does not run, so the all-gather count is the observable."""
    mesh = tp_mesh()
    batch = make_batch()
    counts = {}
    for sp in (False, True):
        m = load_model(
            {"name": "DDPM", "args": tiny_dit_args(seq_parallel=sp)}
        )
        s = mesh_lib.shard_state(m.init_state(rng), mesh, tp=True)
        b = mesh_lib.shard_batch(batch, mesh)
        with jax.set_mesh(mesh):
            txt = (
                jax.jit(m.train_step, donate_argnums=0)
                .lower(s, b, rng).compile().as_text()
            )
        counts[sp] = (txt.count("all-gather"), txt.count("all-reduce"))
    assert counts[False][0] == 0, counts
    assert counts[True][0] > 0, counts
    assert counts[True][1] > 0, counts


def test_sp_is_noop_off_mesh(rng):
    """seq_parallel checkpoints must sample/serve on a single chip: without
    an ambient (data, model) mesh the constraints vanish and the forward is
    bit-identical to the plain model's."""
    from lightning_generative_models_tpu.models.diffusion.dit import seq_shard

    m = load_model({"name": "DDPM", "args": tiny_dit_args()})
    m_sp = load_model(
        {"name": "DDPM", "args": tiny_dit_args(seq_parallel=True)}
    )
    params = jax.jit(m.init_state)(rng).params["model"]
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 1))
    t = jnp.asarray([1.0, 3.0])
    out = m.unet.apply({"params": params}, x, t)
    out_sp = m_sp.unet.apply({"params": params}, x, t)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_sp))

    # The helper itself: sharded under the mesh, replicated off it.
    mesh = tp_mesh()
    with jax.set_mesh(mesh):
        y = jax.jit(lambda v: seq_shard(v * 1.0))(jnp.ones((8, 16, 32)))
    assert y.sharding.spec == P("data", "model")
    y2 = jax.jit(lambda v: seq_shard(v * 1.0))(jnp.ones((8, 16, 32)))
    assert y2.sharding.is_fully_replicated


def test_trainer_sp_validation_and_fit(tmp_path, caplog):
    import logging

    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    def dm(img=16):
        return DataModule(name="MNIST", img_size=img, img_channels=1,
                          batch_size=8, synthetic_size=32)

    # Token count must divide the model axis: img 12 / patch 4 -> 9 tokens.
    m_bad = load_model({"name": "DDPM", "args": tiny_dit_args(
        img_size=12, seq_parallel=True)})
    with pytest.raises(ValueError, match="tokens"):
        Trainer(m_bad, dm(12), tmp_path / "bad", strategy="tp", tp_size=4)

    # seq_parallel without --strategy tp: loud warning, not an error (the
    # constraints are mechanical no-ops off the tp mesh).
    m_sp = load_model({"name": "DDPM", "args": tiny_dit_args(
        seq_parallel=True)})
    with caplog.at_level(logging.WARNING):
        Trainer(m_sp, dm(), tmp_path / "warn")
    assert any("seq_parallel" in r.message for r in caplog.records)

    # seq_parallel on the UNet backbone rejected at model construction.
    with pytest.raises(ValueError, match="DiT backbone"):
        load_model({"name": "DDPM", "args": tiny_dit_args(
            network="unet", patch_size=2, qkv_layout="s3hd", dim=8,
            dim_mults=[1, 2], seq_parallel=True)})

    # And a real 2-step fit on the dp2 x tp4 mesh with sp active.
    t = Trainer(
        m_sp, dm(), tmp_path / "fit", max_steps=2, strategy="tp", tp_size=4,
        log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    state = t.fit()
    assert int(jax.device_get(state.step)) == 2
    assert (
        state.params["model"]["block_0"]["qkv"]["kernel"].sharding.spec
        == P(None, "model")
    )


def test_trainer_tp_validation_and_fit(tmp_path):
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    def dm():
        return DataModule(name="MNIST", img_size=16, img_channels=1,
                          batch_size=8, synthetic_size=32)

    # Non-DiT model rejected.
    vae = load_model({"name": "VAE", "args": {
        "img_channels": 1, "img_size": 28, "latent_dim": 8}})
    with pytest.raises(ValueError, match="DiT backbone"):
        Trainer(vae, dm(), tmp_path / "x", strategy="tp", tp_size=4)

    # s3hd layout rejected with a pointer at the fix.
    m_s3hd = load_model({"name": "DDPM", "args": tiny_dit_args(
        qkv_layout="s3hd")})
    with pytest.raises(ValueError, match="h3d"):
        Trainer(m_s3hd, dm(), tmp_path / "y", strategy="tp", tp_size=4)

    # Head count must divide the model axis.
    m = load_model({"name": "DDPM", "args": tiny_dit_args()})
    with pytest.raises(ValueError, match="heads"):
        Trainer(m, dm(), tmp_path / "z", strategy="tp", tp_size=8)

    # And a real 2-step fit on the dp2 x tp4 mesh.
    t = Trainer(
        m, dm(), tmp_path / "fit", max_steps=2, strategy="tp", tp_size=4,
        log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99,
    )
    state = t.fit()
    assert int(jax.device_get(state.step)) == 2
    assert (
        state.params["model"]["block_0"]["qkv"]["kernel"].sharding.spec
        == P(None, "model")
    )
