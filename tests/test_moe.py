"""Mixture-of-Experts DiT (models/modules/moe.py) — beyond reference.

Semantics pinned:
- the Switch/GShard dense-einsum formulation is the dense MLP when e=1 and
  capacity covers all tokens (exact oracle — any dispatch/combine indexing
  error breaks it);
- the load-balancing aux loss is exactly 1.0 at perfect balance (e=1, or a
  uniform router) and is sown only into the mutable "intermediates"
  collection (samplers never see it);
- tokens over expert capacity are dropped: their MoE output is exactly zero
  (the residual skip carries them);
- DDPM(network='dit', num_experts=e) alternates MoE blocks ending on the
  last block, trains with train_moe_aux in the metrics, and under
  --strategy tp shards the expert dim over the model axis with exact
  update parity vs the single-device step (expert parallelism is a layout
  annotation, not math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lightning_generative_models_tpu.models.modules.moe import MoEMlp
from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.registry import load_model


def moe_args(**kw):
    args = {
        "img_size": 16, "img_channels": 1, "dim": 32, "network": "dit",
        "patch_size": 4, "depth": 2, "num_heads": 4, "use_bf16": False,
        "qkv_layout": "h3d", "lr": 1e-3, "ema_update_after_step": 0,
        "ema_update_every": 1, "diffusion_timesteps": 10,
        "num_experts": 4, "moe_every": 2,
    }
    args.update(kw)
    return args


def make_batch(bs=8):
    rs = np.random.RandomState(0)
    return {
        "image": rs.randint(0, 256, size=(bs, 16, 16, 1), dtype=np.uint8),
        "label": np.zeros(bs, np.int32),
    }


def test_single_expert_equals_dense_mlp(rng):
    import flax.linen as nn

    x = jax.random.normal(rng, (2, 16, 8))
    moe = MoEMlp(hidden=8, mlp_dim=32, num_experts=1, capacity_factor=1.0)
    params = moe.init(rng, x)["params"]
    y, col = moe.apply({"params": params}, x, mutable=["intermediates"])
    wi, bi = params["wi"][0], params["bi"][0]
    wo, bo = params["wo"][0], params["bo"][0]
    dense = nn.gelu(x @ wi + bi, approximate=True) @ wo + bo
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense), atol=1e-5)
    # Aux loss is exactly 1 at perfect balance.
    aux = jax.tree_util.tree_leaves(col)[0]
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_aux_loss_not_sown_without_mutable(rng):
    x = jax.random.normal(rng, (2, 16, 8))
    moe = MoEMlp(hidden=8, mlp_dim=32, num_experts=4)
    params = moe.init(rng, x)["params"]
    y = moe.apply({"params": params}, x)  # no mutable: plain output
    assert y.shape == x.shape


def test_capacity_drops_overflow_tokens(rng):
    """cap=1 with every token routed to expert 0: exactly one token per
    batch row survives; all others contribute exactly zero."""
    x = jax.random.normal(rng, (2, 16, 8))
    moe = MoEMlp(hidden=8, mlp_dim=32, num_experts=4, capacity_factor=0.25)
    params = dict(moe.init(rng, x)["params"])
    params["router"] = {
        "kernel": jnp.zeros_like(params["router"]["kernel"]),
        "bias": jnp.zeros(4).at[0].set(10.0),
    }
    y, _ = moe.apply({"params": params}, x, mutable=["intermediates"])
    nonzero = np.count_nonzero(np.abs(np.asarray(y)).sum(-1) > 0, axis=1)
    np.testing.assert_array_equal(nonzero, [1, 1])


def test_moe_blocks_alternate_ending_on_last(rng):
    m = load_model({"name": "DDPM", "args": moe_args(depth=3)})
    params = jax.jit(m.init_state)(rng).params["model"]
    # depth 3, moe_every 2 -> MoE at blocks 0 and 2 (last always MoE).
    assert "moe" in params["block_0"] and "fc1" not in params["block_0"]
    assert "fc1" in params["block_1"] and "moe" not in params["block_1"]
    assert "moe" in params["block_2"]
    assert params["block_2"]["moe"]["wi"].shape == (4, 32, 128)


def test_moe_train_step_and_metrics(rng):
    m = load_model({"name": "DDPM", "args": moe_args()})
    state = m.init_state(rng)
    step = jax.jit(m.train_step, donate_argnums=0)
    state, mets = step(state, jax.device_put(make_batch()), rng)
    assert "train_moe_aux" in mets
    assert np.isfinite(float(mets["train_loss"]))
    # Balanced-ish random router: aux lives near 1, and never below it
    # (Cauchy-Schwarz: e * sum f_e p_e >= (sum sqrt(f p))^2 ~ 1 at balance).
    assert 0.9 < float(mets["train_moe_aux"]) < 4.0
    # Router gradient actually flowed (the aux term + combine weights).
    assert int(jax.device_get(state.step)) == 1


def test_moe_unet_rejected():
    with pytest.raises(ValueError, match="DiT backbone"):
        load_model({"name": "DDPM", "args": moe_args(
            network="unet", qkv_layout="s3hd", dim=8, dim_mults=[1, 2])})


def test_expert_parallel_matches_single_device(rng):
    """dp2 x tp4: expert-sharded update == single-device update, and the
    expert leaves land P(model, ...)."""
    m = load_model({"name": "DDPM", "args": moe_args()})
    batch = make_batch()
    step = jax.jit(m.train_step, donate_argnums=0)

    s1 = m.init_state(rng)
    s1, m1 = step(s1, jax.device_put(batch), rng)
    s1, m1b = step(s1, jax.device_put(batch), jax.random.fold_in(rng, 1))

    mesh = mesh_lib.create_mesh(
        axis_names=(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS), shape=(2, 4)
    )
    s_ep = mesh_lib.shard_state(m.init_state(rng), mesh, tp=True)
    moe_blk = s_ep.params["model"]["block_1"]
    assert moe_blk["moe"]["wi"].sharding.spec == P("model", None, None)
    assert moe_blk["moe"]["bi"].sharding.spec == P("model", None)
    assert moe_blk["moe"]["router"]["kernel"].sharding.is_fully_replicated
    b_ep = mesh_lib.shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s_ep, t1 = step(s_ep, b_ep, rng)
        s_ep, t1b = step(s_ep, b_ep, jax.random.fold_in(rng, 1))

    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(t1["train_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1b["train_moe_aux"]),
                               float(t1b["train_moe_aux"]), rtol=1e-5)
    for (path, a), (_, c) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_ep.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-6,
            err_msg=f"param diverged under expert parallelism: {path}",
        )
    # Sharding survives the donated step (trailing Nones are normalized
    # away by PartitionSpec, so compare the trimmed form).
    assert (
        s_ep.params["model"]["block_1"]["moe"]["wi"].sharding.spec
        == P("model")
    )


def test_trainer_ep_validation(tmp_path):
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    m = load_model({"name": "DDPM", "args": moe_args(num_experts=6)})
    dm = DataModule(name="MNIST", img_size=16, img_channels=1,
                    batch_size=8, synthetic_size=32)
    with pytest.raises(ValueError, match="num_experts"):
        Trainer(m, dm, tmp_path / "x", strategy="tp", tp_size=4)
