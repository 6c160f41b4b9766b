"""Pre-rewrite LinearAttention checkpoint migration.

Round 2's fused-kernel rewrite flattened LinearAttention's parameters
(RMSNorm_0/Conv_0/mem_kv/Conv_1/RMSNorm_1 -> norm_g/qkv_kernel/mem_kv/
out_kernel/out_bias/out_norm_g). These tests prove the migration is a pure
reshape (old math == new module on migrated weights) and that restore
applies it automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.models.modules.attention import (
    _FLAT_KEYS,
    LinearAttention,
    has_pre_fused_linear_attention,
    migrate_pre_fused_linear_attention,
)


def _inverse_migrate(tree):
    """New flat layout -> round-1 conv layout (test helper)."""
    if isinstance(tree, dict):
        if set(tree) == _FLAT_KEYS:
            return {
                "RMSNorm_0": {"g": tree["norm_g"]},
                "Conv_0": {"kernel": tree["qkv_kernel"][None, None]},
                "mem_kv": tree["mem_kv"],
                "Conv_1": {
                    "kernel": tree["out_kernel"][None, None],
                    "bias": tree["out_bias"],
                },
                "RMSNorm_1": {"g": tree["out_norm_g"]},
            }
        return {k: _inverse_migrate(v) for k, v in tree.items()}
    return tree


def _old_forward(x, params, heads=4, dim_head=32):
    """Round-1 LinearAttention math, verbatim (git dcce6a1)."""
    b, h, w, c = x.shape
    n = h * w
    hidden = heads * dim_head

    def rmsnorm(y, g):
        y32 = y.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.sum(y32**2, axis=-1, keepdims=True) + 1e-12)
        return (y32 * r * g * (c**0.5)).astype(y.dtype)

    xn = rmsnorm(x, params["RMSNorm_0"]["g"])
    qkv = jnp.einsum("bhwc,co->bhwo", xn, params["Conv_0"]["kernel"][0, 0])
    qkv = qkv.reshape(b, n, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))
    mem = params["mem_kv"]
    mk, mv = (jnp.broadcast_to(mem[i], (b, *mem[i].shape)) for i in range(2))
    k = jnp.concatenate([mk, k], axis=-1)
    v = jnp.concatenate([mv, v], axis=-1)
    q = jax.nn.softmax(q, axis=-2) * (dim_head**-0.5)
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bhdn,bhen->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", context, q)
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, hidden)
    out = (
        jnp.einsum("bhwo,oc->bhwc", out, params["Conv_1"]["kernel"][0, 0])
        + params["Conv_1"]["bias"]
    )
    return rmsnorm(out, params["RMSNorm_1"]["g"])


def test_migration_is_semantics_preserving(rng):
    """Old math on old-layout weights == new module on migrated weights."""
    mod = LinearAttention(dim=64)
    x = jax.random.normal(rng, (2, 8, 8, 64))
    new_params = mod.init(jax.random.fold_in(rng, 1), x)["params"]
    old_params = _inverse_migrate(new_params)
    assert has_pre_fused_linear_attention(old_params)

    y_old = _old_forward(x, old_params)
    roundtripped = migrate_pre_fused_linear_attention(old_params)
    assert not has_pre_fused_linear_attention(roundtripped)
    y_new = mod.apply({"params": roundtripped}, x)
    np.testing.assert_allclose(
        np.asarray(y_old), np.asarray(y_new), atol=1e-4, rtol=1e-4
    )
    # Round-trip is exact on the weights themselves.
    for a, b in zip(
        jax.tree_util.tree_leaves(roundtripped),
        jax.tree_util.tree_leaves(new_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_migration_recurses_into_list_and_tuple_nodes(rng):
    """Raw orbax trees may hold optax chain states as list/tuple nodes;
    pre-fused subtrees below them must still be detected and migrated
    (regression: non-dict nodes were returned unchanged)."""
    mod = LinearAttention(dim=64)
    x = jax.random.normal(rng, (1, 4, 4, 64))
    new_params = mod.init(jax.random.fold_in(rng, 1), x)["params"]
    old_params = _inverse_migrate(new_params)

    wrapped = {"opt_state": [{"mu": old_params}, ({"nu": old_params},)]}
    assert has_pre_fused_linear_attention(wrapped)
    migrated = migrate_pre_fused_linear_attention(wrapped)
    assert not has_pre_fused_linear_attention(migrated)
    assert isinstance(migrated["opt_state"], list)
    assert isinstance(migrated["opt_state"][1], tuple)
    for a, b in zip(
        jax.tree_util.tree_leaves(migrated["opt_state"][0]["mu"]),
        jax.tree_util.tree_leaves(new_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_migrates_pre_fused_checkpoint(tmp_path, rng):
    """CheckpointManager.restore auto-migrates a checkpoint saved with the
    round-1 LinearAttention layout (regression: restore raised an opaque
    orbax tree-mismatch error with no migration path)."""
    from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
    from lightning_generative_models_tpu.train.checkpoint import (
        CheckpointManager,
    )

    model = DDPM(
        img_channels=1, img_size=8, dim=8, diffusion_timesteps=8,
        sampling_timesteps=4, use_bf16=False,
    )
    state = jax.jit(model.init_state)(rng)
    old_style = state.replace(
        params=_inverse_migrate(state.params),
        ema_params=_inverse_migrate(state.ema_params),
    )
    assert has_pre_fused_linear_attention(old_style.params)

    mgr = CheckpointManager(tmp_path / "ckpt", monitor=model.monitor)
    mgr.save_last(old_style, step=7, epoch=1)

    restored, step, epoch = mgr.restore(state)
    assert (step, epoch) == (7, 1)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
