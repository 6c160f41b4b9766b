"""DiT backbone (beyond reference — the reference diffusion stack is
UNet-only, models/generative/diffusion/ddpm.py:93-471).

Semantics pinned here:
- adaLN-Zero init contract: the network output at init is EXACTLY zero
  (zero-init modulation closes every residual branch; zero-init head) —
  the arXiv:2212.09748 stability trick, and the strongest single check of
  the block wiring (any pre-LN/residual/gate mistake breaks exact zero).
- The backbone is a drop-in behind DDPM/FlowMatching: train, gated-EMA
  equality, CFG algebra, and all samplers run unchanged.
- Positional table properties and every constructor/shape guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.models.diffusion.dit import (
    DiT,
    posemb_sincos_2d,
)
from lightning_generative_models_tpu.models.diffusion.flow_matching import (
    FlowMatching,
)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _tiny_dit(**kw):
    kw.setdefault("num_classes", None)
    return DDPM(
        img_channels=1, img_size=8, network="dit", dim=16, depth=2,
        num_heads=4, patch_size=2, diffusion_timesteps=8,
        sampling_timesteps=4, use_bf16=False,
        ema_update_after_step=2, ema_update_every=1, **kw
    )


def _batch(rng, b=4, num_classes=3):
    img = jax.random.randint(rng, (b, 8, 8, 1), 0, 256, jnp.int32)
    return {
        "image": img.astype(jnp.uint8),
        "label": jnp.arange(b, dtype=jnp.int32) % num_classes,
    }


# -- adaLN-Zero init contract --------------------------------------------------


def test_output_exactly_zero_at_init(rng):
    model = _tiny_dit()
    state = model.init_state(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 1))
    t = jnp.array([3, 7])
    out = model.unet.apply({"params": state.params["model"]}, x, t)
    assert out.shape == x.shape and out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_conditional_output_zero_at_init_any_label(rng):
    model = _tiny_dit(num_classes=3)
    state = model.init_state(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 1))
    out = model.unet.apply(
        {"params": state.params["model"]}, x, jnp.array([1, 2]),
        labels=jnp.array([0, 3]),
    )
    assert float(jnp.max(jnp.abs(out))) == 0.0


# -- training / sampling through the DDPM machinery ----------------------------


def test_train_eval_sample(rng):
    model = _tiny_dit()
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 9))
    step = jax.jit(model.train_step, donate_argnums=0)
    loss0 = None
    for i in range(3):
        state, metrics = step(state, batch, rng)
        loss0 = loss0 if loss0 is not None else float(metrics["train_loss"])
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(state.step) == 3
    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert np.isfinite(float(ev["val_loss"]))
    samp = model.sample(state, jax.random.fold_in(rng, 2), 4)
    assert samp.shape == (4, 8, 8, 1)
    assert float(samp.min()) >= 0.0 and float(samp.max()) <= 1.0
    # Deterministic given the same key/state.
    samp2 = model.sample(state, jax.random.fold_in(rng, 2), 4)
    np.testing.assert_array_equal(np.asarray(samp), np.asarray(samp2))


def test_gated_ema_step_matches_plain(rng):
    """The host-gated EMA machinery is backbone-agnostic — pin it for DiT."""
    model = _tiny_dit()
    s_plain = model.init_state(rng)
    s_gated = jax.tree_util.tree_map(jnp.copy, s_plain)
    batch = _batch(jax.random.fold_in(rng, 5))
    plain = jax.jit(model.train_step)
    gated = {
        True: jax.jit(lambda s, b, r: model.train_step_gated(s, b, r, True)),
        False: jax.jit(lambda s, b, r: model.train_step_gated(s, b, r, False)),
    }
    for _ in range(4):
        s_plain, _ = plain(s_plain, batch, rng)
        s_gated, _ = gated[model.ema_step_needed(int(s_gated.step) + 1)](
            s_gated, batch, rng
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_plain), jax.tree_util.tree_leaves(s_gated)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_w_zero_equals_null_labels(rng):
    model = _tiny_dit(num_classes=3)
    state = model.init_state(rng)
    batch = _batch(jax.random.fold_in(rng, 9))
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(3):
        state, _ = step(state, batch, rng)
    key = jax.random.fold_in(rng, 7)
    labels = jnp.array([0, 1, 2, 0])
    guided0 = model.sample_classes(state, key, labels, guidance_scale=0.0)
    uncond = model._from_diffusion_space(
        state,
        model.diffusion.sample(
            model._apply_fn(state.ema_params, model.null_labels(4)), 4, key
        ),
    )
    np.testing.assert_allclose(
        np.asarray(guided0), np.asarray(uncond), atol=1e-5
    )


def test_all_samplers_run(rng):
    model = _tiny_dit()
    state = model.init_state(rng)
    for method in ("ddpm", "ddim", "dpmpp"):
        out = model.sample(state, rng, 2, method=method, steps=3)
        assert out.shape == (2, 8, 8, 1)


def test_flow_matching_with_dit_backbone(rng):
    model = FlowMatching(
        img_channels=1, img_size=8, network="dit", dim=16, depth=2,
        num_heads=4, patch_size=2, sampling_steps=3, use_bf16=False,
        ema_update_after_step=1, ema_update_every=1,
    )
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 3))
    step = jax.jit(model.train_step, donate_argnums=0)
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["train_loss"]))
    for solver in ("euler", "midpoint", "heun"):
        out = model.sample(state, rng, 2, method=solver)
        assert out.shape == (2, 8, 8, 1)


def test_bnhd_einsum_matches_sdpa_formulation(rng):
    """The default DiTBlock computes attention as einsums contracted
    directly in [b,n,heads,d] (no head transpose — measured 12 relayout
    copies + XLA's slow auto-flash rewrite on the transposed layout, see
    scripts/dit_attack.py). Pin that the formulation is the same math as
    the canonical [b,h,n,d] SDPA."""
    from lightning_generative_models_tpu.ops.attention import (
        scaled_dot_product_attention,
    )

    b, n, h, d = 2, 12, 4, 8
    mk = lambda i: jax.random.normal(  # noqa: E731
        jax.random.fold_in(rng, i), (b, n, h, d), jnp.float32
    )
    q, k, v = mk(1), mk(2), mk(3)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k)
    w = jax.nn.softmax(logits, axis=-1)
    bnhd = jnp.einsum("bhqk,bkhd->bqhd", w, v)

    ref = scaled_dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(bnhd), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_flash_flag_runs(rng):
    """flash_attn=True dispatches through the shared SDPA entry (Pallas on
    TPU at long n, fused XLA otherwise) — must be numerically fine either way."""
    model = _tiny_dit(flash_attn=True)
    state = model.init_state(rng)
    state, metrics = jax.jit(model.train_step)(
        state, _batch(jax.random.fold_in(rng, 3)), rng
    )
    assert np.isfinite(float(metrics["train_loss"]))


# -- positional table ----------------------------------------------------------


def test_posemb_shape_and_uniqueness():
    pe = posemb_sincos_2d(4, 6, 16)
    assert pe.shape == (24, 16) and pe.dtype == np.float32
    # Every grid position gets a distinct embedding.
    dists = np.linalg.norm(pe[:, None] - pe[None, :], axis=-1)
    np.fill_diagonal(dists, np.inf)
    assert dists.min() > 1e-3


def test_posemb_requires_dim_multiple_of_4():
    with pytest.raises(ValueError, match="dim % 4"):
        posemb_sincos_2d(2, 2, 10)


# -- guards --------------------------------------------------------------------


def test_unknown_network_rejected():
    with pytest.raises(ValueError, match="unknown network"):
        DDPM(network="resnet")


def test_self_condition_rejected():
    with pytest.raises(ValueError, match="self_condition"):
        DDPM(network="dit", self_condition=True)


def test_dit_only_attention_knobs_rejected_on_unet():
    with pytest.raises(ValueError, match="einsum_attn"):
        DDPM(network="unet", einsum_attn=True)
    with pytest.raises(ValueError, match="pp_fused_attn"):
        DDPM(network="unet", pp_fused_attn=True)


def test_patch_divisibility_guard(rng):
    dit = DiT(hidden=16, depth=1, heads=4, patch_size=3, channels=1)
    with pytest.raises(ValueError, match="not divisible by patch"):
        dit.init(rng, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1,)))


def test_heads_divisibility_guard(rng):
    dit = DiT(hidden=18, depth=1, heads=4, patch_size=2, channels=1)
    with pytest.raises(ValueError, match="divisible by heads"):
        dit.init(rng, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1,)))


def test_x_self_cond_rejected(rng):
    dit = DiT(hidden=16, depth=1, heads=4, patch_size=2, channels=1)
    x = jnp.zeros((1, 8, 8, 1))
    with pytest.raises(ValueError, match="self-conditioning"):
        dit.init(rng, x, jnp.zeros((1,)), x)


def test_labels_required_when_conditional(rng):
    dit = DiT(hidden=16, depth=1, heads=4, patch_size=2, channels=1,
              num_classes=5)
    assert dit.null_class == 5
    with pytest.raises(ValueError, match="requires labels"):
        dit.init(rng, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1,)))
