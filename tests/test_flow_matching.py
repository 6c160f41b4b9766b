"""Flow matching / rectified flow (beyond reference).

Semantics pinned here:
- solver exactness: on the delta-data velocity field v(x,t) = (x-c)/t the
  linear-path ODE solution is x(t) = c + t*(x(1)-c), on which Euler,
  midpoint and Heun are all EXACT at any step count — any coefficient,
  sign, or node-table error breaks the recovery of c;
- the training target is the constant path velocity eps - x0 (zero loss for
  an oracle network, regardless of the sampled t);
- logit-normal time sampling stays inside (0,1) and is deterministic per key;
- the FlowMatching model inherits the full DDPM machinery: EMA weights,
  host-gated EMA step, CFG sampling, per-class grids, checkpoint restore.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.flow_matching import (
    FlowMatching,
    RectifiedFlow,
)
from lightning_generative_models_tpu.registry import load_model


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _delta_field(c, time_scale):
    """Oracle velocity for data concentrated at image c: with
    x_t = (1-t)c + t*eps, E[eps - c | x_t] = (x_t - c)/t."""

    def apply_fn(x, t_scaled, sc=None):
        t = (t_scaled / time_scale).reshape(-1, 1, 1, 1)
        return (x - c) / jnp.maximum(t, 1e-3)

    return apply_fn


@pytest.mark.parametrize("method", ["euler", "midpoint", "heun"])
@pytest.mark.parametrize("steps", [1, 7])
def test_solver_exact_on_delta_data(rng, method, steps):
    flow = RectifiedFlow(img_size=4, channels=1, sampling_steps=steps)
    c = 0.3
    imgs = flow.sample(
        _delta_field(jnp.full((1, 4, 4, 1), c), flow.time_scale),
        batch_size=2, rng=rng, method=method, steps=steps,
    )
    # unnormalize maps the recovered x(0) = c back to (c+1)/2 in [0,1].
    np.testing.assert_allclose(np.asarray(imgs), (c + 1) / 2, atol=1e-4)


def test_sample_determinism_and_range(rng):
    flow = RectifiedFlow(img_size=4, channels=1, sampling_steps=3)

    def apply_fn(x, t, sc=None):
        return jnp.tanh(x)

    a = flow.sample(apply_fn, 2, rng)
    b = flow.sample(apply_fn, 2, rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    other = flow.sample(apply_fn, 2, jax.random.fold_in(rng, 1))
    assert not np.array_equal(np.asarray(a), np.asarray(other))
    assert a.shape == (2, 4, 4, 1)
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0


def test_loss_zero_for_oracle_and_positive_otherwise(rng):
    flow = RectifiedFlow(img_size=4, channels=1)
    x01 = jax.random.uniform(rng, (8, 4, 4, 1))
    x0 = flow.normalize(x01)

    # The oracle cannot be expressed as apply_fn(x_t, t) without inverting
    # the path, so pin the algebra instead: rebuild (t, eps) from the same
    # key splits p_losses uses and check the target identity via a probe
    # that records its inputs.
    seen = {}

    def probe(x_t, t_scaled, sc=None):
        seen["x_t"], seen["t"] = x_t, t_scaled / flow.time_scale
        return jnp.zeros_like(x_t)

    loss0 = flow.p_losses(probe, x01, rng)
    t = seen["t"].reshape(-1, 1, 1, 1)
    # Invert the path: eps = (x_t - (1-t) x0) / t, target = eps - x0.
    eps = (seen["x_t"] - (1 - t) * x0) / t
    target = eps - x0
    np.testing.assert_allclose(
        float(loss0), float(jnp.mean(target**2)), rtol=1e-5
    )

    def oracle(x_t, t_scaled, sc=None):
        tt = (t_scaled / flow.time_scale).reshape(-1, 1, 1, 1)
        return (x_t - (1 - tt) * x0) / tt - x0

    assert float(flow.p_losses(oracle, x01, rng)) == pytest.approx(0.0, abs=1e-9)


def test_logit_normal_times(rng):
    flow = RectifiedFlow(img_size=4, time_sampling="logit_normal",
                         logit_normal_mean=0.5, logit_normal_std=1.0)
    t = flow._sample_times(rng, 4096)
    assert t.shape == (4096,)
    assert float(t.min()) > 0.0 and float(t.max()) < 1.0
    # mean of sigmoid(0.5 + z) ~ 0.60; generous band, just pins the shift.
    assert 0.52 < float(t.mean()) < 0.68
    np.testing.assert_array_equal(
        np.asarray(t), np.asarray(flow._sample_times(rng, 4096))
    )


def test_invalid_solver_and_time_sampling():
    with pytest.raises(ValueError, match="flow solver"):
        RectifiedFlow(img_size=4, solver="rk77")
    with pytest.raises(ValueError, match="time_sampling"):
        RectifiedFlow(img_size=4, time_sampling="beta")
    flow = RectifiedFlow(img_size=4)
    with pytest.raises(ValueError, match="not ddpm/ddim"):
        flow.sample(lambda x, t, sc=None: x, 1, jax.random.PRNGKey(0),
                    method="ddim")


def _tiny_fm(**kw):
    args = {
        "img_size": 16, "img_channels": 1, "dim": 8, "dim_mults": [1, 2],
        "sampling_steps": 3, "use_bf16": False,
        "ema_update_after_step": 1, "ema_update_every": 1,
    }
    args.update(kw)
    return load_model({"name": "FlowMatching", "args": args})


def _batch(rng, b=4, classes=0):
    return {
        "image": jax.random.randint(rng, (b, 16, 16, 1), 0, 256, jnp.uint8),
        "label": (jax.random.randint(rng, (b,), 0, classes, jnp.int32)
                  if classes else jnp.zeros((b,), jnp.int32)),
    }


def test_model_trains_and_samples(rng):
    model = _tiny_fm()
    assert isinstance(model, FlowMatching)
    state = jax.jit(model.init_state)(rng)
    step = jax.jit(model.train_step, donate_argnums=0)
    batch = _batch(jax.random.fold_in(rng, 1))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["train_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # tiny fixed batch must be memorizable
    # EMA tree updated by the inherited machinery.
    assert int(state.step) == 8

    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert np.isfinite(float(ev["val_loss"]))

    for method in ("euler", "midpoint", "heun"):
        imgs = model.sample(state, rng, 2, method=method, steps=2)
        assert imgs.shape == (2, 16, 16, 1)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0

    out = model.interpolate(
        state,
        jax.random.uniform(rng, (2, 16, 16, 1)),
        jax.random.uniform(jax.random.fold_in(rng, 9), (2, 16, 16, 1)),
        rng,
    )
    assert out.shape == (2, 16, 16, 1)


def test_gated_ema_step_matches_plain(rng):
    model = _tiny_fm(ema_update_after_step=0, ema_update_every=2)
    state_a = model.init_state(rng)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    batch = _batch(rng)
    plain = jax.jit(model.train_step)
    gated = {
        flag: jax.jit(lambda s, b, r, f=flag: model.train_step_gated(s, b, r, f))
        for flag in (True, False)
    }
    for i in range(4):
        r = jax.random.fold_in(rng, i)
        state_a, _ = plain(state_a, batch, r)
        state_b, _ = gated[model.ema_step_needed(int(state_b.step) + 1)](
            state_b, batch, r
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_a)),
        jax.tree_util.tree_leaves(jax.device_get(state_b)),
    ):
        np.testing.assert_array_equal(a, b)


def test_conditional_cfg_flow(rng):
    model = _tiny_fm(num_classes=3, guidance_scale=2.0)
    state = jax.jit(model.init_state)(rng)
    batch = _batch(jax.random.fold_in(rng, 2), classes=3)
    state, metrics = jax.jit(model.train_step, donate_argnums=0)(
        state, batch, rng
    )
    assert np.isfinite(float(metrics["train_loss"]))
    imgs = model.sample_classes(state, rng, jnp.array([0, 1, 2]), steps=2)
    assert imgs.shape == (3, 16, 16, 1)
    # w=0 guided == unconditional closure on the same x(1).
    uncond = model.sample_classes(
        state, rng, jnp.array([0, 1, 2]), guidance_scale=0.0, steps=2
    )
    null = model.diffusion.sample(
        model._apply_fn(state.ema_params, model.null_labels(3)), 3, rng, steps=2
    )
    np.testing.assert_allclose(np.asarray(uncond), np.asarray(null), atol=1e-5)
    grids = model.validation_grids(state, rng)
    assert grids["per_class_generation"].shape == (12, 16, 16, 1)


def test_latent_flow_matching(rng):
    """SD3-style synthesis: the flow process over LatentDiffusion's frozen-AE
    hooks. Latent geometry, unbounded-space config, frozen AE, image-space
    sampling through every solver."""
    model = load_model({"name": "LatentFlowMatching", "args": {
        "img_size": 32, "img_channels": 3,
        "autoencoder": {"config_path": "configs/vae/vqvae_cifar10.json"},
        "dim": 8, "dim_mults": [1, 2], "sampling_steps": 3,
        "use_bf16": False, "ema_update_after_step": 1, "ema_update_every": 1,
    }})
    assert isinstance(model.diffusion, RectifiedFlow)
    assert model.diffusion.img_size == model.latent_hw == 4
    assert model.diffusion.channels == model.latent_c == 64
    assert model.diffusion.auto_normalize is False

    state = jax.jit(model.init_state)(rng)
    ae_before = jax.tree_util.tree_map(np.asarray, jax.device_get(state.mutable))
    step = jax.jit(model.train_step, donate_argnums=0)
    batch = {
        "image": jax.random.randint(rng, (4, 32, 32, 3), 0, 256, jnp.uint8),
        "label": jnp.zeros((4,), jnp.int32),
    }
    for i in range(2):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    assert np.isfinite(float(metrics["train_loss"]))
    for a, b in zip(
        jax.tree_util.tree_leaves(ae_before),
        jax.tree_util.tree_leaves(jax.device_get(state.mutable)),
    ):
        np.testing.assert_array_equal(a, b)  # AE frozen

    ev = jax.jit(model.eval_step)(state, batch, rng)
    assert np.isfinite(float(ev["val_loss"]))
    assert float(ev["val_latent_std"]) > 0

    for method in ("euler", "midpoint", "heun"):
        imgs = model.sample(state, rng, 2, method=method, steps=2)
        assert imgs.shape == (2, 32, 32, 3)
        assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_generate_cli_flow_solvers(rng, tmp_path, monkeypatch):
    """generate.py accepts the flow solvers (argparse choices — the live
    verify drive caught 'heun' being rejected before reaching the model)
    and diffusion models reject them with the clear process error."""
    import json

    import generate
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    config = {
        "model": {"name": "FlowMatching",
                  "args": {"img_channels": 1, "img_size": 8, "dim": 8,
                           "dim_mults": [1, 2], "sampling_steps": 3,
                           "use_bf16": False}},
        "dataset": {"name": "MNIST", "img_size": 8, "img_channels": 1,
                    "batch_size": 8},
    }
    cfg_path = tmp_path / "fm_tiny.json"
    cfg_path.write_text(json.dumps(config))
    exp_root = tmp_path / "experiments"
    monkeypatch.setattr(generate, "EXPERIMENT_DIR", str(exp_root))

    model = load_model(config["model"])
    dm = DataModule(name="MNIST", img_size=8, img_channels=1, batch_size=8,
                    synthetic_size=32)
    Trainer(model, dm, exp_root / "FlowMatching" / "run1", max_steps=1,
            log_every_n_steps=1, sample_every_n_steps=0,
            check_val_every_n_epoch=99).fit()

    images = generate.main([
        "--config_path", str(cfg_path),
        "--experiment_name", "run1",
        "--num_samples", "2",
        "--sampler", "heun",
        "--sampling_steps", "2",
    ])
    assert images.shape == (2, 8, 8, 1) and np.all(np.isfinite(images))

    # A diffusion process given a flow solver fails with the clear error.
    from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
        GaussianDiffusion,
    )

    gd = GaussianDiffusion(img_size=8, channels=1, timesteps=8)
    with pytest.raises(ValueError, match="unknown sampling method 'euler'"):
        gd.sample(lambda x, t, sc=None: x, 1, rng, method="euler")


def test_checkpoint_roundtrip(rng, tmp_path):
    from lightning_generative_models_tpu.train.checkpoint import CheckpointManager

    model = _tiny_fm()
    state = model.init_state(rng)
    state, _ = jax.jit(model.train_step, donate_argnums=0)(
        state, _batch(rng), rng
    )
    mgr = CheckpointManager(tmp_path / "checkpoints", monitor=model.monitor)
    mgr.save_last(state, step=1, epoch=0)
    template = jax.tree_util.tree_map(jnp.zeros_like, model.init_state(rng))
    restored, step, _ = mgr.restore(template, "last")
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(jax.device_get(restored)),
    ):
        np.testing.assert_array_equal(a, b)
