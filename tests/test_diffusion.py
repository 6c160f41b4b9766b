"""Diffusion stack: schedule golden values, closed-form identities, samplers,
EMA gating, and a tiny overfit run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
    sigmoid_beta_schedule,
)
from lightning_generative_models_tpu.models.diffusion.unet import UNet
from lightning_generative_models_tpu.registry import load_model


# ---------------------------------------------------------------- schedules
def test_linear_schedule_golden():
    betas = linear_beta_schedule(1000)
    assert abs(betas[0] - 1e-4) < 1e-12
    assert abs(betas[-1] - 0.02) < 1e-12
    assert betas.shape == (1000,)


def test_cosine_schedule_properties():
    betas = cosine_beta_schedule(1000)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)
    alphas_cumprod = np.cumprod(1 - betas)
    assert alphas_cumprod[0] > 0.99 and alphas_cumprod[-1] < 1e-3


def test_sigmoid_schedule_properties():
    betas = sigmoid_beta_schedule(1000)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)
    assert np.all(np.diff(np.cumprod(1 - betas)) < 0)


def make_diffusion(**kw):
    args = dict(img_size=8, channels=1, timesteps=100)
    args.update(kw)
    return GaussianDiffusion(**args)


# ------------------------------------------------------- closed-form identities
@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_qsample_inversion_identities(rng, objective):
    gd = make_diffusion(objective=objective)
    x0 = jax.random.uniform(rng, (4, 8, 8, 1), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([0, 10, 50, 99])
    xt = gd.q_sample(x0, t, noise)

    # Recover x0 from noise and vice versa.
    # f32 tolerance: 1/sqrt(alpha_bar) amplifies roundoff at large t.
    np.testing.assert_allclose(
        np.asarray(gd.predict_start_from_noise(xt, t, noise)),
        np.asarray(x0), rtol=3e-3, atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(gd.predict_noise_from_start(xt, t, x0)),
        np.asarray(noise), rtol=3e-3, atol=3e-3,
    )
    # v-parameterization roundtrip.
    v = gd.predict_v(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(gd.predict_start_from_v(xt, t, v)),
        np.asarray(x0), rtol=3e-3, atol=3e-3,
    )


def test_model_predictions_consistency(rng):
    """All three objectives agree when the model is the oracle."""
    x0 = jax.random.uniform(rng, (2, 8, 8, 1), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([30, 70])
    for objective in ("pred_noise", "pred_x0", "pred_v"):
        gd = make_diffusion(objective=objective)
        xt = gd.q_sample(x0, t, noise)
        oracle = {
            "pred_noise": lambda x, tt, sc: noise,
            "pred_x0": lambda x, tt, sc: x0,
            "pred_v": lambda x, tt, sc: gd.predict_v(x0, tt, noise),
        }[objective]
        pred = gd.model_predictions(oracle, xt, t)
        np.testing.assert_allclose(np.asarray(pred.pred_x_start), np.asarray(x0),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pred.pred_noise), np.asarray(noise),
                                   rtol=1e-2, atol=1e-2)


def test_min_snr_weighting():
    gd = make_diffusion(objective="pred_noise", min_snr_loss_weight=True,
                        min_snr_gamma=5.0)
    snr = np.asarray(gd.alphas_cumprod) / (1 - np.asarray(gd.alphas_cumprod))
    expected = np.minimum(snr, 5.0) / snr
    np.testing.assert_allclose(np.asarray(gd.loss_weight), expected, rtol=1e-4)


# --------------------------------------------------------------- samplers
def _tiny_ddpm(sampling_timesteps=None):
    return load_model(
        {
            "name": "DDPM",
            "args": {
                "img_channels": 1,
                "img_size": 16,
                "dim": 8,
                "diffusion_timesteps": 20,
                "sampling_timesteps": sampling_timesteps,
                "lr": 1e-3,
                "betas": [0.9, 0.99],
                "ema_update_every": 2,
                "ema_decay": 0.9,
                "ema_update_after_step": 3,
                "use_bf16": False,
            },
        }
    )


def test_ddpm_gated_ema_matches_plain(rng):
    """Host-gated EMA (two compiled variants, trainer picks per step) must
    be bit-identical to the always-on train_step across warmup, update and
    keep steps."""
    import functools

    model = _tiny_ddpm()
    from lightning_generative_models_tpu.data.datasets import synthetic_dataset

    images, labels = synthetic_dataset("MNIST", True, num_samples=8)
    batch = {"image": images[:, :16, :16, :], "label": labels}

    plain = jax.jit(model.train_step)
    gated_ema = jax.jit(functools.partial(model.train_step_gated, do_ema=True))
    gated_noema = jax.jit(
        functools.partial(model.train_step_gated, do_ema=False)
    )

    s1 = model.init_state(rng)
    s2 = model.init_state(rng)
    for i in range(8):  # crosses warmup (<=3), update (%2) and keep steps
        s1, _ = plain(s1, batch, rng)
        fn = gated_ema if model.ema_step_needed(i + 1) else gated_noema
        s2, _ = fn(s2, batch, rng)
    for a, b in zip(
        jax.tree_util.tree_leaves((s1.params, s1.ema_params)),
        jax.tree_util.tree_leaves((s2.params, s2.ema_params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_trainer_unroll_gated_matches_plain(tmp_path):
    """Trainer unroll_steps=2 on DDPM (unroll composed with host-gated EMA
    masks) must produce the plain trainer's params AND ema_params.

    Tolerance design (measured): Adam's m/sqrt(v) divides by near-zero v
    early in training, amplifying the benign ~1-ulp cross-step-fusion
    rounding into O(update)-scale param differences within ONE 2-step
    dispatch (3e-4 at step 4, while opt_state m/v — LINEAR accumulations
    of the gradients — still agree to 3e-8). So params are compared
    tightly only where chaos-free (from init), and later dispatches are
    checked on the chaos-free invariants that still catch real wiring
    bugs: opt_state (wrong batch/rng => m differs by O(0.1*grad) ~ 1e-3,
    4+ orders above the 3e-8 fusion-noise floor) and the exact EMA-mask
    flags the trainer passes per dispatch.
    """
    from lightning_generative_models_tpu.data.datamodule import DataModule
    from lightning_generative_models_tpu.train.trainer import Trainer

    def dm():
        return DataModule(name="MNIST", img_size=16, img_channels=1,
                          batch_size=8, synthetic_size=64)

    def fit(subdir, **kw):
        t = Trainer(
            _tiny_ddpm(), dm(), tmp_path / subdir, max_steps=2,
            log_every_n_steps=1, sample_every_n_steps=0,
            check_val_every_n_epoch=99, **kw,
        )
        return t.fit()

    def assert_close(s1, s2, tol):
        for a, b in zip(
            jax.tree_util.tree_leaves((s1.params, s1.ema_params)),
            jax.tree_util.tree_leaves((s2.params, s2.ema_params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=tol
            )

    assert_close(fit("plain"), fit("unroll", unroll_steps=2), 1e-6)

    # -- dispatch-level resync across all EMA-mask variants ----------------
    model = _tiny_ddpm()
    t = Trainer(
        model, dm(), tmp_path / "resync", max_steps=6,
        log_every_n_steps=1, sample_every_n_steps=0,
        check_val_every_n_epoch=99, unroll_steps=2,
    )
    seen_flags = []
    orig_jit = t._unrolled_jit

    def recording_jit(state, stacked, rng, flags):
        seen_flags.append(flags)
        return orig_jit(state, stacked, rng, flags)

    t._unrolled_jit = recording_jit
    plain_step = jax.jit(model.train_step)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(model.init_state)(rng)
    t.datamodule.setup()
    batches = [b for _, b in zip(range(6), t.datamodule.train_batches(0))]
    for d in range(3):  # dispatches at global_step 0/2/4: masks TT, TT, FT
        ref = state
        for i in range(2):
            ref, _ = plain_step(ref, batches[2 * d + i], rng)
        stacked = {
            k: np.stack([batches[2 * d + i][k] for i in range(2)])
            for k in batches[0]
        }
        t.global_step = 2 * d
        got, _ = t._train_step(state, stacked, rng)
        if d == 0:  # from init: chaos-free, measured 2e-7
            assert_close(ref, got, 1e-5)
        for a, b in zip(  # linear in grads: catches wrong batch/rng/order
            jax.tree_util.tree_leaves(ref.opt_state),
            jax.tree_util.tree_leaves(got.opt_state),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-5
            )
        assert int(np.asarray(got.step)) == 2 * d + 2
        state = ref  # resync: no cross-dispatch amplification
    # tiny model: after=3, every=2 => steps 1..6 need EMA at 1,2,3,4,6
    assert seen_flags == [(True, True), (True, True), (False, True)]


def test_ddpm_train_decreases_and_ema_gates(rng):
    model = _tiny_ddpm()
    state = model.init_state(rng)
    from lightning_generative_models_tpu.data.datasets import synthetic_dataset

    images, labels = synthetic_dataset("MNIST", True, num_samples=8)
    batch = {"image": images[:, :16, :16, :], "label": labels}
    step = jax.jit(model.train_step, donate_argnums=0)

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["train_loss"]))
        if i == 1:  # during warmup: EMA == raw params (hard copy)
            diff = jax.tree_util.tree_map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))),
                state.params["model"], state.ema_params,
            )
            assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    # after warmup EMA lags raw params
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["model"], state.ema_params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_ancestral_and_ddim_sampling_shapes(rng):
    model = _tiny_ddpm()  # sampling_timesteps=None -> ancestral
    state = model.init_state(rng)
    imgs = jax.jit(model.sample, static_argnums=2)(state, rng, 2)
    assert imgs.shape == (2, 16, 16, 1)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0

    ddim = _tiny_ddpm(sampling_timesteps=5)
    assert ddim.diffusion.is_ddim_sampling
    imgs = jax.jit(ddim.sample, static_argnums=2)(state, rng, 2)
    assert imgs.shape == (2, 16, 16, 1)


def test_ddim_deterministic_with_eta0(rng):
    model = _tiny_ddpm(sampling_timesteps=5)
    state = model.init_state(rng)
    a = model.sample(state, rng, 2)
    b = model.sample(state, rng, 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpmpp_exact_on_delta_data(rng):
    """DPM-Solver++(2M) is EXACT when the model's x0 prediction is constant
    (delta data distribution): every probability-flow trajectory is
    x_t = alpha_t*x0 + sigma_t*c, and both the first-order and the 2M update
    reproduce it in closed form. Any coefficient/sign error breaks this."""
    gd = make_diffusion(objective="pred_noise", timesteps=100)
    x0_star = 0.5  # inside the clip range

    def apply_fn(x, t, self_cond):
        # Perfect denoiser for data == delta(x0_star): eps = (x_t - a_t x0)/s_t
        nd = x.ndim
        a = _extract_like(gd.sqrt_alphas_cumprod, t, nd)
        s = _extract_like(gd.sqrt_one_minus_alphas_cumprod, t, nd)
        return (x - a * x0_star) / s

    for steps in (1, 3, 10):
        out = gd.dpmpp_sample(apply_fn, 2, rng, steps=steps)
        np.testing.assert_allclose(
            np.asarray(out),
            np.full((2, 8, 8, 1), (x0_star + 1) / 2, np.float32),
            rtol=0, atol=1e-4,  # f32 roundoff; worst at steps=1 (one big h)
        )


def _extract_like(a, t, ndim):
    return a[t].reshape(t.shape[0], *((1,) * (ndim - 1)))


def test_dpmpp_one_step_equals_ddim_one_step(rng):
    """At a single step both samplers return the x0 prediction from the same
    x_T (shared init-key derivation) — bitwise-comparable check that the
    node discretization and the final-step convention line up."""
    model = _tiny_ddpm(sampling_timesteps=1)
    state = model.init_state(rng)
    ddim = model.sample(state, rng, 2)  # auto -> ddim (1 step)
    dpmpp = model.sample(state, rng, 2, method="dpmpp", steps=1)
    np.testing.assert_allclose(
        np.asarray(ddim), np.asarray(dpmpp), rtol=1e-5, atol=1e-5
    )


def test_dpmpp_matches_ddim_at_high_step_count(rng):
    """Both samplers discretize the same probability-flow ODE; at a fine
    discretization on a smooth (random-init) model their outputs must agree
    closely. Catches wrong lambda/step bookkeeping that the delta-data test
    (constant x0) cannot see."""
    model = _tiny_ddpm(sampling_timesteps=20)  # == timesteps: every node
    state = model.init_state(rng)
    ddim = model.sample(state, rng, 2, method="ddim")
    dpmpp = model.sample(state, rng, 2, method="dpmpp", steps=20)
    diff = float(jnp.abs(ddim - dpmpp).mean())
    assert diff < 0.02, f"dpmpp vs ddim mean abs diff {diff}"


def test_dpmpp_shapes_range_determinism(rng):
    model = _tiny_ddpm(sampling_timesteps=5)
    state = model.init_state(rng)
    a = model.sample(state, rng, 2, method="dpmpp", steps=4)
    b = model.sample(state, rng, 2, method="dpmpp", steps=4)
    assert a.shape == (2, 16, 16, 1)
    assert 0.0 <= float(a.min()) and float(a.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))


def test_ddim_steps_override(rng):
    """`steps` overrides the config's sampling_timesteps on the DDIM path:
    a 3-step override from a 5-step config equals a model configured with
    sampling_timesteps=3 outright (identical node discretization + init key)."""
    m5 = _tiny_ddpm(sampling_timesteps=5)
    m3 = _tiny_ddpm(sampling_timesteps=3)
    state = m5.init_state(rng)
    a = m5.diffusion.ddim_sample(m5._apply_fn(state.ema_params), 2, rng, steps=3)
    b = m3.diffusion.ddim_sample(m3._apply_fn(state.ema_params), 2, rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_method_dispatch_rejects_unknown(rng):
    model = _tiny_ddpm()
    state = model.init_state(rng)
    with pytest.raises(ValueError, match="unknown sampling method"):
        model.sample(state, rng, 1, method="euler")


def test_interpolate(rng):
    model = _tiny_ddpm()
    state = model.init_state(rng)
    x1 = jnp.zeros((1, 16, 16, 1)) + 0.3
    x2 = jnp.zeros((1, 16, 16, 1)) + 0.7
    out = model.interpolate(state, x1, x2, rng, t=5)
    assert out.shape == (1, 16, 16, 1)


# ------------------------------------------------------------------- UNet
def test_unet_shapes_and_self_condition(rng):
    unet = UNet(dim=8, dim_mults=(1, 2), channels=3, self_condition=True)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 5])
    params = unet.init(rng, x, t)["params"]
    out = unet.apply({"params": params}, x, t, jnp.zeros_like(x))
    assert out.shape == (2, 16, 16, 3)
    out2 = unet.apply({"params": params}, x, t)  # default zero self-cond
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_unet_learned_variance_output_channels(rng):
    unet = UNet(dim=8, dim_mults=(1, 2), channels=1, learned_variance=True)
    x = jnp.zeros((1, 16, 16, 1))
    params = unet.init(rng, x, jnp.array([0]))["params"]
    out = unet.apply({"params": params}, x, jnp.array([0]))
    assert out.shape == (1, 16, 16, 2)
