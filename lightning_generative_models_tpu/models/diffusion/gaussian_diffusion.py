"""Gaussian diffusion: schedules, objectives, losses and scan-based samplers.

Capability parity with the reference GaussianDiffusion (reference:
models/generative/diffusion/ddpm.py:477-946): linear/cosine/sigmoid beta
schedules computed in float64 then stored f32 (ddpm.py:491-529, 596-640);
objectives pred_noise / pred_x0 / pred_v (default pred_v, default schedule
sigmoid); min-SNR loss weighting; offset noise; optional 50%%
self-conditioning with a stop-gradient extra forward (ddpm.py:901-905);
ancestral DDPM sampling over all T steps; strided DDIM sampling with
eta-scaled noise and clip+rederive (ddpm.py:782-834); latent interpolation
(ddpm.py:847-867).

TPU design:
- All schedule buffers are precomputed host-side (numpy float64 -> f32) and
  live in HBM as jit constants; per-step coefficients are dynamic gathers.
- Both samplers are ``lax.scan`` over the denoise step — ONE compiled program
  for the whole 1000-step (or 50-step DDIM) chain, no host round-trips
  (the reference pays a Python-loop + kernel-launch per step).
- The model is passed in as an ``apply_fn(x, t, self_cond) -> out`` closure,
  keeping this module purely functional.
"""

from __future__ import annotations

import math

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.parallel.mesh import data_shard

ApplyFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1.0
) -> np.ndarray:
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    v_start, v_end = sigmoid(start / tau), sigmoid(end / tau)
    alphas_cumprod = (-sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


BETA_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


class ModelPrediction(NamedTuple):
    pred_noise: jax.Array
    pred_x_start: jax.Array


def _extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """a[t] broadcast to an image batch: [B] -> [B, 1, 1, 1]."""
    return a[t].reshape(t.shape[0], *((1,) * (ndim - 1)))


class GaussianDiffusion:
    def __init__(
        self,
        img_size: int,
        channels: int = 3,
        timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        objective: str = "pred_v",
        beta_schedule: str = "sigmoid",
        schedule_fn_kwargs: Optional[dict] = None,
        ddim_sampling_eta: float = 0.0,
        auto_normalize: bool = True,
        offset_noise_strength: float = 0.0,
        min_snr_loss_weight: bool = False,
        min_snr_gamma: float = 5.0,
        self_condition: bool = False,
        x_start_clip: Optional[float] = 1.0,
    ):
        """``x_start_clip`` bounds the denoised x0 estimate to
        [-clip, clip] wherever the reference clamps to [-1, 1]
        (ddpm.py:739-741, 806); ``None`` disables clipping entirely —
        required when the diffusion space is an unbounded latent space
        (see models/diffusion/latent_diffusion.py) rather than pixel
        space. The default 1.0 is exact reference behavior."""
        assert objective in ("pred_noise", "pred_x0", "pred_v")
        if beta_schedule not in BETA_SCHEDULES:
            raise ValueError(f"unknown beta schedule {beta_schedule}")
        self.img_size = img_size
        self.channels = channels
        self.objective = objective
        self.self_condition = self_condition
        self.num_timesteps = timesteps
        self.sampling_timesteps = sampling_timesteps or timesteps
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta
        self.offset_noise_strength = offset_noise_strength
        self.auto_normalize = auto_normalize
        self.x_start_clip = x_start_clip

        # float64 schedule math, f32 buffers (reference ddpm.py:596-640).
        betas = BETA_SCHEDULES[beta_schedule](timesteps, **(schedule_fn_kwargs or {}))
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
        self.betas = f32(betas)
        self.alphas_cumprod = f32(alphas_cumprod)
        self.alphas_cumprod_prev = f32(alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = f32(np.sqrt(alphas_cumprod))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - alphas_cumprod))
        self.log_one_minus_alphas_cumprod = f32(np.log(1 - alphas_cumprod))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1 / alphas_cumprod))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1 / alphas_cumprod - 1))

        posterior_variance = betas * (1 - alphas_cumprod_prev) / (1 - alphas_cumprod)
        self.posterior_variance = f32(posterior_variance)
        self.posterior_log_variance_clipped = f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        )
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1 - alphas_cumprod)
        )
        self.posterior_mean_coef2 = f32(
            (1 - alphas_cumprod_prev) * np.sqrt(alphas) / (1 - alphas_cumprod)
        )

        snr = alphas_cumprod / (1 - alphas_cumprod)
        clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
        if objective == "pred_noise":
            self.loss_weight = f32(clipped_snr / snr)
        elif objective == "pred_x0":
            self.loss_weight = f32(clipped_snr)
        else:  # pred_v
            self.loss_weight = f32(clipped_snr / (snr + 1))

    # -- normalization ([0,1] <-> [-1,1], ddpm.py:664-667) -------------------
    def normalize(self, x: jax.Array) -> jax.Array:
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0) if self.auto_normalize else x

    # -- closed-form conversions (ddpm.py:673-705) ----------------------------
    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_v(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * noise
            - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = _extract(self.posterior_variance, t, nd)
        log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # -- model wrappers (ddpm.py:707-757) -------------------------------------
    def model_predictions(
        self,
        apply_fn: ApplyFn,
        x: jax.Array,
        t: jax.Array,
        x_self_cond: Optional[jax.Array] = None,
        clip_x_start: bool = False,
        rederive_pred_noise: bool = False,
    ) -> ModelPrediction:
        model_output = apply_fn(x, t, x_self_cond)
        bound = self.x_start_clip
        clip_x_start = clip_x_start and bound is not None
        clip = (lambda v: jnp.clip(v, -bound, bound)) if clip_x_start else (lambda v: v)

        if self.objective == "pred_noise":
            pred_noise = model_output
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = clip(model_output)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, model_output))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(self, apply_fn, x, t, x_self_cond=None):
        preds = self.model_predictions(apply_fn, x, t, x_self_cond)
        x_start = preds.pred_x_start
        if self.x_start_clip is not None:
            x_start = jnp.clip(x_start, -self.x_start_clip, self.x_start_clip)
        mean, variance, log_variance = self.q_posterior(x_start, x, t)
        return mean, variance, log_variance, x_start

    # -- training loss (ddpm.py:878-946) ---------------------------------------
    def p_losses(
        self,
        apply_fn: ApplyFn,
        x_start01: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        """Full training objective on a [0,1] image batch."""
        b = x_start01.shape[0]
        t_rng, noise_rng, offset_rng, sc_rng, coin_rng = jax.random.split(rng, 5)
        x_start = self.normalize(x_start01)
        t = jax.random.randint(t_rng, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(noise_rng, x_start.shape)

        if self.offset_noise_strength > 0.0:
            offset = jax.random.normal(offset_rng, (b, 1, 1, x_start.shape[-1]))
            noise = noise + self.offset_noise_strength * offset

        x = self.q_sample(x_start, t, noise)

        x_self_cond = None
        if self.self_condition:
            # 50% of steps condition on a stop-gradient x0 estimate
            # (ddpm.py:901-905) — lax.cond keeps it one compiled program.
            def with_sc(_):
                preds = self.model_predictions(apply_fn, x, t)
                return jax.lax.stop_gradient(preds.pred_x_start)

            x_self_cond = jax.lax.cond(
                jax.random.bernoulli(coin_rng),
                with_sc,
                lambda _: jnp.zeros_like(x),
                operand=None,
            )

        model_out = apply_fn(x, t, x_self_cond)

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = self.predict_v(x_start, t, noise)

        loss = jnp.mean((model_out - target) ** 2, axis=(1, 2, 3))
        loss = loss * self.loss_weight[t]
        return loss.mean()

    # -- ancestral sampling (ddpm.py:748-780) -----------------------------------
    def p_sample_loop(
        self, apply_fn: ApplyFn, batch_size: int, rng: jax.Array
    ) -> jax.Array:
        shape = (batch_size, self.img_size, self.img_size, self.channels)
        init_rng, loop_rng = jax.random.split(rng)
        img0 = data_shard(jax.random.normal(init_rng, shape))

        def step(carry, t):
            img, x_start_prev = carry
            self_cond = x_start_prev if self.self_condition else None
            t_b = jnp.full((batch_size,), t, jnp.int32)
            mean, _, log_var, x_start = self.p_mean_variance(
                apply_fn, img, t_b, self_cond
            )
            noise = jax.random.normal(jax.random.fold_in(loop_rng, t), shape)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            img = mean + jnp.exp(0.5 * log_var) * noise
            return (img, x_start), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img0, jnp.zeros_like(img0)), ts)
        return self.unnormalize(img)

    # -- DDIM sampling (ddpm.py:782-834) -----------------------------------------
    def ddim_sample(
        self,
        apply_fn: ApplyFn,
        batch_size: int,
        rng: jax.Array,
        steps: Optional[int] = None,
    ) -> jax.Array:
        shape = (batch_size, self.img_size, self.img_size, self.channels)
        eta = self.ddim_sampling_eta

        # Strided time pairs, precomputed host-side (ddpm.py:792-798).
        steps = steps or self.sampling_timesteps
        times = np.linspace(-1, self.num_timesteps - 1, steps + 1)
        times = list(reversed(times.astype(int).tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int32)

        init_rng, loop_rng = jax.random.split(rng)
        img0 = data_shard(jax.random.normal(init_rng, shape))

        def step(carry, pair):
            img, x_start_prev, i = carry
            t, t_next = pair[0], pair[1]
            self_cond = x_start_prev if self.self_condition else None
            t_b = jnp.full((batch_size,), t, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                apply_fn, img, t_b, self_cond,
                clip_x_start=True, rederive_pred_noise=True,
            )

            alpha = self.alphas_cumprod[t]
            alpha_next = jnp.where(t_next >= 0, self.alphas_cumprod[t_next], 1.0)
            sigma = eta * jnp.sqrt(
                jnp.clip((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha),
                         0.0, None)
            )
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
            noise = jax.random.normal(jax.random.fold_in(loop_rng, i), shape)
            next_img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            # Final step (t_next < 0): the prediction itself (ddpm.py:812-815).
            img = jnp.where(t_next >= 0, next_img, x_start)
            return (img, x_start, i + 1), None

        carry0 = (img0, jnp.zeros_like(img0), jnp.zeros((), jnp.int32))
        (img, _, _), _ = jax.lax.scan(step, carry0, jnp.asarray(pairs))
        return self.unnormalize(img)

    # -- DPM-Solver++(2M) sampling (beyond reference) ------------------------------
    def dpmpp_sample(
        self,
        apply_fn: ApplyFn,
        batch_size: int,
        rng: jax.Array,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """DPM-Solver++(2M): 2nd-order multistep ODE solver in data-prediction
        form (Lu et al. 2022, arXiv:2211.01095). Deterministic; typically
        matches DDIM-50 sample quality at ~15-25 model evaluations, so it
        raises effective samples/sec ~2-3x at fixed quality. Not in the
        reference (which ships DDPM ancestral + DDIM only); implemented
        because the solver is a pure `lax.scan` over precomputed
        (alpha, sigma, lambda) nodes — exactly the shape TPU likes.

        Discretization matches `ddim_sample`'s strided times; the final
        node (t = -1) returns the x0 prediction, as in the DDIM path.
        """
        steps = steps or self.sampling_timesteps
        shape = (batch_size, self.img_size, self.img_size, self.channels)

        # Host-side nodes: times [T-1 ... -1]; t=-1 is the clean endpoint.
        times = np.linspace(-1, self.num_timesteps - 1, steps + 1)
        times = list(reversed(times.astype(int).tolist()))
        ab = np.asarray(self.alphas_cumprod, np.float64)
        ab_nodes = np.array([ab[t] if t >= 0 else 1.0 for t in times])
        a_nodes = np.sqrt(ab_nodes)  # VP-ODE alpha_t
        s_nodes = np.sqrt(1.0 - ab_nodes)  # VP-ODE sigma_t
        # lambda = log(alpha/sigma); +inf at the clean endpoint (never read:
        # the final step short-circuits to the x0 prediction).
        with np.errstate(divide="ignore"):
            lam_nodes = np.log(a_nodes) - np.log(s_nodes)

        per_step = jnp.asarray(
            np.stack(
                [
                    np.array(times[:-1], np.float64),  # t (model eval time)
                    np.array(times[1:], np.float64),  # t_next
                    a_nodes[1:],  # alpha_{t_next}
                    s_nodes[:-1],  # sigma_t
                    s_nodes[1:],  # sigma_{t_next}
                    lam_nodes[:-1],  # lambda_t
                    np.nan_to_num(lam_nodes[1:], posinf=0.0),  # lambda_{t_next}
                ],
                axis=1,
            ),
            jnp.float32,
        )

        # Same init-noise key derivation as ddim_sample, so the two samplers
        # start from the identical x_T for a given rng (the solver itself is
        # deterministic — no loop noise).
        init_rng, _ = jax.random.split(rng)
        img0 = data_shard(jax.random.normal(init_rng, shape))

        def step(carry, row):
            img, x0_prev, lam_prev, i = carry
            t, t_next = row[0].astype(jnp.int32), row[1].astype(jnp.int32)
            a_next, s_t, s_next, lam_t, lam_next = row[2], row[3], row[4], row[5], row[6]

            self_cond = x0_prev if self.self_condition else None
            t_b = jnp.full((batch_size,), t, jnp.int32)
            _, x0 = self.model_predictions(
                apply_fn, img, t_b, self_cond, clip_x_start=True
            )

            h = lam_next - lam_t
            ratio = s_next / s_t
            phi = jnp.expm1(-h)  # e^{-h} - 1

            # First-order (DPM-Solver++(1), == DDIM eta=0 on these nodes).
            x1 = ratio * img - a_next * phi * x0
            # Second-order multistep: extrapolate x0 through the previous node.
            r = (lam_t - lam_prev) / h
            D = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
            x2 = ratio * img - a_next * phi * D

            nxt = jnp.where(i == 0, x1, x2)
            # Final node (t_next < 0): the x0 prediction itself.
            img = jnp.where(t_next >= 0, nxt, x0)
            return (img, x0, lam_t, i + 1), None

        carry0 = (
            img0,
            jnp.zeros_like(img0),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        (img, _, _, _), _ = jax.lax.scan(step, carry0, per_step)
        return self.unnormalize(img)

    def sample(
        self,
        apply_fn: ApplyFn,
        batch_size: int,
        rng: jax.Array,
        method: Optional[str] = None,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """Dispatch: default (method=None) keeps the reference convention —
        DDIM iff sampling_timesteps < timesteps, ancestral otherwise."""
        if method is None:
            method = "ddim" if self.is_ddim_sampling else "ddpm"
        if method == "dpmpp":
            return self.dpmpp_sample(apply_fn, batch_size, rng, steps=steps)
        if method == "ddim":
            return self.ddim_sample(apply_fn, batch_size, rng, steps=steps)
        if method == "ddpm":
            return self.p_sample_loop(apply_fn, batch_size, rng)
        raise ValueError(f"unknown sampling method {method!r}")

    # -- interpolation (ddpm.py:847-867) ------------------------------------------
    def interpolate(
        self,
        apply_fn: ApplyFn,
        x1_01: jax.Array,
        x2_01: jax.Array,
        rng: jax.Array,
        t: Optional[int] = None,
        lam: float = 0.5,
    ) -> jax.Array:
        t = self.num_timesteps - 1 if t is None else t
        b = x1_01.shape[0]
        n1, n2, loop_rng = jax.random.split(rng, 3)
        t_b = jnp.full((b,), t, jnp.int32)
        xt1 = self.q_sample(self.normalize(x1_01), t_b, jax.random.normal(n1, x1_01.shape))
        xt2 = self.q_sample(self.normalize(x2_01), t_b, jax.random.normal(n2, x2_01.shape))
        img = (1 - lam) * xt1 + lam * xt2

        def step(carry, i):
            img, x_start_prev = carry
            self_cond = x_start_prev if self.self_condition else None
            i_b = jnp.full((b,), i, jnp.int32)
            mean, _, log_var, x_start = self.p_mean_variance(
                apply_fn, img, i_b, self_cond
            )
            noise = jax.random.normal(jax.random.fold_in(loop_rng, i), img.shape)
            noise = jnp.where(i > 0, noise, jnp.zeros_like(noise))
            return (mean + jnp.exp(0.5 * log_var) * noise, x_start), None

        ts = jnp.arange(t - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img, jnp.zeros_like(img)), ts)
        return self.unnormalize(img)
