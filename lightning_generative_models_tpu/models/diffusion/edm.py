"""EDM: the Karras et al. 2022 diffusion formulation (beyond reference).

"Elucidating the Design Space of Diffusion-Based Generative Models"
(arXiv:2206.00364) reframes diffusion around the noise level sigma directly:

- **Preconditioning** (Table 1, "EDM" column): the denoiser is
  D(x; sigma) = c_skip(sigma) * x + c_out(sigma) * F(c_in(sigma) * x, c_noise(sigma))
  with c_skip = sd^2/(sigma^2+sd^2), c_out = sigma*sd/sqrt(sigma^2+sd^2),
  c_in = 1/sqrt(sigma^2+sd^2), c_noise = ln(sigma)/4, sd = sigma_data.
- **Training** (Eq. 8): sigma ~ LogNormal(P_mean, P_std), loss weight
  lambda(sigma) = (sigma^2+sd^2)/(sigma*sd)^2. Because lambda * c_out^2 = 1,
  the weighted loss is EXACTLY a plain MSE on the raw network output F
  against the effective target (x0 - c_skip * x_t) / c_out — which is how
  :meth:`EDMProcess.p_losses` computes it (one MSE, no explicit weights).
- **Sampling** (Algorithm 2): the rho-warped sigma grid
  sigma_i = (sigma_max^(1/rho) + i/(N-1)*(sigma_min^(1/rho)-sigma_max^(1/rho)))^rho
  integrated by Heun's 2nd-order method on the probability-flow ODE
  dx/dsigma = (x - D(x; sigma)) / sigma, with optional stochastic churn
  (S_churn/S_tmin/S_tmax/S_noise). S_churn = 0 (the default) is the
  deterministic ODE sampler.

The reference's diffusion stack is DDPM/DDIM only (reference:
models/generative/diffusion/ddpm.py); this module is the third process
family on the shared machinery, mirroring
:mod:`~lightning_generative_models_tpu.models.diffusion.flow_matching`:
a stateless process over an ``apply_fn(x, t, self_cond) -> F`` closure,
samplers as ONE ``lax.scan`` over a host-precomputed node table, sigma fed
to the backbone's sinusoidal embedding as ``c_noise * time_scale`` so it
operates in the band it was designed for. :class:`EDM` subclasses
:class:`DDPM` swapping only the process object — EMA-in-TrainState, the
host-gated EMA step, classifier-free guidance (exact: D is affine in the
raw output F, so the linear CFG combine on F equals the combine on D),
per-class grids, checkpointing, and serving export are inherited unchanged.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightning_generative_models_tpu.parallel.mesh import data_shard
from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
    ApplyFn,
)
from lightning_generative_models_tpu.models.diffusion.latent_diffusion import (
    LatentDiffusion,
)

SOLVERS = ("heun", "euler")


class EDMProcess:
    """Karras preconditioned diffusion process.

    Exposes the same (p_losses / sample / interpolate) surface as
    :class:`GaussianDiffusion` / :class:`RectifiedFlow` so DDPM-family
    trainers stay process-agnostic. ``sigma_data`` should match the data's
    per-channel std: 0.5 for [-1,1]-normalized images (the paper's value),
    ~1.0 for unit-variance latents.
    """

    def __init__(
        self,
        img_size: int,
        channels: int = 3,
        sampling_steps: int = 18,
        solver: str = "heun",
        sigma_data: float = 0.5,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        time_scale: float = 250.0,
        auto_normalize: bool = True,
    ):
        if solver not in SOLVERS:
            raise ValueError(f"unknown EDM solver {solver!r}; pick from {SOLVERS}")
        if sigma_min <= 0 or sigma_max <= sigma_min:
            raise ValueError("need 0 < sigma_min < sigma_max")
        self.img_size = img_size
        self.channels = channels
        self.sampling_steps = int(sampling_steps)
        self.solver = solver
        self.sigma_data = float(sigma_data)
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.s_churn = float(s_churn)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.s_noise = float(s_noise)
        # c_noise = ln(sigma)/4 spans only ~[-1.55, 1.10] over the default
        # sigma range — far too narrow for a sinusoidal embedding built for
        # [0, 1000). time_scale stretches it (default 250 -> ~[-389, 274]);
        # the oracle tests invert this mapping, so it is part of the contract.
        self.time_scale = float(time_scale)
        self.auto_normalize = auto_normalize

    # -- normalization (same [0,1] <-> [-1,1] contract as GaussianDiffusion) --
    def normalize(self, x: jax.Array) -> jax.Array:
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0) if self.auto_normalize else x

    # -- preconditioning ------------------------------------------------------
    def coeffs(self, sigma: jax.Array):
        """(c_skip, c_out, c_in, c_noise) at ``sigma`` (elementwise)."""
        sd2 = self.sigma_data**2
        denom = sigma**2 + sd2
        c_skip = sd2 / denom
        c_out = sigma * self.sigma_data / jnp.sqrt(denom)
        c_in = 1.0 / jnp.sqrt(denom)
        c_noise = jnp.log(sigma) / 4.0
        return c_skip, c_out, c_in, c_noise

    def _denoise(self, apply_fn: ApplyFn, x: jax.Array, sigma: jax.Array):
        """D(x; sigma): the preconditioned denoiser. ``sigma`` is [b]."""
        c_skip, c_out, c_in, c_noise = self.coeffs(sigma)
        sb = sigma.reshape(-1, *((1,) * (x.ndim - 1)))
        c_skip_b, c_out_b, c_in_b = (
            c.reshape(sb.shape) for c in (c_skip, c_out, c_in)
        )
        f = apply_fn(c_in_b * x, c_noise * self.time_scale, None)
        return c_skip_b * x + c_out_b * f

    # -- training ---------------------------------------------------------------
    def p_losses(
        self, apply_fn: ApplyFn, x_start01: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """EDM training loss (Eq. 8) on a [0,1] image batch, computed in its
        weight-free form: with lambda(sigma)*c_out(sigma)^2 = 1, the weighted
        denoiser MSE equals a plain MSE of the raw network output F against
        (x0 - c_skip * x_t) / c_out."""
        b = x_start01.shape[0]
        sig_rng, noise_rng = jax.random.split(rng)
        x0 = self.normalize(x_start01)
        sigma = jnp.exp(
            self.p_mean + self.p_std * jax.random.normal(sig_rng, (b,))
        )
        noise = jax.random.normal(noise_rng, x0.shape)
        sb = sigma.reshape(b, *((1,) * (x0.ndim - 1)))
        x_t = x0 + sb * noise
        c_skip, c_out, c_in, c_noise = self.coeffs(sigma)
        c_skip_b, c_out_b, c_in_b = (
            c.reshape(sb.shape) for c in (c_skip, c_out, c_in)
        )
        f = apply_fn(c_in_b * x_t, c_noise * self.time_scale, None)
        target = (x0 - c_skip_b * x_t) / c_out_b
        return jnp.mean((f - target) ** 2)

    # -- sampling ---------------------------------------------------------------
    def sigma_grid(self, steps: int, sigma_start: Optional[float] = None):
        """Host-precomputed rho-warped sigma nodes (Eq. 5), appended 0."""
        hi = self.sigma_max if sigma_start is None else float(sigma_start)
        if steps <= 1:
            return np.asarray([hi, 0.0], np.float64)
        inv = 1.0 / self.rho
        i = np.arange(steps, dtype=np.float64)
        sig = (
            hi**inv + i / (steps - 1) * (self.sigma_min**inv - hi**inv)
        ) ** self.rho
        return np.append(sig, 0.0)

    def _integrate(
        self,
        apply_fn: ApplyFn,
        x: jax.Array,
        sigmas: np.ndarray,
        rng: jax.Array,
        method: str,
    ) -> jax.Array:
        """One compiled lax.scan running Algorithm 2 over the node table.
        ``method='euler'`` skips the 2nd-order correction (1 NFE/step);
        'heun' uses it on every non-final step (2 NFE/step - 1)."""
        b = x.shape[0]
        n = len(sigmas) - 1
        gammas = np.where(
            (sigmas[:-1] >= self.s_tmin) & (sigmas[:-1] <= self.s_tmax),
            min(self.s_churn / max(n, 1), math.sqrt(2.0) - 1.0),
            0.0,
        )
        rows = jnp.asarray(
            np.stack(
                [sigmas[:-1], sigmas[1:], gammas, np.arange(n) == n - 1],
                axis=1,
            ),
            jnp.float32,
        )

        def denoise(xi, sig):
            return self._denoise(apply_fn, xi, jnp.full((b,), sig))

        def step(carry, row):
            xi, key = carry
            key, sub = jax.random.split(key)
            sig, sig_next, gamma, is_last = row[0], row[1], row[2], row[3]
            # Churn: lift the noise level to sigma_hat, adding matched noise.
            # At s_churn=0 this adds exactly 0 and the step is deterministic.
            sig_hat = sig * (1.0 + gamma)
            eps = self.s_noise * jax.random.normal(sub, xi.shape)
            x_hat = xi + jnp.sqrt(jnp.maximum(sig_hat**2 - sig**2, 0.0)) * eps
            d = (x_hat - denoise(x_hat, sig_hat)) / sig_hat
            x_e = x_hat + (sig_next - sig_hat) * d
            if method == "euler":
                return (x_e, key), None
            # Heun correction, skipped on the final step (sigma_next = 0,
            # where D is evaluated at a clamped sigma and the result dropped).
            safe_next = jnp.maximum(sig_next, 1e-8)
            d2 = (x_e - denoise(x_e, safe_next)) / safe_next
            x_h = x_hat + (sig_next - sig_hat) * 0.5 * (d + d2)
            return (jnp.where(is_last > 0, x_e, x_h), key), None

        (x, _), _ = jax.lax.scan(step, (x, rng), rows)
        return x

    def sample(
        self,
        apply_fn: ApplyFn,
        batch_size: int,
        rng: jax.Array,
        method: Optional[str] = None,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """Sample from x ~ N(0, sigma_max^2 I) down the sigma grid. Diffusion/
        flow sampler names are rejected with a pointer to the EDM solvers."""
        method = method or self.solver
        if method not in SOLVERS:
            raise ValueError(
                f"unknown EDM sampling method {method!r}; EDM models use "
                f"{SOLVERS} (not ddpm/ddim/dpmpp/midpoint)"
            )
        steps = steps or self.sampling_steps
        shape = (batch_size, self.img_size, self.img_size, self.channels)
        init_rng, churn_rng = jax.random.split(rng)
        x = self.sigma_max * data_shard(jax.random.normal(init_rng, shape))
        sigmas = self.sigma_grid(steps)
        return self.unnormalize(
            self._integrate(apply_fn, x, sigmas, churn_rng, method)
        )

    # -- interpolation (same surface as GaussianDiffusion.interpolate) ----------
    def interpolate(
        self,
        apply_fn: ApplyFn,
        x1_01: jax.Array,
        x2_01: jax.Array,
        rng: jax.Array,
        t: Optional[float] = None,
        lam: float = 0.5,
    ) -> jax.Array:
        """Push both images to sigma(t) = exp(lerp(ln sigma_min, ln sigma_max,
        t)) with independent noises (the DDPM convention), mix, and integrate
        back down a truncated rho grid."""
        t = 0.9 if t is None else float(t)
        if not 0.0 < t <= 1.0:
            raise ValueError(f"EDM interpolation time must be in (0, 1], got {t}")
        sigma_t = math.exp(
            (1.0 - t) * math.log(self.sigma_min) + t * math.log(self.sigma_max)
        )
        n1, n2, churn_rng = jax.random.split(rng, 3)
        z1 = self.normalize(x1_01) + sigma_t * jax.random.normal(n1, x1_01.shape)
        z2 = self.normalize(x2_01) + sigma_t * jax.random.normal(n2, x2_01.shape)
        x = (1.0 - lam) * z1 + lam * z2
        steps = max(1, int(round(self.sampling_steps * t)))
        sigmas = self.sigma_grid(steps, sigma_start=sigma_t)
        return self.unnormalize(
            self._integrate(apply_fn, x, sigmas, churn_rng, self.solver)
        )


class EDM(DDPM):
    """EDM trainer model: backbone + EDMProcess + EMA weights.

    Everything except the process object is inherited from :class:`DDPM`
    (EMA-in-TrainState, host-gated EMA step, CFG via the doubled-batch
    guided closure — exact here because D(x; sigma) is affine in the raw
    network output F, per-class grids, checkpoint/serving surfaces). Not in
    the reference, whose diffusion stack is DDPM/DDIM only."""

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        dim: int = 64,
        sampling_steps: int = 18,
        solver: str = "heun",
        sigma_data: float = 0.5,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        time_scale: float = 250.0,
        lr: float = 2e-5,
        betas: Tuple[float, float] = (0.9, 0.99),
        ema_update_every: int = 10,
        ema_decay: float = 0.995,
        ema_update_after_step: int = 100,
        use_bf16: bool = True,
        flash_attn: bool = False,
        dim_mults: Tuple[int, ...] = (1, 2, 4, 8),
        num_classes: Optional[int] = None,
        cond_drop_prob: float = 0.1,
        guidance_scale: float = 3.0,
        **network_kwargs,
    ):
        super().__init__(
            img_channels=img_channels,
            img_size=img_size,
            dim=dim,
            lr=lr,
            betas=betas,
            ema_update_every=ema_update_every,
            ema_decay=ema_decay,
            ema_update_after_step=ema_update_after_step,
            self_condition=False,
            use_bf16=use_bf16,
            flash_attn=flash_attn,
            dim_mults=dim_mults,
            num_classes=num_classes,
            cond_drop_prob=cond_drop_prob,
            guidance_scale=guidance_scale,
            **network_kwargs,
        )
        self.diffusion = EDMProcess(
            img_size=img_size,
            channels=img_channels,
            sampling_steps=sampling_steps,
            solver=solver,
            sigma_data=sigma_data,
            p_mean=p_mean,
            p_std=p_std,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            rho=rho,
            s_churn=s_churn,
            s_tmin=s_tmin,
            s_tmax=s_tmax,
            s_noise=s_noise,
            time_scale=time_scale,
        )


class LatentEDM(LatentDiffusion):
    """EDM in a frozen VQ autoencoder's latent space (the arXiv:2112.10752
    latent recipe with the arXiv:2206.00364 objective), from the two existing
    pieces: LatentDiffusion's frozen-AE space hooks and EDMProcess. Latents
    are unbounded so the process runs with ``auto_normalize=False``;
    ``latent_scale`` should bring them near unit variance (the logged
    ``val_latent_std`` rule), and ``sigma_data`` defaults to 1.0 accordingly."""

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        autoencoder: Optional[dict] = None,
        latent_scale: float = 1.0,
        dim_mults=(1, 2, 4),
        sampling_steps: int = 18,
        solver: str = "heun",
        sigma_data: float = 1.0,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        time_scale: float = 250.0,
        **ddpm_kwargs,
    ):
        super().__init__(
            img_channels=img_channels,
            img_size=img_size,
            autoencoder=autoencoder,
            latent_scale=latent_scale,
            dim_mults=dim_mults,
            self_condition=False,
            **ddpm_kwargs,
        )
        self.diffusion = EDMProcess(
            img_size=self.latent_hw,
            channels=self.latent_c,
            sampling_steps=sampling_steps,
            solver=solver,
            sigma_data=sigma_data,
            p_mean=p_mean,
            p_std=p_std,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            rho=rho,
            s_churn=s_churn,
            s_tmin=s_tmin,
            s_tmax=s_tmax,
            s_noise=s_noise,
            time_scale=time_scale,
            auto_normalize=False,
        )
