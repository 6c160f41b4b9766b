"""Flow matching / rectified flow: linear-path generative ODEs (beyond reference).

The reference's generative-ODE coverage stops at DDPM/DDIM (reference:
models/generative/diffusion/ddpm.py); this module adds the modern
flow-matching family on the SAME UNet/EMA/CFG/trainer machinery:

- Conditional flow matching with the linear (rectified-flow) path
  x_t = (1-t)*x0 + t*eps, regressing the network onto the constant target
  velocity eps - x0 (Lipman et al. 2022, arXiv:2210.02747; Liu et al. 2022,
  arXiv:2209.03003).
- Logit-normal timestep sampling, the SD3 recipe that concentrates training
  where the velocity field is hardest (Esser et al. 2024, arXiv:2403.03206).
- Deterministic ODE samplers: Euler, midpoint (2nd order), and Heun
  (2nd order, Euler on the final node — the k-diffusion convention).

TPU design mirrors GaussianDiffusion: the process is a stateless object over
an ``apply_fn(x, t, self_cond) -> v`` closure, samplers are ONE ``lax.scan``
program over a host-precomputed node table (no host round-trips), and the
continuous time is fed to the UNet as ``t * time_scale`` so the sinusoidal
embedding operates in the same [0, 1000) band it was designed for.

``FlowMatching`` subclasses :class:`DDPM`, inheriting the EMA-in-TrainState
weights, the host-gated EMA train step, classifier-free guidance (velocity
is the raw network output, so the linear CFG combine u + w*(c-u) is exact),
per-class validation grids, checkpointing, and serving export unchanged —
only the process object differs.
"""

from __future__ import annotations

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

SOLVERS = ("euler", "midpoint", "heun")
TIME_SAMPLERS = ("uniform", "logit_normal")


class RectifiedFlow:
    """Linear-path conditional flow matching process.

    Convention: t=0 is data, t=1 is noise (matching diffusion's "large time
    = noisy"); sampling integrates dx/dt = v(x, t) from t=1 down to t=0.
    Exposes the same (p_losses / sample / interpolate) surface as
    :class:`GaussianDiffusion` so DDPM-family trainers are process-agnostic.
    """

    def __init__(
        self,
        img_size: int,
        channels: int = 3,
        sampling_steps: int = 50,
        solver: str = "euler",
        time_sampling: str = "uniform",
        logit_normal_mean: float = 0.0,
        logit_normal_std: float = 1.0,
        time_scale: float = 1000.0,
        auto_normalize: bool = True,
    ):
        if solver not in SOLVERS:
            raise ValueError(f"unknown flow solver {solver!r}; pick from {SOLVERS}")
        if time_sampling not in TIME_SAMPLERS:
            raise ValueError(
                f"unknown time_sampling {time_sampling!r}; pick from {TIME_SAMPLERS}"
            )
        self.img_size = img_size
        self.channels = channels
        self.sampling_steps = int(sampling_steps)
        self.solver = solver
        self.time_sampling = time_sampling
        self.logit_normal_mean = logit_normal_mean
        self.logit_normal_std = logit_normal_std
        self.time_scale = float(time_scale)
        self.auto_normalize = auto_normalize

    # -- normalization (same [0,1] <-> [-1,1] contract as GaussianDiffusion) --
    def normalize(self, x: jax.Array) -> jax.Array:
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0) if self.auto_normalize else x

    # -- training ---------------------------------------------------------------
    def _sample_times(self, rng: jax.Array, b: int) -> jax.Array:
        if self.time_sampling == "logit_normal":
            z = jax.random.normal(rng, (b,))
            return jax.nn.sigmoid(
                self.logit_normal_mean + self.logit_normal_std * z
            )
        return jax.random.uniform(rng, (b,))

    def p_losses(
        self, apply_fn: ApplyFn, x_start01: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """Conditional flow-matching MSE on a [0,1] image batch: the network
        at x_t = (1-t)x0 + t*eps regresses the path velocity eps - x0."""
        b = x_start01.shape[0]
        t_rng, noise_rng = jax.random.split(rng)
        x0 = self.normalize(x_start01)
        t = self._sample_times(t_rng, b)
        noise = jax.random.normal(noise_rng, x0.shape)
        t_b = t.reshape(b, *((1,) * (x0.ndim - 1)))
        x_t = (1.0 - t_b) * x0 + t_b * noise
        target = noise - x0
        out = apply_fn(x_t, t * self.time_scale, None)
        return jnp.mean((out - target) ** 2)

    # -- sampling ---------------------------------------------------------------
    def _integrate(
        self,
        apply_fn: ApplyFn,
        x: jax.Array,
        t_start: float,
        method: str,
        steps: int,
    ) -> jax.Array:
        """One compiled lax.scan integrating dx/dt = v from t_start to 0 over
        a uniform host-precomputed node table."""
        b = x.shape[0]
        ts = np.linspace(float(t_start), 0.0, steps + 1)
        # Rows: (t, t_next, is_last). is_last switches Heun to an Euler final
        # step — its corrector would need v at exactly t=0 where the target
        # field of real data is ill-conditioned (k-diffusion convention).
        rows = jnp.asarray(
            np.stack(
                [ts[:-1], ts[1:], np.arange(steps) == steps - 1], axis=1
            ),
            jnp.float32,
        )

        def eval_v(xi, t):
            return apply_fn(xi, jnp.full((b,), t) * self.time_scale, None)

        def step(carry, row):
            xi = carry
            t, t_next, is_last = row[0], row[1], row[2]
            dt = t_next - t
            v1 = eval_v(xi, t)
            if method == "euler":
                nxt = xi + dt * v1
            elif method == "midpoint":
                x_mid = xi + 0.5 * dt * v1
                nxt = xi + dt * eval_v(x_mid, t + 0.5 * dt)
            else:  # heun
                x_e = xi + dt * v1
                v2 = eval_v(x_e, t_next)
                nxt = jnp.where(is_last > 0, x_e, xi + 0.5 * dt * (v1 + v2))
            return nxt, None

        x, _ = jax.lax.scan(step, x, rows)
        return x

    def sample(
        self,
        apply_fn: ApplyFn,
        batch_size: int,
        rng: jax.Array,
        method: Optional[str] = None,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """Deterministic ODE sampling from x(1) ~ N(0, I). ``method`` picks
        the solver (default: the configured one); diffusion sampler names are
        rejected with a pointer to the flow solvers."""
        method = method or self.solver
        if method not in SOLVERS:
            raise ValueError(
                f"unknown flow sampling method {method!r}; flow-matching "
                f"models use {SOLVERS} (not ddpm/ddim/dpmpp)"
            )
        steps = steps or self.sampling_steps
        shape = (batch_size, self.img_size, self.img_size, self.channels)
        init_rng, _ = jax.random.split(rng)
        x = data_shard(jax.random.normal(init_rng, shape))
        return self.unnormalize(self._integrate(apply_fn, x, 1.0, method, steps))

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
        """Push both images to time ``t`` along their flow paths (independent
        noises, the DDPM convention), mix, and integrate back to t=0."""
        t = 0.9 if t is None else float(t)
        if not 0.0 < t <= 1.0:
            raise ValueError(f"flow interpolation time must be in (0, 1], got {t}")
        n1, n2 = jax.random.split(rng)
        z1 = (1.0 - t) * self.normalize(x1_01) + t * jax.random.normal(
            n1, x1_01.shape
        )
        z2 = (1.0 - t) * self.normalize(x2_01) + t * jax.random.normal(
            n2, x2_01.shape
        )
        x = (1.0 - lam) * z1 + lam * z2
        steps = max(1, int(round(self.sampling_steps * t)))
        return self.unnormalize(
            self._integrate(apply_fn, x, t, self.solver, steps)
        )


class FlowMatching(DDPM):
    """Rectified-flow trainer model: UNet + RectifiedFlow + EMA weights.

    Everything except the process object is inherited from :class:`DDPM`
    (EMA-in-TrainState, host-gated EMA step, CFG via the doubled-batch
    guided closure — exact here because velocity IS the raw network output,
    per-class grids, checkpoint/serving surfaces). Not in the reference,
    whose diffusion stack is DDPM/DDIM only."""

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        dim: int = 64,
        sampling_steps: int = 50,
        solver: str = "euler",
        time_sampling: str = "logit_normal",
        logit_normal_mean: float = 0.0,
        logit_normal_std: float = 1.0,
        time_scale: float = 1000.0,
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
            # Backbone selection (network="unet"|"dit" + DiT scale knobs)
            # passes straight through to DDPM — the flow is backbone-agnostic.
            **network_kwargs,
        )
        # Swap the process: the DDPM-built GaussianDiffusion is replaced by
        # the flow; every loss/sampler/EMA path goes through self.diffusion.
        self.diffusion = RectifiedFlow(
            img_size=img_size,
            channels=img_channels,
            sampling_steps=sampling_steps,
            solver=solver,
            time_sampling=time_sampling,
            logit_normal_mean=logit_normal_mean,
            logit_normal_std=logit_normal_std,
            time_scale=time_scale,
        )


class LatentFlowMatching(LatentDiffusion):
    """Rectified flow in a frozen VQ autoencoder's latent space — the SD3 /
    modern latent-generative recipe (latent space of arXiv:2112.10752 +
    flow-matching objective of arXiv:2403.03206), synthesized from the two
    existing pieces: LatentDiffusion's frozen-AE space hooks and
    RectifiedFlow's process. Latents are unbounded, so the flow runs with
    ``auto_normalize=False`` (the hooks already produce scaled latents);
    ``latent_scale`` should bring them near unit variance (the logged
    ``val_latent_std`` rule), which the linear path x_t = (1-t)z + t*eps
    assumes."""

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        autoencoder: Optional[dict] = None,
        latent_scale: float = 1.0,
        dim_mults=(1, 2, 4),
        sampling_steps: int = 50,
        solver: str = "euler",
        time_sampling: str = "logit_normal",
        logit_normal_mean: float = 0.0,
        logit_normal_std: float = 1.0,
        time_scale: float = 1000.0,
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
        self.diffusion = RectifiedFlow(
            img_size=self.latent_hw,
            channels=self.latent_c,
            sampling_steps=sampling_steps,
            solver=solver,
            time_sampling=time_sampling,
            logit_normal_mean=logit_normal_mean,
            logit_normal_std=logit_normal_std,
            time_scale=time_scale,
            auto_normalize=False,
        )
