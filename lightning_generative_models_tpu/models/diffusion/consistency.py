"""Consistency models trained with improved consistency training (iCT).

Beyond reference (its diffusion stack is DDPM/DDIM only — reference:
models/generative/diffusion/ddpm.py): consistency models (Song et al. 2023,
arXiv:2303.01469) learn a single network f(x, sigma) that maps ANY point of
the probability-flow ODE trajectory straight to its origin, so sampling is
one network evaluation (plus optional noise-and-denoise refinement steps) —
the modern low-latency serving recipe, ~50x fewer network evals than DDIM-50.
This module implements *improved consistency training* (Song & Dhariwal
2023, arXiv:2310.14189): training from scratch against the stop-gradient of
the same network (no distillation teacher, no EMA teacher), with the paper's
discretization curriculum, lognormal noise-index distribution and
pseudo-Huber metric.

Formulation (all on the EDM sigma axis shared with :mod:`.edm`):

- **Boundary-respecting preconditioning**:
  f(x; sigma) = c_skip(sigma) x + c_out(sigma) F(c_in(sigma) x, c_noise(sigma))
  with c_skip = sd^2/((sigma-sigma_min)^2 + sd^2),
  c_out = sd (sigma-sigma_min)/sqrt(sd^2+sigma^2), c_in = 1/sqrt(sd^2+sigma^2),
  c_noise = ln(sigma)/4 — so f(x; sigma_min) = x EXACTLY (the consistency
  boundary condition, arXiv:2303.01469 Appendix C), regression-tested.
- **Training** (arXiv:2310.14189 Alg. 1): per example draw a grid index i
  from the discrete lognormal p(i) ∝ erf((ln sigma_{i+1}-P_mean)/(√2 P_std))
  - erf((ln sigma_i-P_mean)/(√2 P_std)) over the N(k)-node Karras rho-grid,
  noise ONE draw z to both levels (x_i = x0 + sigma_i z,
  x_{i+1} = x0 + sigma_{i+1} z), and minimize
  lambda(sigma_i) d(f_theta(x_{i+1}), stopgrad f_theta(x_i)) with
  lambda = 1/(sigma_{i+1}-sigma_i) and the pseudo-Huber metric
  d(a,b) = sqrt(||a-b||^2 + c^2) - c, c = 0.00054 sqrt(D).
- **Discretization curriculum**: N(k) = min(s0 2^(k // K'), s1) + 1 nodes,
  K' = floor(K / (log2(s1/s0) + 1)) — doubles s0=10 up to s1=1280 over the
  configured ``curriculum_steps`` K. TPU-native: N(k) is computed from the
  traced step counter with closed-form sigma(i, N), and the index categorical
  runs over a STATIC s1-size table with -inf masking — ONE compiled train
  step covers the whole curriculum, no recompiles, no dynamic shapes.
- **Sampling** (arXiv:2303.01469 Alg. 1): x = f(sigma_max z; sigma_max),
  then for each extra step: re-noise to tau_j and map back with f. The tau
  schedule is the Karras rho-grid truncated to ``sampling_steps`` nodes; the
  loop is one ``lax.scan``. 1-2 steps is the operating regime.

Both network evals of the training loss run as ONE doubled-batch forward
(the CFG trick from :meth:`.ddpm.DDPM._guided_apply_fn` — a single 2B MXU
pass beats two B passes on TPU), with stop_gradient on the target half.

Everything else — EMA-in-TrainState (sampling uses the EMA weights, the
standard evaluation protocol), host-gated EMA step, CFG-dropout conditioning
(valid: f is affine in the raw output F, so the linear CFG combine on F
equals the combine on f), per-class grids, checkpointing, serving export —
is inherited from :class:`~.ddpm.DDPM` unchanged.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lightning_generative_models_tpu.models.diffusion.ddpm import DDPM
from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
    ApplyFn,
)
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.parallel.mesh import data_shard

SOLVERS = ("onestep", "multistep")


class ConsistencyProcess:
    """iCT consistency process over an ``apply_fn(x, t, self_cond) -> F``
    closure — the same stateless-process surface as
    :class:`~.gaussian_diffusion.GaussianDiffusion`,
    :class:`~.flow_matching.RectifiedFlow` and :class:`~.edm.EDMProcess`,
    so the DDPM-family trainer machinery stays process-agnostic.

    ``curriculum_steps`` (K) should match the planned training length
    (``--max_steps``); the discretization N(k) then doubles from ``s0`` to
    ``s1`` on schedule. 0 disables the curriculum (fixed N = s1 + 1 nodes,
    also what evaluation without a step uses).
    """

    def __init__(
        self,
        img_size: int,
        channels: int = 3,
        sampling_steps: int = 2,
        s0: int = 10,
        s1: int = 1280,
        curriculum_steps: int = 100_000,
        p_mean: float = -1.1,
        p_std: float = 2.0,
        sigma_data: float = 0.5,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        huber_c: Optional[float] = None,
        time_scale: float = 250.0,
        auto_normalize: bool = True,
    ):
        if sigma_min <= 0 or sigma_max <= sigma_min:
            raise ValueError("need 0 < sigma_min < sigma_max")
        if s0 < 2 or s1 < s0:
            raise ValueError(f"need 2 <= s0 <= s1, got s0={s0}, s1={s1}")
        self.img_size = img_size
        self.channels = channels
        self.sampling_steps = int(sampling_steps)
        self.s0 = int(s0)
        self.s1 = int(s1)
        self.curriculum_steps = int(curriculum_steps)
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)
        self.sigma_data = float(sigma_data)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        dim = img_size * img_size * channels
        # arXiv:2310.14189 §3.3: c = 0.00054 sqrt(d) for d data dimensions.
        self.huber_c = (
            0.00054 * math.sqrt(dim) if huber_c is None else float(huber_c)
        )
        # Same sinusoidal-band stretch as EDMProcess (c_noise spans ~[-1.55,
        # 1.10]; the backbone's embedding was built for [0, 1000)).
        self.time_scale = float(time_scale)
        self.auto_normalize = auto_normalize

    # -- normalization (same [0,1] <-> [-1,1] contract as the siblings) -------
    def normalize(self, x: jax.Array) -> jax.Array:
        return x * 2.0 - 1.0 if self.auto_normalize else x

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0) if self.auto_normalize else x

    # -- preconditioning ------------------------------------------------------
    def coeffs(self, sigma: jax.Array):
        """(c_skip, c_out, c_in, c_noise) at ``sigma`` — the
        boundary-respecting variant: c_skip(sigma_min) = 1 and
        c_out(sigma_min) = 0, so f(x, sigma_min) = x exactly."""
        sd2 = self.sigma_data**2
        shifted = sigma - self.sigma_min
        c_skip = sd2 / (shifted**2 + sd2)
        c_out = shifted * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        c_noise = jnp.log(sigma) / 4.0
        return c_skip, c_out, c_in, c_noise

    def denoise(self, apply_fn: ApplyFn, x: jax.Array, sigma: jax.Array):
        """f(x; sigma): the consistency function. ``sigma`` is [b]."""
        c_skip, c_out, c_in, c_noise = self.coeffs(sigma)
        sb_shape = (-1,) + (1,) * (x.ndim - 1)
        f = apply_fn(
            c_in.reshape(sb_shape) * x, c_noise * self.time_scale, None
        )
        return c_skip.reshape(sb_shape) * x + c_out.reshape(sb_shape) * f

    # -- curriculum -----------------------------------------------------------
    def n_intervals(self, step) -> jax.Array:
        """N(k): number of grid INTERVALS at train step ``step`` (the grid
        has N+1 nodes) — min(s0 * 2^(step // K'), s1), arXiv:2310.14189
        Eq. 11. Closed-form in the traced step counter: one compiled train
        step serves the whole curriculum."""
        if self.curriculum_steps <= 0:
            return jnp.asarray(self.s1, jnp.int32)
        n_doublings = math.log2(self.s1 / self.s0) + 1.0
        k_prime = max(int(self.curriculum_steps / n_doublings), 1)
        stage = jnp.clip(
            jnp.asarray(step, jnp.int32) // k_prime, 0, 30
        ).astype(jnp.float32)
        n = self.s0 * jnp.exp2(stage)
        return jnp.minimum(n, float(self.s1)).astype(jnp.int32)

    def sigma_of_index(self, i: jax.Array, n: jax.Array) -> jax.Array:
        """sigma at ascending grid node ``i`` of an (n+1)-node Karras
        rho-grid: sigma_0 = sigma_min, sigma_n = sigma_max (closed form —
        no materialized table, so ``n`` may be traced)."""
        inv = 1.0 / self.rho
        frac = i.astype(jnp.float32) / jnp.maximum(
            n.astype(jnp.float32), 1.0
        )
        lo, hi = self.sigma_min**inv, self.sigma_max**inv
        return (lo + frac * (hi - lo)) ** self.rho

    def _index_logits(self, n: jax.Array) -> jax.Array:
        """Log-probabilities of the lognormal index distribution over the
        STATIC [s1] index table, masked to the live i < n entries
        (arXiv:2310.14189 Eq. 15)."""
        idx = jnp.arange(self.s1, dtype=jnp.float32)
        s_lo = self.sigma_of_index(idx, n)
        s_hi = self.sigma_of_index(idx + 1.0, n)
        root2 = math.sqrt(2.0)
        w = jax.scipy.special.erf(
            (jnp.log(s_hi) - self.p_mean) / (root2 * self.p_std)
        ) - jax.scipy.special.erf(
            (jnp.log(s_lo) - self.p_mean) / (root2 * self.p_std)
        )
        live = idx < n.astype(jnp.float32)
        return jnp.where(live, jnp.log(jnp.maximum(w, 1e-20)), -jnp.inf)

    # -- training -------------------------------------------------------------
    def p_losses(
        self,
        apply_fn: ApplyFn,
        x_start01: jax.Array,
        rng: jax.Array,
        step=None,
    ) -> jax.Array:
        """iCT consistency loss on a [0,1] image batch. ``step`` drives the
        discretization curriculum; None (the eval path) uses the terminal
        N = s1 discretization."""
        b = x_start01.shape[0]
        idx_rng, noise_rng = jax.random.split(rng)
        x0 = self.normalize(x_start01)
        n = self.n_intervals(step) if step is not None else jnp.asarray(
            self.s1, jnp.int32
        )

        logits = self._index_logits(n)
        i = jax.random.categorical(
            idx_rng, jnp.broadcast_to(logits, (b, self.s1))
        ).astype(jnp.float32)
        sig_lo = self.sigma_of_index(i, n)
        sig_hi = self.sigma_of_index(i + 1.0, n)

        z = jax.random.normal(noise_rng, x0.shape)
        sb = (b,) + (1,) * (x0.ndim - 1)
        x_lo = x0 + sig_lo.reshape(sb) * z  # SAME z at both levels
        x_hi = x0 + sig_hi.reshape(sb) * z

        # One doubled-batch forward for both evals (a single 2B MXU pass
        # beats two B passes); the stop_gradient on the target half cuts
        # the backward to the online half only.
        f2 = self.denoise(
            apply_fn,
            jnp.concatenate([x_hi, x_lo]),
            jnp.concatenate([sig_hi, sig_lo]),
        )
        f_online, f_target = f2[:b], jax.lax.stop_gradient(f2[b:])

        diff2 = jnp.sum(
            (f_online - f_target) ** 2, axis=tuple(range(1, x0.ndim))
        )
        huber = jnp.sqrt(diff2 + self.huber_c**2) - self.huber_c
        lam = 1.0 / (sig_hi - sig_lo)
        return jnp.mean(lam * huber)

    # -- sampling -------------------------------------------------------------
    def tau_grid(self, steps: int, sigma_start: Optional[float] = None):
        """Descending noise levels for multistep sampling: ``steps`` nodes of
        the Karras rho-grid from sigma_start (default sigma_max) down to
        sigma_min (host-precomputed, arXiv:2303.01469 uses hand-picked
        midpoints; the rho-grid truncation is the standard generic choice)."""
        import numpy as np

        hi = self.sigma_max if sigma_start is None else float(sigma_start)
        if steps <= 1:
            return np.asarray([hi], np.float64)
        inv = 1.0 / self.rho
        i = np.arange(steps, dtype=np.float64)
        return (
            hi**inv + i / (steps - 1) * (self.sigma_min**inv - hi**inv)
        ) ** self.rho

    def _multistep(
        self,
        apply_fn: ApplyFn,
        x: jax.Array,
        taus,
        rng: jax.Array,
    ) -> jax.Array:
        """arXiv:2303.01469 Alg. 1: f at the start level, then per extra
        level re-noise to tau and map back — one ``lax.scan``."""
        b = x.shape[0]
        x = self.denoise(apply_fn, x, jnp.full((b,), float(taus[0])))
        if len(taus) == 1:
            return x
        rows = jnp.asarray(taus[1:], jnp.float32)

        def step(carry, tau):
            xi, key = carry
            key, sub = jax.random.split(key)
            std = jnp.sqrt(jnp.maximum(tau**2 - self.sigma_min**2, 0.0))
            x_t = xi + std * jax.random.normal(sub, xi.shape)
            xi = self.denoise(apply_fn, x_t, jnp.full((b,), 1.0) * tau)
            return (xi, key), None

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
        """Sample from x ~ N(0, sigma_max^2 I). ``onestep`` is a single f
        eval; ``multistep`` (default) uses ``sampling_steps`` noise-and-map
        refinements. Diffusion/flow sampler names are rejected."""
        method = method or (
            "onestep" if self.sampling_steps <= 1 else "multistep"
        )
        if method not in SOLVERS:
            raise ValueError(
                f"unknown consistency sampling method {method!r}; consistency "
                f"models use {SOLVERS} (not ddpm/ddim/dpmpp/heun/euler)"
            )
        steps = 1 if method == "onestep" else (steps or self.sampling_steps)
        shape = (batch_size, self.img_size, self.img_size, self.channels)
        init_rng, walk_rng = jax.random.split(rng)
        x = self.sigma_max * data_shard(jax.random.normal(init_rng, shape))
        return self.unnormalize(
            self._multistep(apply_fn, x, self.tau_grid(steps), walk_rng)
        )

    # -- interpolation (same surface as the sibling processes) ----------------
    def interpolate(
        self,
        apply_fn: ApplyFn,
        x1_01: jax.Array,
        x2_01: jax.Array,
        rng: jax.Array,
        t: Optional[float] = None,
        lam: float = 0.5,
    ) -> jax.Array:
        """Noise both images to sigma(t) (log-lerp of the sigma range), mix,
        and map back with ONE consistency eval — the natural CT analogue of
        the DDPM interpolate contract."""
        t = 0.9 if t is None else float(t)
        if not 0.0 < t <= 1.0:
            raise ValueError(
                f"consistency interpolation time must be in (0, 1], got {t}"
            )
        sigma_t = math.exp(
            (1.0 - t) * math.log(self.sigma_min) + t * math.log(self.sigma_max)
        )
        n1, n2 = jax.random.split(rng)
        z1 = self.normalize(x1_01) + sigma_t * jax.random.normal(n1, x1_01.shape)
        z2 = self.normalize(x2_01) + sigma_t * jax.random.normal(n2, x2_01.shape)
        x = (1.0 - lam) * z1 + lam * z2
        b = x.shape[0]
        return self.unnormalize(
            self.denoise(apply_fn, x, jnp.full((b,), sigma_t))
        )


class ConsistencyModel(DDPM):
    """Consistency model trainer: backbone + ConsistencyProcess + EMA.

    Inherits the whole DDPM trainer surface (EMA-in-TrainState, host-gated
    EMA step, CFG conditioning, per-class grids, checkpoint/serving); swaps
    the process and threads the step counter into the loss for the
    discretization curriculum. Not in the reference (diffusion there is
    DDPM/DDIM only).
    """

    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 32,
        dim: int = 64,
        sampling_steps: int = 2,
        s0: int = 10,
        s1: int = 1280,
        curriculum_steps: int = 100_000,
        p_mean: float = -1.1,
        p_std: float = 2.0,
        sigma_data: float = 0.5,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        huber_c: Optional[float] = None,
        time_scale: float = 250.0,
        lr: float = 1e-4,
        betas: Tuple[float, float] = (0.9, 0.995),
        ema_update_every: int = 10,
        ema_decay: float = 0.9999,
        ema_update_after_step: int = 100,
        use_bf16: bool = True,
        flash_attn: bool = False,
        dim_mults: Tuple[int, ...] = (1, 2, 4, 8),
        num_classes: Optional[int] = None,
        cond_drop_prob: float = 0.1,
        guidance_scale: float = 1.5,
        **network_kwargs,
    ):
        if network_kwargs.get("num_experts"):
            raise ValueError(
                "ConsistencyModel does not support MoE backbones (the "
                "doubled-batch consistency loss would need per-half router "
                "aux bookkeeping; use EDM/DDPM for DiT-MoE)"
            )
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
        self.diffusion = ConsistencyProcess(
            img_size=img_size,
            channels=img_channels,
            sampling_steps=sampling_steps,
            s0=s0,
            s1=s1,
            curriculum_steps=curriculum_steps,
            p_mean=p_mean,
            p_std=p_std,
            sigma_data=sigma_data,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            rho=rho,
            huber_c=huber_c,
            time_scale=time_scale,
        )

    def grad_step(self, state, batch, rng):
        """DDPM.grad_step with the step counter threaded into the loss (the
        discretization curriculum) — the MoE branch is rejected at
        construction, so only the plain path is needed."""
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, loss_rng, drop_rng = jax.random.split(rng, 3)
        prepared = prepare_batch(batch, aug_rng, train=True)
        x01 = self._to_diffusion_space(state, prepared["image"])

        labels = None
        if self.num_classes:
            labels = prepared["label"].astype(jnp.int32)
            drop = jax.random.bernoulli(
                drop_rng, self.cond_drop_prob, labels.shape
            )
            labels = jnp.where(drop, self.null_labels(labels.shape[0]), labels)
            # The consistency loss evaluates the network on the DOUBLED
            # batch [online; target]; both halves condition on the same
            # (CFG-dropped) labels.
            labels = jnp.concatenate([labels, labels])

        def loss_fn(params):
            return self.diffusion.p_losses(
                self._apply_fn(params, labels), x01, loss_rng,
                step=state.step,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params["model"])
        return grads, {
            "loss": loss,
            "ct_intervals": self.diffusion.n_intervals(state.step),
        }

    def eval_step(self, state, batch, rng):
        """DDPM.eval_step with labels doubled for the 2B consistency loss
        (EMA weights, true labels, terminal discretization via step=None)."""
        prepared = prepare_batch(batch, train=False)
        x01 = self._to_diffusion_space(state, prepared["image"])
        labels = None
        if self.num_classes:
            lab = prepared["label"].astype(jnp.int32)
            labels = jnp.concatenate([lab, lab])
        loss = self.diffusion.p_losses(
            self._apply_fn(state.ema_params, labels), x01,
            jax.random.fold_in(rng, 1),
        )
        return {"val_loss": loss}
