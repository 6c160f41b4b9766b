"""DDPM trainer model: UNet + GaussianDiffusion + EMA weights.

Parity with the reference DDPM LightningModule (reference:
models/generative/diffusion/ddpm.py:949-1094): wraps a ``dim``-wide UNet and
a GaussianDiffusion with the config's timesteps; Adam with config ``betas``;
trains the raw model and *validates/samples with the EMA weights*
(ddpm.py:1014, 1033); EMA updated every ``ema_update_every`` steps with decay
``ema_decay`` (ddpm.py:998); DDIM is selected when ``sampling_timesteps`` <
``diffusion_timesteps`` (the reference's ddim.json is a config of this same
class).

TPU design: the EMA weights are part of TrainState (no module copy) and the
EMA update is a ``lax.cond``-gated tree-map inside the jitted train step.
EMA warmup follows ema_pytorch's gating only in shape (hard copy before
``update_after_step``, constant decay after) — the reference library's
inv-gamma/power ramp is replaced by this simpler, documented policy.
Sampling runs the whole denoise chain as one compiled ``lax.scan`` program
on device; with bf16 UNet compute (``param_dtype`` stays f32).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lightning_generative_models_tpu.models.base import (
    Batch,
    GenerativeModel,
    Metrics,
)
from lightning_generative_models_tpu.models.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
)
from lightning_generative_models_tpu.models.diffusion.unet import UNet
from lightning_generative_models_tpu.ops.preprocess import prepare_batch
from lightning_generative_models_tpu.train.state import (
    TrainState,
    default_mu_dtype,
    default_nu_dtype,
    ema_update,
    with_nu_dtype,
)


class DDPM(GenerativeModel):
    def __init__(
        self,
        img_channels: int = 3,
        img_size: int = 64,
        dim: int = 64,
        diffusion_timesteps: int = 1000,
        sampling_timesteps: Optional[int] = None,
        lr: float = 2e-5,
        betas: Tuple[float, float] = (0.9, 0.99),
        ema_update_every: int = 10,
        ema_decay: float = 0.995,
        ema_update_after_step: int = 100,
        objective: str = "pred_v",
        beta_schedule: str = "sigmoid",
        min_snr_loss_weight: bool = False,
        min_snr_gamma: float = 5.0,
        self_condition: bool = False,
        offset_noise_strength: float = 0.0,
        use_bf16: bool = True,
        flash_attn: bool = False,
        dim_mults: Tuple[int, ...] = (1, 2, 4, 8),
        num_classes: Optional[int] = None,
        cond_drop_prob: float = 0.1,
        guidance_scale: float = 3.0,
        network: str = "unet",
        patch_size: int = 2,
        depth: int = 12,
        num_heads: int = 6,
        mlp_ratio: float = 4.0,
        qkv_layout: str = "s3hd",
        seq_parallel: bool = False,
        num_experts: int = 0,
        capacity_factor: float = 1.25,
        moe_every: int = 2,
        moe_aux_weight: float = 0.01,
        pipeline_stages: int = 0,
        pipeline_microbatches: int = 0,
        einsum_attn: bool = False,
        pp_fused_attn: bool = False,
    ):
        """``num_classes`` enables class-conditional training with
        classifier-free guidance (beyond reference — the reference diffusion
        stack is unconditional; its conditional models are CGAN/ACGAN):
        labels are dropped to a learned null token with probability
        ``cond_drop_prob`` during training (Ho & Salimans 2022,
        arXiv:2207.12598), and sampling combines the conditional and
        unconditional predictions as u + w*(c - u) with w =
        ``guidance_scale`` (w=1 → purely conditional, w=0 → unconditional).

        ``network`` selects the denoiser backbone: ``"unet"`` (reference
        parity) or ``"dit"`` (Diffusion Transformer, arXiv:2212.09748 —
        beyond reference; see models/diffusion/dit.py). For DiT, ``dim`` is
        the hidden width and ``patch_size``/``depth``/``num_heads``/
        ``mlp_ratio`` select the scale; ``dim_mults``/``flash_attn`` keep
        their meaning where applicable (flash_attn gates the Pallas SDPA
        kernel in both backbones).
        """
        super().__init__(img_channels, img_size)
        self.ema_update_every = ema_update_every
        self.ema_decay = ema_decay
        self.ema_update_after_step = ema_update_after_step
        self.num_classes = int(num_classes or 0)
        self.cond_drop_prob = cond_drop_prob
        self.guidance_scale = guidance_scale
        self.moe_aux_weight = moe_aux_weight

        if network == "dit":
            if self_condition:
                raise ValueError(
                    "network='dit' does not support self_condition"
                )
            from lightning_generative_models_tpu.models.diffusion.dit import DiT

            self.unet = DiT(
                hidden=dim,
                depth=depth,
                heads=num_heads,
                patch_size=patch_size,
                channels=img_channels,
                mlp_ratio=mlp_ratio,
                num_classes=num_classes,
                flash_attn=flash_attn,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                qkv_layout=qkv_layout,
                seq_parallel=seq_parallel,
                num_experts=num_experts,
                capacity_factor=capacity_factor,
                moe_every=moe_every,
                pipeline_stages=pipeline_stages,
                pipeline_microbatches=pipeline_microbatches,
                einsum_attn=einsum_attn,
                pp_fused_attn=pp_fused_attn,
            )
        elif network == "unet":
            if qkv_layout != "s3hd":
                raise ValueError(
                    "qkv_layout applies to the DiT backbone only (the UNet "
                    "does not use packed-qkv attention)"
                )
            if seq_parallel:
                raise ValueError(
                    "seq_parallel applies to the DiT backbone only (see "
                    "models/diffusion/dit.py seq_shard)"
                )
            if num_experts:
                raise ValueError(
                    "num_experts (MoE) applies to the DiT backbone only "
                    "(see models/modules/moe.py)"
                )
            if pipeline_stages:
                raise ValueError(
                    "pipeline_stages applies to the DiT backbone only "
                    "(see models/diffusion/pipeline.py)"
                )
            if einsum_attn:
                raise ValueError(
                    "einsum_attn applies to the DiT backbone only (the "
                    "UNet does not use packed-qkv attention)"
                )
            if pp_fused_attn:
                raise ValueError(
                    "pp_fused_attn applies to the pipeline-parallel DiT "
                    "backbone only (the UNet has no pipeline stages)"
                )
            self.unet = UNet(
                dim=dim,
                dim_mults=tuple(dim_mults),
                channels=img_channels,
                self_condition=self_condition,
                num_classes=num_classes,
                flash_attn=flash_attn,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
            )
        else:
            raise ValueError(
                f"unknown network {network!r}; pick 'unet' or 'dit'"
            )
        if sampling_timesteps is not None:
            sampling_timesteps = min(sampling_timesteps, diffusion_timesteps)
        self.diffusion = GaussianDiffusion(
            img_size=img_size,
            channels=img_channels,
            timesteps=diffusion_timesteps,
            sampling_timesteps=sampling_timesteps,
            objective=objective,
            beta_schedule=beta_schedule,
            min_snr_loss_weight=min_snr_loss_weight,
            min_snr_gamma=min_snr_gamma,
            self_condition=self_condition,
            offset_noise_strength=offset_noise_strength,
        )
        self.optimizer = with_nu_dtype(
            optax.adam(lr, b1=betas[0], b2=betas[1], mu_dtype=default_mu_dtype()),
            default_nu_dtype(),
        )

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        x = jnp.zeros((1, *self.image_shape()))
        t = jnp.zeros((1,), jnp.int32)
        kwargs = (
            {"labels": jnp.zeros((1,), jnp.int32)} if self.num_classes else {}
        )
        params = self.unet.init(rng, x, t, **kwargs)["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"model": params},
            mutable={},
            opt_state={"model": self.optimizer.init(params)},
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )

    def _apply_fn(self, params, labels=None):
        """UNet apply closure for GaussianDiffusion. For a conditional model
        ``labels`` rides in the closure so every sampler/loss path stays
        label-agnostic; unconditional models ignore it."""
        if self.num_classes:
            if labels is None:
                raise ValueError(
                    "conditional DDPM: _apply_fn requires labels "
                    "(use null_labels(B) for unconditional)"
                )

            def apply(x, t, x_self_cond=None):
                return self.unet.apply(
                    {"params": params}, x, t, x_self_cond, labels=labels
                )

            return apply

        def apply(x, t, x_self_cond=None):
            return self.unet.apply({"params": params}, x, t, x_self_cond)

        return apply

    # -- diffusion-space hooks (identity in pixel space) ----------------------
    # LatentDiffusion overrides these two to run the SAME losses, samplers
    # and EMA machinery in a frozen autoencoder's latent space: _to_ encodes
    # a [0,1] image batch into the diffusion space, _from_ maps a diffusion-
    # space sample back to [0,1] images.
    def _to_diffusion_space(self, state: TrainState, x01: jax.Array) -> jax.Array:
        return x01

    def _from_diffusion_space(self, state: TrainState, z: jax.Array) -> jax.Array:
        return z

    def null_labels(self, batch: int) -> jax.Array:
        """The learned null (unconditional) token, broadcast to a batch."""
        return jnp.full((batch,), self.unet.null_class, jnp.int32)

    def _guided_apply_fn(self, params, labels, w):
        """Classifier-free-guided closure: one UNet eval on the doubled
        batch [cond; uncond] (a single 2B MXU pass beats two B passes on
        TPU), combined as u + w*(c - u) on the raw network output — valid
        for every objective parameterization (eps/x0/v are all linear in
        the network output)."""
        b = labels.shape[0]
        lab2 = jnp.concatenate([labels.astype(jnp.int32), self.null_labels(b)])

        def apply(x, t, x_self_cond=None):
            x2 = jnp.concatenate([x, x])
            t2 = jnp.concatenate([t, t])
            sc2 = (
                None if x_self_cond is None
                else jnp.concatenate([x_self_cond, x_self_cond])
            )
            out = self.unet.apply({"params": params}, x2, t2, sc2, labels=lab2)
            c, u = out[:b], out[b:]
            return u + w * (c - u)

        return apply

    def summary_spec(self):
        """Per-layer UNet table (reference torchinfo summary, ddpm.py:1061-1094)."""
        kwargs = (
            {"labels": jnp.zeros((1,), jnp.int32)} if self.num_classes else {}
        )
        return {
            "unet": (
                self.unet,
                (
                    jnp.zeros((1, *self.image_shape())),
                    jnp.zeros((1,), jnp.int32),
                ),
                kwargs,
            )
        }

    # -- steps ------------------------------------------------------------------
    def grad_step(self, state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, loss_rng, drop_rng = jax.random.split(rng, 3)
        prepared = prepare_batch(batch, aug_rng, train=True)
        x01 = self._to_diffusion_space(state, prepared["image"])

        labels = None
        if self.num_classes:
            # Classifier-free-guidance dropout: each example's label falls
            # to the null token with prob cond_drop_prob (arXiv:2207.12598).
            labels = prepared["label"].astype(jnp.int32)
            drop = jax.random.bernoulli(
                drop_rng, self.cond_drop_prob, labels.shape
            )
            labels = jnp.where(drop, self.null_labels(labels.shape[0]), labels)

        is_moe = getattr(self.unet, "num_experts", 0) > 0

        def loss_fn(params):
            if not is_moe:
                return self.diffusion.p_losses(
                    self._apply_fn(params, labels), x01, loss_rng
                ), 0.0
            # MoE: collect the routers' sown load-balancing losses. The
            # training loss path calls the network exactly once (DiT has no
            # self-conditioning), so the trace-time box holds one entry.
            aux_box = []

            def apply(x, t, x_self_cond=None):
                variables = {"params": params}
                kwargs = {"labels": labels} if self.num_classes else {}
                out, col = self.unet.apply(
                    variables, x, t, x_self_cond,
                    mutable=["intermediates"], **kwargs
                )
                leaves = jax.tree_util.tree_leaves(col)
                aux_box.append(
                    sum(jnp.mean(v) for v in leaves) / max(len(leaves), 1)
                )
                return out

            main = self.diffusion.p_losses(apply, x01, loss_rng)
            aux = aux_box[0]
            return main + self.moe_aux_weight * aux, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["model"]
        )
        metrics = {"loss": loss}
        if is_moe:
            metrics["moe_aux"] = aux
        return grads, metrics

    def apply_grad_step(self, state: TrainState, grads, metrics,
                        do_ema: bool = True):
        updates, new_opt = self.optimizer.update(
            grads, state.opt_state["model"], state.params["model"]
        )
        new_params = optax.apply_updates(state.params["model"], updates)

        # EMA (reference ddpm.py:998, 1047-1048): hard copy during warmup,
        # decay-EMA every `ema_update_every` steps after. Branch-free: a
        # per-step effective decay (0 = copy, 1 = keep, ema_decay = update)
        # through the same ema_update arithmetic produces bit-identical
        # values, and unlike a lax.cond it fuses into the optimizer-update
        # fusions (the cond materialized ~0.5 ms/step of whole-tree copies
        # in the round-2 profile). ``do_ema=False`` (static) drops the
        # tree-map entirely — the trainer compiles both variants and skips
        # the EMA's ~360 MB/step of HBM traffic on the 9-in-10 steps whose
        # effective decay would be 1.0 (see train_step_gated).
        step = state.step + 1
        if do_ema:
            decay_eff = jnp.where(
                step <= self.ema_update_after_step,
                0.0,
                jnp.where(
                    step % self.ema_update_every == 0, self.ema_decay, 1.0
                ),
            )
            new_ema = ema_update(state.ema_params, new_params, decay_eff)
        else:
            new_ema = state.ema_params

        new_state = state.replace(
            step=step,
            params={"model": new_params},
            opt_state={"model": new_opt},
            ema_params=new_ema,
        )
        return new_state, {
            ("train_loss" if k == "loss" else f"train_{k}"): v
            for k, v in metrics.items()
        }

    def train_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        return self.apply_grad_step(state, *self.grad_step(state, batch, rng))

    def ema_step_needed(self, next_step: int) -> bool:
        """True when step ``next_step`` (1-based) changes the EMA tree."""
        return (
            next_step <= self.ema_update_after_step
            or next_step % self.ema_update_every == 0
        )

    def train_step_gated(
        self, state: TrainState, batch: Batch, rng: jax.Array, do_ema: bool
    ) -> Tuple[TrainState, Metrics]:
        """Host-gated EMA train step: jit once with ``do_ema=True`` and once
        with ``False``; call the True variant only when
        :meth:`ema_step_needed` says this step updates the EMA. Identical
        math to :meth:`train_step` at every step."""
        return self.apply_grad_step(
            state, *self.grad_step(state, batch, rng), do_ema=do_ema
        )

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array) -> Metrics:
        prepared = prepare_batch(batch, train=False)
        x01 = self._to_diffusion_space(state, prepared["image"])
        labels = (
            prepared["label"].astype(jnp.int32) if self.num_classes else None
        )
        # Validate with the EMA model (reference ddpm.py:1014); conditional
        # models validate on the true labels (no CFG dropout).
        loss = self.diffusion.p_losses(
            self._apply_fn(state.ema_params, labels), x01,
            jax.random.fold_in(rng, 1),
        )
        return {"val_loss": loss}

    def sample(
        self,
        state: TrainState,
        rng: jax.Array,
        num_samples: int,
        method: Optional[str] = None,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """EMA-model sampling; default method keeps the reference convention
        (DDIM iff sampling_timesteps < timesteps). method="dpmpp" selects the
        DPM-Solver++(2M) ODE solver (beyond reference; ~2-3x fewer UNet evals
        at comparable quality), with `steps` overriding the NFE count.

        Conditional models sample cycling labels 0..num_classes-1 with
        classifier-free guidance (CGAN's grid convention, cgan.py:213-218)."""
        if self.num_classes:
            labels = jnp.arange(num_samples) % self.num_classes
            return self.sample_classes(
                state, rng, labels, method=method, steps=steps
            )
        z = self.diffusion.sample(
            self._apply_fn(state.ema_params), num_samples, rng,
            method=method, steps=steps,
        )
        return self._from_diffusion_space(state, z)

    def sample_classes(
        self,
        state: TrainState,
        rng: jax.Array,
        labels: jax.Array,
        guidance_scale: Optional[float] = None,
        method: Optional[str] = None,
        steps: Optional[int] = None,
    ) -> jax.Array:
        """Classifier-free-guided sampling of the given classes (conditional
        models only). ``guidance_scale`` defaults to the constructor's."""
        if not self.num_classes:
            raise ValueError("sample_classes requires DDPM(num_classes=...)")
        labels = jnp.asarray(labels, jnp.int32)
        w = self.guidance_scale if guidance_scale is None else guidance_scale
        apply_fn = self._guided_apply_fn(state.ema_params, labels, w)
        z = self.diffusion.sample(
            apply_fn, labels.shape[0], rng, method=method, steps=steps
        )
        return self._from_diffusion_space(state, z)

    def validation_grids(self, state: TrainState, rng: jax.Array):
        """Per-class grid: row r = 4 guided samples of class r (CGAN's
        validation convention, cgan.py:227-230), conditional models only."""
        if not self.num_classes:
            return {}
        labels = jnp.repeat(jnp.arange(self.num_classes), 4)
        return {"per_class_generation": self.sample_classes(state, rng, labels)}

    def sample_raw(self, state: TrainState, rng: jax.Array, num_samples: int):
        """Sampling with the raw (non-EMA) weights, for diagnostics."""
        if self.num_classes:
            labels = jnp.arange(num_samples) % self.num_classes
            w = self.guidance_scale
            apply_fn = self._guided_apply_fn(state.params["model"], labels, w)
            return self._from_diffusion_space(
                state, self.diffusion.sample(apply_fn, num_samples, rng)
            )
        return self._from_diffusion_space(
            state,
            self.diffusion.sample(
                self._apply_fn(state.params["model"]), num_samples, rng
            ),
        )

    def interpolate(self, state, x1_01, x2_01, rng, t=None, lam=0.5):
        labels = (
            self.null_labels(x1_01.shape[0]) if self.num_classes else None
        )
        z = self.diffusion.interpolate(
            self._apply_fn(state.ema_params, labels),
            self._to_diffusion_space(state, x1_01),
            self._to_diffusion_space(state, x2_01),
            rng, t, lam,
        )
        return self._from_diffusion_space(state, z)
