"""Trainer: the jit-compiled training loop.

Owns what ``pl.Trainer`` owned in the reference (reference train.py:124-141):
epoch/step loop, validation cadence (``check_val_every_n_epoch``), max
epochs/steps, checkpoint hooks, logging, resume — but as one explicit loop
around *pure jitted step functions* with:

- a device mesh (data-parallel by default) with sharded uint8 batches and an
  async prefetcher feeding the device (data/pipeline.py),
- donated TrainState buffers (no per-step reallocation of params/opt state),
- gradient accumulation expressed TPU-natively: the trainer *concatenates*
  micro-batches and runs one step on the larger batch — mathematically
  identical to accumulating mean-loss gradients, and faster on the MXU than
  serialized micro-steps. (Reference: Lightning's accumulate_grad_batches,
  which its manual-optimization GANs ignored; GAN-family models here set
  ``supports_grad_accum=False`` and warn, matching that.)
- optional jax.profiler traces around chosen steps (``profile_steps``),
- SIGTERM-triggered final checkpoint for preemptible TPU VMs.
"""

from __future__ import annotations

import logging
import signal
import time
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import jax
import numpy as np

from lightning_generative_models_tpu.data.pipeline import prefetch_to_device
from lightning_generative_models_tpu.experiment.logger import ExperimentLogger
from lightning_generative_models_tpu.parallel import mesh as mesh_lib
from lightning_generative_models_tpu.train.checkpoint import CheckpointManager
from lightning_generative_models_tpu.utils.grid import make_grid
from lightning_generative_models_tpu.utils.seed import seed_everything

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        model: Any,
        datamodule: Any,
        experiment_dir: str | Path,
        exp_logger: Optional[ExperimentLogger] = None,
        mesh: Optional[Any] = None,
        max_epochs: int = -1,
        max_steps: int = -1,
        check_val_every_n_epoch: int = 5,
        accumulate_grad_batches: int = 1,
        log_every_n_steps: int = 50,
        sample_every_n_steps: int = 1000,
        num_sample_images: int = 64,
        seed: int = 10,
        profile_steps: Optional[tuple[int, int]] = None,
        unroll_steps: int = 1,
        grad_accum_mode: str = "auto",
        strategy: str = "data_parallel",
        tp_size: int = 0,
        pp_size: int = 0,
    ):
        self.model = model
        self.datamodule = datamodule
        self.experiment_dir = Path(experiment_dir)
        self.logger = exp_logger or ExperimentLogger(self.experiment_dir)
        if strategy == "tp" and mesh is None:
            n_dev = jax.device_count()
            tp_size = tp_size or n_dev
            if n_dev % tp_size:
                raise ValueError(
                    f"tp_size {tp_size} does not divide {n_dev} devices"
                )
            mesh = mesh_lib.create_mesh(
                axis_names=(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS),
                shape=(n_dev // tp_size, tp_size),
            )
        if strategy == "pp" and mesh is None:
            n_dev = jax.device_count()
            pp_size = pp_size or n_dev
            if n_dev % pp_size:
                raise ValueError(
                    f"pp_size {pp_size} does not divide {n_dev} devices"
                )
            mesh = mesh_lib.create_mesh(
                axis_names=(mesh_lib.DATA_AXIS, mesh_lib.STAGE_AXIS),
                shape=(n_dev // pp_size, pp_size),
            )
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.accumulate_grad_batches = accumulate_grad_batches
        self.log_every_n_steps = log_every_n_steps
        self.sample_every_n_steps = sample_every_n_steps
        self.num_sample_images = num_sample_images
        self.seed = seed
        self.profile_steps = profile_steps
        # "data_parallel": params replicated, batch sharded (reference DDP
        # semantics, utils/lightning_utils.py:23-56). "fsdp": params +
        # optimizer state + EMA additionally sharded over the data axis
        # (ZeRO-3 via GSPMD; see parallel/mesh.py:fsdp_sharding) — same math,
        # per-device state memory divided by the mesh size. "tp": Megatron
        # tensor parallelism over the mesh's "model" axis (DiT backbone
        # only; see parallel/mesh.py:tp_sharding) — batch sharded over
        # "data", block weights sharded over "model", 2 psums per block.
        # "pp": GPipe pipeline parallelism over the mesh's "stage" axis (DiT
        # backbone only; see models/diffusion/pipeline.py + parallel/
        # mesh.py:pp_sharding) — batch sharded over "data", stage-stacked
        # block weights sharded over "stage", the microbatch schedule's
        # stage shifts lowered to collective permutes by GSPMD.
        if strategy not in ("data_parallel", "ddp", "auto", "fsdp", "tp", "pp"):
            raise ValueError(
                "strategy must be data_parallel|ddp|auto|fsdp|tp|pp, "
                f"got {strategy!r}"
            )
        self.fsdp = strategy == "fsdp"
        self.tp = strategy == "tp"
        self.pp = strategy == "pp"
        if self.tp:
            self._validate_tp()
        elif self.pp:
            self._validate_pp()
        elif getattr(getattr(model, "unet", None), "seq_parallel", False):
            # The seq_shard constraints are mechanical no-ops off the tp
            # mesh (models/diffusion/dit.py:seq_shard), so this is not an
            # error — but the user likely forgot --strategy tp.
            logger.warning(
                "model config sets seq_parallel=true but strategy=%r — "
                "sequence parallelism only takes effect under --strategy tp",
                strategy,
            )

        if accumulate_grad_batches > 1 and not getattr(
            model, "supports_grad_accum", True
        ):
            logger.warning(
                "%s uses manual multi-optimizer updates; accumulate_grad_batches "
                "is ignored (matches Lightning behavior for manual optimization).",
                type(model).__name__,
            )
            self.accumulate_grad_batches = 1

        # Grad-accum strategy: "concat" runs one step on the k-merged batch
        # (mathematically identical for mean losses, fastest on the MXU, but
        # k× activation memory); "scan" sums per-micro-batch gradients in a
        # lax.scan (fixed memory — the actual point of accumulate_grad_batches).
        # "auto" picks scan when the model exposes grad_step AND the merged
        # batch is large enough that activation memory plausibly matters.
        self.grad_accum_mode = self._resolve_accum_mode(grad_accum_mode)

        self.ckpt = CheckpointManager(
            self.experiment_dir / "checkpoints", monitor=model.monitor
        )

        # Jitted step functions. State is donated so params/opt buffers are
        # updated in place in HBM.
        # unroll_steps > 1 fuses k optimization steps (on k different
        # batches) into one dispatch — ~20% faster for dispatch-bound small
        # models on tunneled backends; identical math, coarser logging.
        self.unroll_steps = max(int(unroll_steps), 1)
        if self.grad_accum_mode == "scan" and self.unroll_steps > 1:
            raise ValueError("unroll_steps>1 is incompatible with scan grad-accum")
        if self.grad_accum_mode == "scan":
            self._train_step = jax.jit(
                self._make_scan_accum_step(), donate_argnums=0
            )
        elif self.unroll_steps > 1:

            def _unrolled(state, stacked, rng, ema_flags):
                metrics = None
                for i in range(self.unroll_steps):
                    batch_i = jax.tree_util.tree_map(lambda x: x[i], stacked)
                    if ema_flags is None:
                        state, metrics = model.train_step(state, batch_i, rng)
                    else:
                        state, metrics = model.train_step_gated(
                            state, batch_i, rng, ema_flags[i]
                        )
                return state, metrics

            self._unrolled_jit = jax.jit(
                _unrolled, donate_argnums=0, static_argnums=3
            )
            if hasattr(model, "train_step_gated"):
                # Compose unroll with host-gated EMA: each dispatch carries
                # a static per-step EMA mask (at the defaults this compiles
                # at most three programs: warmup, no-EMA, EMA-last).
                def _unrolled_gated(state, stacked, rng):
                    flags = tuple(
                        model.ema_step_needed(self.global_step + 1 + i)
                        for i in range(self.unroll_steps)
                    )
                    return self._unrolled_jit(state, stacked, rng, flags)

                self._train_step = _unrolled_gated
            else:
                self._train_step = (
                    lambda s, b, r: self._unrolled_jit(s, b, r, None)
                )
        elif hasattr(model, "train_step_gated"):
            # Host-gated EMA (DDPM): two compiled variants; the False one
            # skips the EMA tree-map's HBM traffic on the steps whose
            # effective decay would be 1.0 (9 in 10 at the defaults).
            import functools

            self._train_step_ema = jax.jit(
                functools.partial(model.train_step_gated, do_ema=True),
                donate_argnums=0,
            )
            self._train_step_noema = jax.jit(
                functools.partial(model.train_step_gated, do_ema=False),
                donate_argnums=0,
            )
            self._train_step = self._gated_step
        else:
            self._train_step = jax.jit(model.train_step, donate_argnums=0)
        self._eval_step = jax.jit(model.eval_step)
        self._sample = jax.jit(model.sample, static_argnums=2)
        from lightning_generative_models_tpu.models.base import GenerativeModel

        self._val_grids = (
            jax.jit(model.validation_grids)
            if type(model).validation_grids is not GenerativeModel.validation_grids
            else None
        )

        self._should_stop = False
        self._interrupted = False

    # -- public ------------------------------------------------------------
    def fit(self, ckpt_path: Optional[str] = None, resume: bool = False) -> Any:
        self._warn_degenerate_labels()
        rng = seed_everything(self.seed)
        init_rng, self._run_rng = jax.random.split(rng)

        state = jax.jit(self.model.init_state)(init_rng)
        start_epoch = 0
        self.global_step = 0
        if resume and self.ckpt.has_checkpoint("last"):
            state, self.global_step, start_epoch = self.ckpt.restore(state)
            logger.info(
                "Resumed from step %d (epoch %d)", self.global_step, start_epoch
            )
        elif ckpt_path is not None:
            mgr = CheckpointManager(Path(ckpt_path).parent, monitor=self.model.monitor)
            state, self.global_step, start_epoch = mgr.restore(
                state, Path(ckpt_path).name
            )

        state = mesh_lib.shard_state(
            state, self.mesh, fsdp=self.fsdp, tp=self.tp, pp=self.pp)
        self._log_model_summary(state)

        prev_handler = signal.getsignal(signal.SIGTERM)
        signal.signal(signal.SIGTERM, self._handle_sigterm)
        try:
            with self._mesh_context():
                state = self._fit_loop(state, start_epoch)
        finally:
            signal.signal(signal.SIGTERM, prev_handler)
            # Interrupt/crash save with the CURRENT epoch (retry semantics).
            # Skipped when _fit_loop already saved at this step — otherwise
            # it would overwrite the boundary save's epoch+1 on every normal
            # exit and resume would retrain the finished final epoch.
            if getattr(self, "_last_saved_step", None) != self.global_step:
                self.ckpt.save_last(
                    state, self.global_step, getattr(self, "epoch", 0))
        return state

    # -- internals -----------------------------------------------------------
    def _validate_tp(self) -> None:
        """Tensor parallelism requires a DiT backbone in the "h3d" packed-qkv
        layout (whole-head channel shards) with heads divisible by the model
        axis — fail loudly at construction, not deep inside GSPMD."""
        from lightning_generative_models_tpu.models.diffusion.dit import DiT

        if mesh_lib.MODEL_AXIS not in self.mesh.axis_names:
            raise ValueError(
                "strategy='tp' needs a mesh with a 'model' axis "
                f"(got axes {self.mesh.axis_names}); pass --tp_size"
            )
        tp = self.mesh.shape[mesh_lib.MODEL_AXIS]
        net = getattr(self.model, "unet", None)
        if not isinstance(net, DiT):
            raise ValueError(
                "strategy='tp' supports the DiT backbone only — set "
                "network='dit' in the model config"
            )
        if net.qkv_layout != "h3d":
            raise ValueError(
                "strategy='tp' requires qkv_layout='h3d' in the model config "
                "(per-head q,k,v packing, so channel shards are whole heads)"
            )
        if net.heads % tp:
            raise ValueError(
                f"DiT heads={net.heads} not divisible by the {tp}-way "
                "model axis"
            )
        if net.seq_parallel:
            tokens = (self.model.img_size // net.patch_size) ** 2
            if tokens % tp:
                raise ValueError(
                    f"seq_parallel: {tokens} tokens "
                    f"(img {self.model.img_size} / patch {net.patch_size}) "
                    f"not divisible by the {tp}-way model axis"
                )
        if net.num_experts and net.num_experts % tp:
            raise ValueError(
                f"MoE num_experts={net.num_experts} not divisible by the "
                f"{tp}-way model axis (expert parallelism shards whole "
                "experts)"
            )

    def _validate_pp(self) -> None:
        """Pipeline parallelism requires a DiT backbone whose configured
        stage count matches the mesh's stage axis — fail loudly at
        construction, not deep inside GSPMD."""
        from lightning_generative_models_tpu.models.diffusion.dit import DiT

        if mesh_lib.STAGE_AXIS not in self.mesh.axis_names:
            raise ValueError(
                "strategy='pp' needs a mesh with a 'stage' axis "
                f"(got axes {self.mesh.axis_names}); pass --pp_size"
            )
        pp = self.mesh.shape[mesh_lib.STAGE_AXIS]
        net = getattr(self.model, "unet", None)
        if not isinstance(net, DiT):
            raise ValueError(
                "strategy='pp' supports the DiT backbone only — set "
                "network='dit' in the model config"
            )
        if net.pipeline_stages != pp:
            raise ValueError(
                f"model config pipeline_stages={net.pipeline_stages} does "
                f"not match the {pp}-way stage axis (set pipeline_stages "
                "== pp_size; 0 disables the pipeline schedule entirely)"
            )

    def _mesh_context(self):
        """Ambient-mesh context for jit tracing: the DiT seq_shard /
        pipeline pp_shard constraints (tp/pp) and the samplers'
        ``data_shard`` initial-noise constraint (every strategy) resolve
        their PartitionSpecs against ``jax.set_mesh``'s abstract mesh.
        Entered for ALL strategies so validation grids / generative-metric
        sampling run batch-partitioned over the data axis instead of
        replicated; the train step is unaffected (its inputs carry explicit
        shardings and the tp/pp constraints no-op without their axes)."""
        return jax.set_mesh(self.mesh)

    def _gated_step(self, state: Any, batch: Any, rng: Any):
        if self.model.ema_step_needed(self.global_step + 1):
            return self._train_step_ema(state, batch, rng)
        return self._train_step_noema(state, batch, rng)

    def _resolve_accum_mode(self, mode: str) -> str:
        if mode not in ("auto", "concat", "scan"):
            raise ValueError(f"grad_accum_mode must be auto|concat|scan, got {mode}")
        if self.accumulate_grad_batches <= 1:
            return "concat"
        from lightning_generative_models_tpu.models.base import GenerativeModel

        has_grad_step = (
            type(self.model).grad_step is not GenerativeModel.grad_step
        )
        if mode == "scan":
            if not has_grad_step:
                raise ValueError(
                    f"{type(self.model).__name__} does not implement grad_step; "
                    "scan grad-accum requires the grad_step/apply_grad_step "
                    "protocol (use concat)."
                )
            return "scan"
        if mode == "auto" and has_grad_step:
            # Scan only when the merged batch's image tensor alone is big
            # enough (>=256 MB) that activation memory plausibly matters;
            # otherwise concat is identical math and faster (one big MXU
            # batch, no sequential dependency).
            shape = self.model.image_shape()
            merged_bytes = (
                self.accumulate_grad_batches
                * self.datamodule.batch_size
                * int(np.prod(shape))
                * 4
            )
            if merged_bytes >= 256 * 1024**2:
                return "scan"
        return "concat"

    def _make_scan_accum_step(self):
        """Fixed-memory gradient accumulation: sum per-micro-batch grads in a
        lax.scan, then apply one optimizer step on the mean (reference:
        Lightning accumulate_grad_batches, train.py:39,129). Peak activation
        memory is one micro-batch instead of the concat path's k×."""
        import jax.numpy as jnp

        model = self.model
        k = self.accumulate_grad_batches

        def step(state, stacked, rng):
            micro0 = jax.tree_util.tree_map(lambda x: x[0], stacked)
            shapes = jax.eval_shape(model.grad_step, state, micro0, rng)
            zeros = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

            def body(carry, xs):
                i, micro = xs
                out = model.grad_step(state, micro, jax.random.fold_in(rng, i))
                return jax.tree_util.tree_map(jnp.add, carry, out), None

            sums, _ = jax.lax.scan(body, zeros, (jnp.arange(k), stacked))
            grads, metrics = jax.tree_util.tree_map(lambda x: x / k, sums)
            return model.apply_grad_step(state, grads, metrics)

        return step

    def _log_model_summary(self, state: Any) -> None:
        """Per-group counts + per-layer tables (reference: torchinfo summaries
        at construction, gan.py:323-354, ddpm.py:1061-1094)."""
        from lightning_generative_models_tpu.train.state import count_params

        lines = []
        total = 0
        for group, tree in state.params.items():
            n = count_params(tree)
            total += n
            lines.append(f"  {group}: {n:,} params")
        if state.ema_params is not None:
            lines.append(f"  ema: {count_params(state.ema_params):,} params")
        logger.info(
            "%s parameters:\n%s\n  total: %s",
            type(self.model).__name__, "\n".join(lines), f"{total:,}",
        )

        if not getattr(self.model, "summary", True):
            return
        from lightning_generative_models_tpu.utils.summary import (
            module_table,
            param_table,
        )

        logger.info("parameter table:\n%s", param_table(state.params))
        try:
            # FLOP columns lower each submodule through XLA cost analysis —
            # cheap on CPU, but remote-compile-bound on tunneled TPU backends,
            # so only computed when the backend is local.
            flops = jax.default_backend() == "cpu"
            for name, (module, args, kwargs) in self.model.summary_spec().items():
                logger.info(
                    "%s summary:\n%s",
                    name,
                    module_table(module, args, compute_flops=flops, **kwargs),
                )
        except Exception as e:  # summaries must never kill training
            logger.warning("module tabulate failed: %s", e)

    def _warn_degenerate_labels(self) -> None:
        """A conditional model fed all-zero labels from real (non-synthetic)
        data almost always means a missing label file (see
        data/datasets._folder_labels): training silently collapses to a
        single class. Warn loudly before the run starts."""
        num_classes = getattr(self.model, "num_classes", 0)
        if not num_classes or num_classes <= 1:
            return
        try:
            self.datamodule.setup()
        except Exception:
            return
        labels = getattr(self.datamodule, "train_labels", None)
        if labels is None or getattr(self.datamodule, "is_synthetic", True):
            return
        if len(labels) and not np.any(labels):
            logger.warning(
                "%s is conditional (num_classes=%d) but every training label "
                "is 0. If this dataset is an image folder, add a label source "
                "(labels.txt / imagelabels.mat / list_attr_celeba.txt) — "
                "otherwise the model degenerates to one class.",
                type(self.model).__name__,
                num_classes,
            )

    def _handle_sigterm(self, signum, frame):  # pragma: no cover - signal path
        logger.warning("SIGTERM received; will checkpoint and stop.")
        self._should_stop = True
        self._interrupted = True

    def _max_epochs(self) -> int:
        if self.max_epochs and self.max_epochs > 0:
            return self.max_epochs
        if self.max_steps and self.max_steps > 0:
            steps = self.datamodule.steps_per_epoch("train")
            eff = max(steps // self.accumulate_grad_batches, 1)
            return int(np.ceil(self.max_steps / eff))
        logger.warning(
            "Neither max_epochs nor max_steps set: training runs for 1000 "
            "epochs (Lightning's default) or until SIGTERM."
        )
        return 1000

    def _train_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        it = self.datamodule.train_batches(epoch)
        if self.accumulate_grad_batches > 1:
            if self.grad_accum_mode == "scan":
                # Stacked [k, B, ...] micro-batches shard on axis 1.
                it = _stack_batches(it, self.accumulate_grad_batches)
                return prefetch_to_device(it, self.mesh, batch_axis=1)
            it = _concat_batches(it, self.accumulate_grad_batches)
        if self.unroll_steps > 1:
            # Stacked [k, B, ...] batches shard on axis 1 (the batch dim).
            it = _stack_batches(it, self.unroll_steps)
            return prefetch_to_device(it, self.mesh, batch_axis=1)
        return prefetch_to_device(it, self.mesh)

    def _fit_loop(self, state: Any, start_epoch: int) -> Any:
        # If every epoch is already done (resume of a completed run), the
        # loop body never sets self.epoch; the end-of-run save below then
        # re-records start_epoch.
        self.epoch = start_epoch - 1
        step_times: List[float] = []
        # One dispatch consumes unroll_steps batches of accumulate_grad_batches
        # micro-batches each.
        images_per_step = (
            self.datamodule.batch_size
            * self.accumulate_grad_batches
            * self.unroll_steps
        )

        def crossed(n: int, prev: int, cur: int) -> bool:
            # Cadence check robust to global_step advancing by unroll_steps>1
            # (exact modulo would never fire when n % unroll_steps != 0).
            return n > 0 and prev // n != cur // n

        for epoch in range(start_epoch, self._max_epochs()):
            self.epoch = epoch
            for batch in self._train_batches(epoch):
                if self.profile_steps and self.global_step >= self.profile_steps[0] \
                        and not getattr(self, "_tracing", False) \
                        and not getattr(self, "_profiled", False):
                    jax.profiler.start_trace(str(self.experiment_dir / "profile"))
                    self._tracing = True
                t0 = time.perf_counter()
                state, metrics = self._train_step(state, batch, self._run_rng)
                prev_step = self.global_step
                self.global_step += self.unroll_steps
                is_last = self.max_steps > 0 and self.global_step >= self.max_steps
                if crossed(self.log_every_n_steps, prev_step, self.global_step) \
                        or prev_step == 0 or is_last:
                    # Sync point only on logging steps.
                    metrics = {k: float(v) for k, v in metrics.items()}
                    dt = time.perf_counter() - t0
                    step_times.append(dt)
                    metrics["images_per_sec"] = images_per_step / max(dt, 1e-9)
                    metrics["epoch"] = epoch
                    self.logger.log_metrics(metrics, prev_step)
                if self.profile_steps and getattr(self, "_tracing", False) \
                        and self.global_step > self.profile_steps[1]:
                    jax.profiler.stop_trace()
                    self._tracing = False
                    self._profiled = True  # one window per run, not per step

                if crossed(self.sample_every_n_steps, prev_step, self.global_step):
                    self._log_samples(state)
                if self.max_steps > 0 and self.global_step >= self.max_steps:
                    self._should_stop = True
                if self._should_stop:
                    break

            if self._should_stop:
                break
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                val_metrics = self._validate(state)
                self.ckpt.maybe_save_best(state, self.global_step, epoch, val_metrics)
                # Epoch-boundary save: resume starts at the NEXT epoch (the
                # mid-epoch SIGTERM/finally save keeps the current epoch so an
                # interrupted epoch is retried).
                self.ckpt.save_last(state, self.global_step, epoch + 1)
                self._last_saved_step = self.global_step

        if self._interrupted:
            # Preemption (SIGTERM): save FIRST and skip validation/sampling
            # entirely — a DDPM validation (64-image grid + FID) can eat a
            # preemptible TPU VM's ~30 s grace window and the checkpoint
            # would never land. Current epoch is recorded so the interrupted
            # epoch is retried on resume.
            self.ckpt.save_last(state, self.global_step, self.epoch)
            self._last_saved_step = self.global_step
            return state
        val_metrics = self._validate(state)
        # A --max_steps run usually stops mid-epoch, skipping the
        # epoch-boundary maybe_save_best above — without this call such a
        # run never writes a 'best' checkpoint despite validating.
        self.ckpt.maybe_save_best(state, self.global_step, self.epoch, val_metrics)
        if not self._should_stop:
            # Normal completion: record the NEXT epoch even when the val
            # cadence skipped the last boundary save, so resume never
            # retrains a finished epoch.
            self.ckpt.save_last(state, self.global_step, self.epoch + 1)
            self._last_saved_step = self.global_step
        return state

    def _eval_over(self, state: Any, batches: Iterator[Any]) -> Dict[str, float]:
        """Mean per-batch eval metrics + §2.7 generative metrics over a
        batch iterator (shared by validation and the test split)."""
        sums: Dict[str, float] = {}
        count = 0
        val_rng = jax.random.fold_in(self._run_rng, 0x57A7)
        gen_metrics = self._generative_metrics()
        for batch in prefetch_to_device(batches, self.mesh):
            # Distinct key per batch: without the fold_in every generated
            # "fake" batch is bit-identical and the FID/KID covariance is
            # computed over N copies of one batch (rank-deficient, wrong).
            rng = jax.random.fold_in(val_rng, count)
            metrics = self._eval_step(state, batch, rng)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if gen_metrics:
                self._update_generative_metrics(state, batch, rng, gen_metrics)
            count += 1
        if count == 0:
            return {}
        means = {k: v / count for k, v in sums.items()}
        if gen_metrics:
            means.update(self._compute_generative_metrics(gen_metrics))
        return means

    def _validate(self, state: Any) -> Dict[str, float]:
        means = self._eval_over(state, self.datamodule.val_batches())
        if not means:
            return {}
        self.logger.log_metrics(means, self.global_step)
        self._log_samples(state)
        self._log_conditional_grids(state)
        self._log_tables(state)
        return means

    def test(self, state: Any = None, which: str = "last") -> Dict[str, float]:
        """Evaluate over the held-out test split (reference: the otherwise
        unused ``test_dataloader``, /root/reference/data/datamodule.py:190-206
        — this gives it a consumer). Restores a checkpoint when no live state
        is passed; metric keys are ``test_``-prefixed."""
        if not hasattr(self, "global_step"):
            self.global_step = 0
        if not hasattr(self, "_run_rng"):
            # test(state=...) on a trainer that never ran fit(): _eval_over
            # needs the run RNG regardless of where the state came from.
            _, self._run_rng = jax.random.split(seed_everything(self.seed))
        if state is None:
            rng = seed_everything(self.seed)
            _, self._run_rng = jax.random.split(rng)
            state = jax.jit(self.model.init_state)(jax.random.fold_in(rng, 0))
            if self.ckpt.has_checkpoint(which):
                state, self.global_step, _ = self.ckpt.restore(state, which)
            else:
                logger.warning(
                    "No '%s' checkpoint under %s; testing freshly "
                    "initialized weights.",
                    which, self.ckpt.directory,
                )
            state = mesh_lib.shard_state(
                state, self.mesh, fsdp=self.fsdp, tp=self.tp, pp=self.pp)
        with self._mesh_context():
            means = self._eval_over(state, self.datamodule.test_batches())
        renamed = {
            (k.replace("val_", "test_", 1) if k.startswith("val_")
             else f"test_{k}"): v
            for k, v in means.items()
        }
        if renamed:
            self.logger.log_metrics(renamed, self.global_step)
        return renamed

    def _log_conditional_grids(self, state: Any) -> None:
        """Structured grids for conditional models (reference cgan.py:331-357,
        infogan.py:499-510): per-class rows / code transitions every val epoch."""
        if self._val_grids is None:
            return
        grids = self._val_grids(state, jax.random.fold_in(self._run_rng, 2))
        for name, images in grids.items():
            grid = make_grid(mesh_lib.to_host(images), nrow=8)
            self.logger.log_image(name, grid, self.global_step)

    def _log_tables(self, state: Any) -> None:
        """Latent / codebook tables (reference vae.py:228-241,
        vqvae.py:258-267)."""
        try:
            if hasattr(self.model, "encode_for_logging"):
                batch = next(iter(self.datamodule.val_batches()))
                latents = self.model.encode_for_logging(state, batch)
                cols = [f"z{i}" for i in range(latents.shape[1])] + ["label"]
                rows = [
                    list(map(float, z)) + [int(label)]
                    for z, label in zip(latents[:256], batch["label"][:256])
                ]
                self.logger.log_table("latent_space", cols, rows, self.global_step)
            if hasattr(self.model, "codebook_table"):
                codebook = self.model.codebook_table(state)
                cols = [f"d{i}" for i in range(codebook.shape[1])]
                rows = [list(map(float, row)) for row in codebook]
                self.logger.log_table("codebook", cols, rows, self.global_step)
        except Exception as e:  # table logging must never kill training
            logger.warning("table logging failed: %s", e)

    # -- FID/KID/IS (reference gan.py:132-241, infogan.py:378-427) ----------
    def _generative_metrics(self) -> Dict[str, Any]:
        if not getattr(self.model, "calculate_metrics", False):
            return {}
        wanted = getattr(self.model, "metrics", None) or []
        if not hasattr(self, "_gen_metric_objs"):
            from lightning_generative_models_tpu.metrics import (
                FrechetInceptionDistance,
                InceptionScore,
                KernelInceptionDistance,
            )
            from lightning_generative_models_tpu.metrics.inception import (
                InceptionFeatureExtractor,
            )

            extractor = InceptionFeatureExtractor()
            objs: Dict[str, Any] = {}
            if "fid" in wanted:
                objs["fid"] = FrechetInceptionDistance(extractor)
            if "kid" in wanted:
                objs["kid"] = KernelInceptionDistance(extractor, subset_size=100)
            if "is" in wanted:
                objs["is"] = InceptionScore(extractor)
            self._gen_metric_objs = objs
        return self._gen_metric_objs

    def _update_generative_metrics(self, state, batch, rng, objs) -> None:
        # real images: the data-sharded val batch; fakes: the data-sharded
        # sampler output — both gathered across hosts on multi-process runs
        # (to_host is a plain device_get single-process).
        real_u8 = mesh_lib.to_host(batch["image"])
        fake01 = mesh_lib.to_host(self._sample(state, rng, real_u8.shape[0]))
        # Reference quantization: [-1,1] -> add(1).mul(127.5).byte()
        # == truncation of [0,1]*255 (gan.py:203-227).
        fake_u8 = np.clip(fake01 * 255.0, 0, 255).astype(np.uint8)
        if "fid" in objs:
            objs["fid"].update(real_u8, real=True)
            objs["fid"].update(fake_u8, real=False)
        if "kid" in objs:
            objs["kid"].update(real_u8, real=True)
            objs["kid"].update(fake_u8, real=False)
        if "is" in objs:
            objs["is"].update(fake_u8)

    def _compute_generative_metrics(self, objs) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if "fid" in objs:
            out["fid_score"] = objs["fid"].compute()
            objs["fid"].reset()
        if "kid" in objs:
            kid_mean, kid_std = objs["kid"].compute()
            out["mean_kid_score"], out["std_kid_score"] = kid_mean, kid_std
            objs["kid"].reset()
        if "is" in objs:
            is_mean, is_std = objs["is"].compute()
            out["mean_inception_score"], out["std_inception_score"] = is_mean, is_std
            objs["is"].reset()
        return out

    def _log_samples(self, state: Any) -> None:
        try:
            images = self._sample(
                state, jax.random.fold_in(self._run_rng, 1), self.num_sample_images
            )
        except NotImplementedError:
            return
        grid = make_grid(mesh_lib.to_host(images))
        self.logger.log_image("random_generation", grid, self.global_step)


def _stack_batches(
    iterator: Iterator[Dict[str, np.ndarray]], k: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack k batches along a new leading axis for unrolled dispatch."""
    buf: List[Dict[str, np.ndarray]] = []
    for b in iterator:
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([x[key] for x in buf]) for key in buf[0]}
            buf = []


def _concat_batches(
    iterator: Iterator[Dict[str, np.ndarray]], k: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Merge k micro-batches into one large batch (grad-accum equivalent)."""
    buf: List[Dict[str, np.ndarray]] = []
    for b in iterator:
        buf.append(b)
        if len(buf) == k:
            yield {
                key: np.concatenate([x[key] for x in buf]) for key in buf[0]
            }
            buf = []
