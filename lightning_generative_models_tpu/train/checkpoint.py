"""Checkpointing: atomic orbax save/restore with save-last + best-by-monitor.

Reference behavior being replaced: Lightning ``ModelCheckpoint(dirpath,
save_last=True, monitor="val_loss")`` (reference train.py:113-117) which
serialized module/optimizer/loop state. Here the entire
:class:`TrainState` pytree (params, every optimizer state, EMA weights,
mutable collections, step counter) plus the data-epoch counter round-trips
through orbax — checkpoint writes are atomic (tmp dir + rename inside orbax),
so preemption mid-write never corrupts the latest checkpoint.

A ``best`` checkpoint tracks the model's ``monitor`` key. Unlike the
reference, the monitored key always exists because each model declares its own
(fixes SURVEY §2.8(3): monitoring "val_loss" for GANs that never log it).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str | Path, monitor: str = "val_loss"):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.best_value = np.inf
        self._checkpointer = ocp.StandardCheckpointer()
        meta = self._read_meta("best") or self._read_meta("last")
        if meta:
            # "no best yet" is serialized as null (raw Infinity is not
            # strict JSON and breaks external parsers like jq).
            value = meta.get("best_value")
            self.best_value = np.inf if value is None else float(value)

    def _meta_path(self, which: str) -> Path:
        # Per-checkpoint metadata: 'best' and 'last' each carry the step/epoch
        # that match their own weights (a shared file would make restore('best')
        # resume with whatever counters the most recent save_last wrote).
        return self.directory / f"checkpoint_meta_{which}.json"

    def _read_meta(self, which: str) -> dict | None:
        path = self._meta_path(which)
        if not path.exists():
            # Legacy single-file layout from older runs.
            path = self.directory / "checkpoint_meta.json"
            if not path.exists():
                return None
        with open(path) as f:
            return json.load(f)

    def _write_meta(self, which: str, step: int, epoch: int) -> None:
        with open(self._meta_path(which), "w") as f:
            json.dump(
                {
                    "step": int(step),
                    "epoch": int(epoch),
                    "monitor": self.monitor,
                    "best_value": (
                        float(self.best_value)
                        if np.isfinite(self.best_value)
                        else None
                    ),
                },
                f,
            )

    def save_last(self, state: Any, step: int, epoch: int) -> None:
        path = self.directory / "last"
        self._checkpointer.save(path, state, force=True)
        self._checkpointer.wait_until_finished()
        self._write_meta("last", step, epoch)

    def maybe_save_best(
        self, state: Any, step: int, epoch: int, metrics: dict
    ) -> bool:
        value = metrics.get(self.monitor)
        if value is None:
            return False
        value = float(np.asarray(value))
        if value < self.best_value:
            self.best_value = value
            self._checkpointer.save(self.directory / "best", state, force=True)
            self._checkpointer.wait_until_finished()
            self._write_meta("best", step, epoch)
            logger.info("New best %s=%.6f at step %d", self.monitor, value, step)
            return True
        return False

    def restore(
        self, template_state: Any, which: str = "last"
    ) -> Tuple[Any, int, int]:
        """Restore state shaped like ``template_state``; returns (state, step, epoch)."""
        path = self.directory / which
        if not path.exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template_state)
        try:
            state = self._checkpointer.restore(path, abstract)
        except Exception as err:
            state = self._restore_with_migration(path, abstract, err)
        meta = self._read_meta(which) or {}
        step = meta.get("step", meta.get("last_step", 0))
        epoch = meta.get("epoch", meta.get("last_epoch", 0))
        return state, step, epoch

    def _restore_with_migration(self, path: Path, abstract: Any, err: Exception):
        """Typed restore failed: if the stored tree uses the pre-round-2
        LinearAttention layout, migrate it (pure reshape) and rebuild the
        state by path lookup; otherwise re-raise with a diagnosable message
        (models/modules/attention.py docstring: the fused-kernel rewrite
        flattened LinearAttention's parameters)."""
        from lightning_generative_models_tpu.models.modules.attention import (
            has_pre_fused_linear_attention,
            migrate_pre_fused_linear_attention,
        )

        try:
            raw = self._checkpointer.restore(path)  # structure as saved
        except Exception:
            raise err
        if not has_pre_fused_linear_attention(raw):
            raise err
        logger.warning(
            "Checkpoint %s uses the pre-rewrite LinearAttention parameter "
            "layout; migrating to the flat layout (pure reshape).", path
        )
        migrated = migrate_pre_fused_linear_attention(raw)
        try:
            flat, treedef = jax.tree_util.tree_flatten_with_path(abstract)
            leaves = []
            for path_keys, leaf in flat:
                node = migrated
                for k in path_keys:
                    name = getattr(
                        k, "key", getattr(k, "name", getattr(k, "idx", None))
                    )
                    if isinstance(node, (list, tuple)):
                        node = node[int(name)]
                    elif name in node:
                        node = node[name]
                    else:
                        node = node[str(name)]
                arr = np.asarray(node)
                if arr.shape != tuple(leaf.shape):
                    raise ValueError(
                        f"migrated leaf {'/'.join(map(str, path_keys))} has "
                        f"shape {arr.shape}, expected {tuple(leaf.shape)}"
                    )
                leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
            return jax.tree_util.tree_unflatten(treedef, leaves)
        except Exception as e:
            raise ValueError(
                f"Checkpoint at {path} predates the round-2 LinearAttention "
                "rewrite (RMSNorm_0/Conv_0/mem_kv/Conv_1/RMSNorm_1 layout) "
                "and automatic migration to the flat layout failed. Apply "
                "models.modules.attention.migrate_pre_fused_linear_attention "
                f"to the stored tree manually. Cause: {e}"
            ) from err

    def has_checkpoint(self, which: str = "last") -> bool:
        return (self.directory / which).exists()
