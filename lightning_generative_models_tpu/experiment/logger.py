"""Experiment logging: W&B-compatible sink with a local JSONL/PNG fallback.

The reference logs scalars, image grids and tables exclusively to W&B
(reference: train.py:104-111, gan.py:168-173, 310-321). Offline TPU pods
rarely have egress, so the primary sink here is the local experiment
directory (metrics.jsonl + samples/*.png); if ``wandb`` is importable and
enabled, the same calls mirror to it.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class ExperimentLogger:
    def __init__(
        self,
        experiment_dir: str | Path,
        project: str = "lightning-generative-models-tpu",
        name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        use_wandb: bool = False,
        resume: bool = False,
        run_id: Optional[str] = None,
    ):
        self.experiment_dir = Path(experiment_dir)
        self.experiment_dir.mkdir(parents=True, exist_ok=True)
        self.samples_dir = self.experiment_dir / "samples"
        self.samples_dir.mkdir(exist_ok=True)
        self._metrics_file = open(self.experiment_dir / "metrics.jsonl", "a")
        self._t0 = time.time()

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project,
                    name=name,
                    dir=str(self.experiment_dir),
                    config=config,
                    resume="must" if resume else None,
                    id=run_id if resume else None,
                )
            except Exception as e:  # wandb missing or no egress
                logger.warning("wandb unavailable (%s); logging locally only", e)

        if config is not None:
            config_path = self.experiment_dir / "config.json"
            with open(config_path, "w") as f:
                json.dump(config, f, indent=2, default=str)
            if self._wandb is not None:
                # Reference parity: LogArtifactCallback uploads the saved
                # config file as a W&B artifact at train start
                # (reference utils/callbacks.py:10-17).
                try:
                    import wandb

                    artifact = wandb.Artifact("experiment_config", type="config")
                    artifact.add_file(str(config_path))
                    self._wandb.log_artifact(artifact)
                except Exception as e:
                    logger.warning("wandb config artifact upload failed: %s", e)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            record[k] = float(np.asarray(v)) if not isinstance(v, str) else v
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, image: np.ndarray, step: int) -> None:
        """Save a uint8 HWC image grid; mirror to W&B if enabled."""
        path = self.samples_dir / f"{name}_{step:08d}.png"
        _write_png(path, image)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(np.asarray(image))}, step=step)

    def log_table(self, name: str, columns: list[str], rows: list[list[Any]], step: int) -> None:
        """Table logging (reference: VAE latent table, vae.py:228-241)."""
        path = self.experiment_dir / f"{name}_{step:08d}.json"
        with open(path, "w") as f:
            json.dump({"columns": columns, "rows": rows}, f, default=str)
        if self._wandb is not None:
            import wandb

            self._wandb.log(
                {name: wandb.Table(columns=columns, data=rows)}, step=step
            )

    def finish(self) -> None:
        self._metrics_file.close()
        if self._wandb is not None:
            self._wandb.finish()


def _write_png(path: Path, image: np.ndarray) -> None:
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[-1] == 1:
        image = image[..., 0]
    try:
        from PIL import Image

        Image.fromarray(image).save(path)
    except ImportError:
        np.save(path.with_suffix(".npy"), image)
