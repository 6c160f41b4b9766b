"""Serving export: freeze a trained sampler into a portable StableHLO artifact.

Beyond reference (the reference has no deployment story at all — training
notebooks only). The serving unit here is a *frozen sampler*: the model's
jitted ``sample`` function with the restored checkpoint parameters baked in
as constants, serialized via ``jax.export`` to one self-contained blob that a
serving process can load and call with nothing but a PRNG key — no model
code, no config, no checkpoint tree, no Python class on the serving side.

TPU-first notes:

- The artifact is a compiled-IR contract: static batch size, static shapes,
  one ``lax.scan`` sampling program — exactly what the XLA TPU compiler
  ahead-of-time pipeline wants. No Python control flow survives into serving.
- Pallas kernel selection is trace-time backend-gated (``ops/common.py``),
  so an artifact exported *on* TPU contains the Pallas kernels and is
  TPU-only; exporting with ``platforms=("cpu", "tpu")`` from any host picks
  the portable XLA paths for both targets (the gate sees the CPU default
  backend). The sidecar records which you got.
- ``jax.export`` guarantees backward compatibility windows for serialized
  artifacts (calling-convention versioning), so the blob outlives the JAX
  version that produced it.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "ServingArtifact",
    "export_sampler",
    "save_artifact",
    "load_artifact",
]


@dataclasses.dataclass(frozen=True)
class ServingArtifact:
    """A deserialized frozen sampler plus its provenance sidecar."""

    exported: Any  # jax.export.Exported
    meta: dict

    def __call__(self, rng: jax.Array) -> jax.Array:
        """Run the frozen sampler. ``rng`` is the only input; returns the
        [batch, H, W, C] image tensor in [0, 1]."""
        return jax.jit(self.exported.call)(rng)


def export_sampler(
    model,
    state,
    batch_size: int,
    method: Optional[str] = None,
    steps: Optional[int] = None,
    labels: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Freeze ``model.sample`` (or ``sample_classes`` when ``labels`` is
    given) over the restored ``state`` into a ``jax.export.Exported``.

    The returned object's only runtime input is a PRNG key; parameters,
    labels, and the sampling schedule are constants in the StableHLO.
    ``platforms`` lowers for the given target list (e.g. ``("tpu",)`` for a
    serving fleet, exported from a CPU dev host); default is the current
    backend.
    """
    if labels is not None:
        if not hasattr(model, "sample_classes"):
            raise ValueError(
                f"{type(model).__name__} has no sample_classes; "
                "labels= is only valid for conditional models"
            )
        lab = jnp.asarray(list(labels), jnp.int32)

        def fn(rng):
            return model.sample_classes(state, rng, lab)

    elif method is not None or steps:
        # Diffusion-only kwargs; let a TypeError from a non-diffusion
        # model surface naturally with the offending signature.
        def fn(rng):
            return model.sample(state, rng, batch_size, method=method, steps=steps)

    else:

        def fn(rng):
            return model.sample(state, rng, batch_size)

    key = jax.random.PRNGKey(0)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax.export.export(jax.jit(fn), **kwargs)(key)


def save_artifact(
    exported,
    path: Path,
    meta: Optional[dict] = None,
) -> dict:
    """Serialize ``exported`` to ``path`` with a ``<path>.json`` sidecar.

    The sidecar records provenance (model/step/sampler), the lowering
    platforms, output shape/dtype, the producing JAX version, and the blob's
    sha256 — enough for a serving fleet to verify and route the artifact
    without deserializing it.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = exported.serialize()
    path.write_bytes(blob)

    out_aval = jax.tree_util.tree_leaves(exported.out_avals)[0]
    sidecar = {
        "format": "jax.export.Exported",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "output_shape": list(out_aval.shape),
        "output_dtype": str(out_aval.dtype),
        "sha256": hashlib.sha256(blob).hexdigest(),
        "size_bytes": len(blob),
        **(meta or {}),
    }
    with open(f"{path}.json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return sidecar


def load_artifact(path: Path) -> ServingArtifact:
    """Load a frozen sampler saved by :func:`save_artifact`, verifying the
    sidecar's sha256 when present."""
    path = Path(path)
    blob = path.read_bytes()
    meta = {}
    sidecar_path = Path(f"{path}.json")
    if sidecar_path.exists():
        with open(sidecar_path) as f:
            meta = json.load(f)
        digest = hashlib.sha256(blob).hexdigest()
        if meta.get("sha256") not in (None, digest):
            raise ValueError(
                f"artifact {path} sha256 mismatch: sidecar says "
                f"{meta['sha256']}, blob is {digest}"
            )
    exported = jax.export.deserialize(bytearray(blob))
    return ServingArtifact(exported=exported, meta=meta)
