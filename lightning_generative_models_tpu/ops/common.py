"""Shared helpers for the Pallas kernel modules (attention, linear
attention, vq): backend dispatch and custom_partitioning
plumbing. Each kernel module keeps its own ``_INTERPRET`` flag so tests
can flip interpret mode per kernel independently.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def batch_axes(arg_info):
    """Leading-axis mesh axes of a custom_partitioning operand (None if
    unsharded/replicated)."""
    spec = arg_info.sharding.spec if arg_info.sharding else P()
    return spec[0] if len(spec) else None
