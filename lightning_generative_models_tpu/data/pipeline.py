"""Device feeding: async sharded prefetch.

Replaces the reference's DataLoader worker processes + pin_memory + H2D copy
chain (reference: data/datamodule.py:180-188 and Lightning's transfer hooks)
with a simple double-buffered prefetcher: while the device computes step N,
the host already issued the (non-blocking) transfer of batch N+1, sharded over
the mesh's data axis. uint8 payloads keep the transfer small; scaling to float
happens on device (ops/preprocess.py).
"""

from __future__ import annotations

import collections
from typing import Any, Iterator, Optional

import jax
from jax.sharding import Mesh

from lightning_generative_models_tpu.parallel.mesh import shard_batch


def prefetch_to_device(
    iterator: Iterator[Any],
    mesh: Optional[Mesh] = None,
    size: int = 2,
    batch_axis: int = 0,
) -> Iterator[Any]:
    """Shard + device_put batches ``size`` steps ahead of consumption.

    Batches whose leading dimension does not divide the mesh's device count
    are dropped (TPU programs are static-shaped; remainder batches are the
    standard drop_remainder casualty) with a one-time warning.
    """
    import logging

    queue: collections.deque = collections.deque()
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    warned = False

    def _divisible(batch: Any) -> bool:
        leaves = [
            x
            for x in jax.tree_util.tree_leaves(batch)
            if getattr(x, "ndim", 0) > batch_axis
        ]
        return all(x.shape[batch_axis] % n_dev == 0 for x in leaves)

    def _put(batch: Any) -> Any:
        if mesh is not None:
            return shard_batch(batch, mesh, batch_axis)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        if n_dev > 1 and not _divisible(batch):
            if not warned:
                logging.getLogger(__name__).warning(
                    "dropping batch not divisible by %d devices", n_dev
                )
                warned = True
            continue
        queue.append(_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
