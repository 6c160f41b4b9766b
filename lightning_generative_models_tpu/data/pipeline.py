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
) -> Iterator[Any]:
    """Shard + device_put batches ``size`` steps ahead of consumption."""
    queue: collections.deque = collections.deque()

    def _put(batch: Any) -> Any:
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
