"""Device mesh + sharding: the TPU-native replacement for the reference's DDP.

The reference's single parallelism strategy is data-parallel DDP selected by
``configure_strategy()`` (reference: utils/lightning_utils.py:23-56) with
NCCL all-reduce hidden inside PyTorch-Lightning. On TPU we instead:

- build a 1-D ``jax.sharding.Mesh`` over all devices (axis ``"data"``),
- shard the batch over that axis with ``NamedSharding``,
- replicate parameters,
- and let XLA insert the ICI collectives (psum of gradients falls out of
  jit-compiling the global-batch loss; no hand-written comm layer).

Multi-host: call :func:`initialize_distributed` once per process before any
JAX call; each host then feeds its local shard via
``jax.make_array_from_process_local_data``.

Metric semantics match the reference's ``sync_dist=True`` logging (mean over
the global batch) automatically, because losses are means over the *global*
(sharded) batch inside one jitted program.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"


def initialize_distributed(**kwargs: Any) -> None:
    """Multi-host init over DCN (no-op on a single process)."""
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a device mesh. Default: 1-D data-parallel mesh over all devices.

    ``shape`` allows multi-axis meshes (e.g. ``(4, 2)`` with
    ``axis_names=("data", "model")``) for models that want parameter sharding
    on top of data parallelism.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4, batch_axis: int = 0) -> NamedSharding:
    """Sharding that splits the batch dim over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_shard(x: jax.Array) -> jax.Array:
    """Constrain a batched tensor's leading axis to ``P("data")`` against the
    ambient mesh (``jax.set_mesh``).

    This is the sampler-side counterpart of :func:`shard_batch`: samplers
    start from generated noise rather than host data, so without a
    constraint GSPMD sees only replicated operands and replicates the whole
    sampling chain — on an N-chip mesh, N-1 chips compute identical samples.
    Constraining the initial noise makes the entire ``lax.scan`` denoising
    chain batch-partitioned (the carry sharding propagates), turning
    validation grids and FID@10k generation into data-parallel work.

    A mechanical no-op when there is no ambient mesh or it lacks a data
    axis, so single-chip sampling and serving exports are untouched. Uneven
    batches are fine (GSPMD pads the trailing shard).
    """
    am = jax.sharding.get_abstract_mesh()
    if am.empty or DATA_AXIS not in am.axis_names:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def process_local_slice(
    x: np.ndarray,
    batch_axis: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This process's contiguous slice of a global batch.

    The reference divides the batch size by world size and lets the
    DistributedSampler pick per-rank rows (reference data/datamodule.py:33);
    here every host materializes the same seeded global batch and contributes
    rows ``[p*B/n, (p+1)*B/n)`` — deterministic, no sampler state.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    size = x.shape[batch_axis]
    if size % n != 0:
        raise ValueError(f"global batch {size} not divisible by {n} processes")
    per = size // n
    idx = [slice(None)] * x.ndim
    idx[batch_axis] = slice(p * per, (p + 1) * per)
    return x[tuple(idx)]


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Place a (possibly nested) host batch on device, sharded on the batch dim.

    Replaces the reference's per-process batch division
    (data/datamodule.py:33): here the *global* batch array is laid out across
    the mesh's data axis, so per-device batch = global / n_devices without any
    manual bookkeeping. Multi-host: every host's DataModule yields the
    identical seeded global batch, and each process materialises only the
    index slices its addressable shards need (``make_array_from_callback``).
    This is correct for ANY mesh/process layout — including meshes where a
    *model* or *stage* axis spans processes (dp1 x tp2 on two hosts: the data
    axis is size 1, so every process's devices need the full batch, not a
    process_count-th of it — the r3 process_local_slice scheme broke there).
    """

    multi_host = jax.process_count() > 1

    def _place(x: Any) -> jax.Array:
        x = np.asarray(x)
        if x.ndim <= batch_axis:
            return jax.device_put(x, replicated_sharding(mesh))
        sharding = batch_sharding(mesh, x.ndim, batch_axis)
        if multi_host:
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_place, batch)


def fsdp_sharding(
    x: Any,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    min_size: int = 2**16,
) -> NamedSharding:
    """FSDP sharding rule for one state leaf: shard the largest dimension
    divisible by the mesh axis size; replicate small or indivisible leaves.

    This is ZeRO-3 / FSDP expressed the TPU way (scaling-book recipe): the
    sharding is a *layout annotation* and XLA's SPMD partitioner inserts the
    all-gather at each parameter's use site and the reduce-scatter on its
    gradient — no wrapper modules or hand-written comm (contrast: torch FSDP
    wraps every module). The rule is a pure function of the leaf shape, so
    checkpoint restore and resume re-derive identical shardings.

    ``min_size`` keeps tiny leaves (biases, norm scales) replicated: sharding
    a 64-element bias saves nothing and adds a collective.
    """
    n = mesh.shape[axis]
    shape = tuple(getattr(x, "shape", ()))
    size = int(np.prod(shape)) if shape else 0
    if n <= 1 or size < min_size:
        return NamedSharding(mesh, P())
    candidates = [d for d in range(len(shape)) if shape[d] % n == 0]
    if not candidates:
        return NamedSharding(mesh, P())
    d = max(candidates, key=lambda i: shape[i])
    spec: list = [None] * len(shape)
    spec[d] = axis
    return NamedSharding(mesh, P(*spec))


# -- tensor parallelism (Megatron-style, DiT backbone) -----------------------
#
# The classic 2-collective-per-block recipe (Shoeybi et al. 2019,
# arXiv:1909.08053), expressed the TPU way: PartitionSpec annotations on the
# parameter leaves, GSPMD inserts the psums. Per transformer block:
#
# - qkv Dense: COLUMN-parallel (kernel [hidden, 3hd] sharded on the output
#   dim). With the DiT "h3d" packed layout a contiguous channel shard is a
#   whole-head group, so attention itself runs embarrassingly parallel over
#   local heads (the fused VMEM Pallas kernel declares the channel dim
#   partitionable — see ops/attention.py) with ZERO collectives.
# - attention proj Dense: ROW-parallel (kernel [hd, hidden] sharded on the
#   input dim) — consumes the head-sharded activation directly; GSPMD adds
#   ONE psum over the model axis to produce the replicated residual.
# - MLP fc1: column-parallel; fc2: row-parallel — same pattern, one psum.
#
# Everything else (LayerNorms, adaLN modulation, embeddings, head) is
# replicated: tiny, and keeping the residual stream replicated over the
# model axis is what bounds the comm at 2 psums/block.

_TP_COLUMN = ("qkv", "fc1")  # kernel out-dim + bias sharded
_TP_ROW = ("proj", "fc2")  # kernel in-dim sharded, bias replicated
# Expert parallelism (MoE blocks, models/modules/moe.py): the expert-major
# parameters shard on dim 0, one expert group per model-axis slice; GSPMD
# turns the dispatch/combine einsums into the all-to-all exchange. The
# router Dense stays replicated (tiny, and every chip routes its tokens).
_TP_EXPERT = ("wi", "wo", "bi", "bo")  # leaves under a module named "moe"


def _path_names(path: Any) -> list:
    names = []
    for k in path:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                names.append(str(getattr(k, attr)))
                break
    return names


def tp_sharding(path: Any, x: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """Tensor-parallel sharding for one state leaf, selected by tree path.

    Matches the DiT block's Dense modules by name anywhere in the tree, so
    the same rule shards ``params``, the EMA copy, and the optax moments
    (their subtrees mirror the param tree). Unmatched leaves replicate.
    """
    names = _path_names(path)
    n = mesh.shape[axis]
    shape = tuple(getattr(x, "shape", ()))
    if n <= 1 or len(names) < 2:
        return NamedSharding(mesh, P())
    mod, leaf = names[-2], names[-1]
    spec = None
    if mod in _TP_COLUMN and leaf == "kernel" and len(shape) == 2:
        spec = P(None, axis)
    elif mod in _TP_COLUMN and leaf == "bias" and len(shape) == 1:
        spec = P(axis)
    elif mod in _TP_ROW and leaf == "kernel" and len(shape) == 2:
        spec = P(axis, None)
    elif mod == "moe" and leaf in _TP_EXPERT and len(shape) >= 2:
        spec = P(axis, *([None] * (len(shape) - 1)))
    if spec is None:
        return NamedSharding(mesh, P())
    dim = next(i for i, a in enumerate(spec) if a == axis)
    if shape[dim] % n:
        raise ValueError(
            f"tensor-parallel leaf {'/'.join(names[-4:])} has dim {dim} of "
            f"size {shape[dim]}, not divisible by the {n}-way model axis"
        )
    return NamedSharding(mesh, spec)


# -- pipeline parallelism (GPipe schedule, DiT backbone) ---------------------
#
# models/diffusion/pipeline.py stacks each stage's block parameters on a
# leading stage axis (nn.vmap over stages); the sharding rule below places
# that axis on the mesh's "stage" axis so each chip holds 1/S of the block
# weights and GSPMD lowers the schedule's stage-shifts to collective
# permutes. Everything outside the stacked stack (patch embed, conditioning
# MLPs, final head — tiny) replicates.


def pp_sharding(path: Any, x: Any, mesh: Mesh, axis: str = STAGE_AXIS):
    """Pipeline-parallel sharding for one state leaf: leaves under the
    scanned ``pipeline`` module carry a leading stage dimension — shard it
    over the stage axis; replicate everything else. Path-based like
    :func:`tp_sharding`, so the same rule shards params, EMA, and the optax
    moments."""
    names = _path_names(path)
    n = mesh.shape[axis]
    shape = tuple(getattr(x, "shape", ()))
    if n <= 1 or "pipeline" not in names or not shape:
        return NamedSharding(mesh, P())
    if shape[0] % n:
        raise ValueError(
            f"pipeline leaf {'/'.join(names[-4:])} has stage dim {shape[0]}, "
            f"not divisible by the {n}-way stage axis (set "
            "pipeline_stages == pp_size)"
        )
    return NamedSharding(mesh, P(axis, *([None] * (len(shape) - 1))))


def shard_state(
    tree: Any,
    mesh: Mesh,
    fsdp: bool = False,
    min_size: int = 2**16,
    tp: bool = False,
    pp: bool = False,
) -> Any:
    """Place a TrainState pytree on the mesh: replicated (data-parallel
    default), FSDP-sharded (params + optimizer moments + EMA distributed
    over the data axis; XLA inserts all-gather/reduce-scatter),
    tensor-parallel (Megatron rules over the mesh's "model" axis, see
    :func:`tp_sharding`), or pipeline-parallel (stage-stacked block leaves
    over the mesh's "stage" axis, see :func:`pp_sharding`); ``fsdp``/``tp``/
    ``pp`` are mutually exclusive.

    Multi-host: every process holds the full host value (seeded init or
    checkpoint restore), so each leaf's global array is assembled via
    ``make_array_from_callback`` — each host materialises only the index
    slices of its addressable shards.
    """
    if sum((fsdp, tp, pp)) > 1:
        raise ValueError("fsdp, tp and pp sharding are mutually exclusive")
    if not fsdp and not tp and not pp:
        return replicate(tree, mesh)
    multi_host = jax.process_count() > 1

    def _put(x: Any, sharding: NamedSharding) -> jax.Array:
        if multi_host:
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx]
            )
        return jax.device_put(x, sharding)

    if tp:
        return jax.tree_util.tree_map_with_path(
            lambda path, x: _put(x, tp_sharding(path, x, mesh)), tree
        )

    if pp:
        return jax.tree_util.tree_map_with_path(
            lambda path, x: _put(x, pp_sharding(path, x, mesh)), tree
        )

    return jax.tree_util.tree_map(
        lambda x: _put(x, fsdp_sharding(x, mesh, min_size=min_size)), tree
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh.

    Multi-host: ``jax.device_put`` cannot target non-addressable devices, so
    the global replicated array is assembled from each host's (identical)
    local copy — every process must hold the same values (true for seeded
    init and checkpoint restores).
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def to_host(x: Any) -> np.ndarray:
    """Fetch a device array to host numpy, assembling across processes.

    Sampler outputs are sharded over the data axis (:func:`data_shard`);
    on a multi-host run that axis spans non-addressable devices, and
    ``jax.device_get`` raises ``spans non-addressable devices``. Here the
    global array is gathered with ``multihost_utils.process_allgather``
    (tiled: concatenated along the existing sharded axis) so every host
    returns the full global value — the trainer's validation grids and
    FID/KID/IS updates then see exactly what a single-process run sees.
    Single-process (even with a multi-chip mesh) stays a plain device_get.
    """
    if jax.process_count() > 1 and isinstance(x, jax.Array) \
            and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def local_batch_size(global_batch_size: int, mesh: Optional[Mesh] = None) -> int:
    """Per-device batch size for a global batch on this mesh."""
    n = int(np.prod(mesh.devices.shape)) if mesh is not None else jax.device_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"{n} devices"
        )
    return global_batch_size // n
