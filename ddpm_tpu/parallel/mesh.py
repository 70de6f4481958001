"""Device mesh construction and sharding helpers (SPMD data parallelism).

The reference's NCCL/DDP stack (mp.spawn + FileStore / torchrun + TCPStore,
DistributedSampler, gradient allreduce; ddpm_torch/train.py:75-111) collapses
on TPU into a single SPMD program: build a 1-D ``Mesh`` over all chips, shard
the batch axis with a ``NamedSharding``, replicate parameters, and let XLA
insert the gradient ``psum`` over ICI during the jitted train step. Multi-host
(DCN) uses the same program after ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_slice",
    "addressable_rows",
    "to_numpy_global",
    "init_distributed",
]

DATA_AXIS = "data"


def init_distributed(**kwargs) -> None:
    """Multi-host init (no-op on a single host). Mirrors the role of
    dist.init_process_group (ddpm_torch/train.py:86-97); rendezvous is
    handled by the TPU runtime rather than FileStore/TCPStore."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process run


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a host batch with the leading axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh, axis))


def addressable_rows(x, limit: Optional[int] = None) -> np.ndarray:
    """Host-local rows of a batch-sharded global array, in global order,
    keeping only global row indices < ``limit``.

    This is the SPMD equivalent of the reference's rank-sharded bulk
    generation (each mp.spawn worker writes only its own shard,
    generate.py:105-110, 160-166): on multi-host, every process extracts the
    rows its devices own and writes those; single-host it equals
    ``np.asarray(x)[:limit]``.
    """
    out = []
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        data = np.asarray(s.data)
        if limit is not None:
            keep = max(0, min(len(data), limit - start))
            data = data[:keep]
        if len(data):
            out.append((start, data))
    if not out:
        return np.empty((0,) + x.shape[1:], x.dtype)
    out.sort(key=lambda t: t[0])
    return np.concatenate([d for _, d in out])


def to_numpy_global(x) -> np.ndarray:
    """Materialize a (possibly multi-host-sharded) global array on every
    host. Fully-addressable arrays convert directly; otherwise the shards
    ride an all-gather (replaces the reference's dist.all_gather sample
    assembly, ddpm_torch/utils/train.py:183-187)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def local_batch_slice(global_batch: int, axis_size: Optional[int] = None) -> int:
    """Per-device batch when a global batch is split over the mesh
    (reference: batch_size // WORLD_SIZE, ddpm_torch/datasets.py:244-245)."""
    n = axis_size or jax.device_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
