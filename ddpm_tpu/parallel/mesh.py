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


def local_batch_slice(global_batch: int, axis_size: Optional[int] = None) -> int:
    """Per-device batch when a global batch is split over the mesh
    (reference: batch_size // WORLD_SIZE, ddpm_torch/datasets.py:244-245)."""
    n = axis_size or jax.device_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
