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
    "stage_global_batch",
    "stage_replicated",
    "data_parallel_extractor",
]

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
    **kwargs,
) -> None:
    """Multi-host init. Mirrors the role of dist.init_process_group
    (ddpm_torch/train.py:86-97); rendezvous is the JAX coordinator service
    rather than FileStore/TCPStore.

    MUST run before any other JAX API initializes the backend (the CLIs call
    it first thing when ``--distributed`` is passed). Explicit args take
    precedence; with none, ``jax.distributed.initialize()`` auto-detects the
    cluster (TPU pod metadata, Slurm, OMPI). No-op unless arguments are given,
    ``force`` is set, or a coordinator address is in the environment — so
    plain single-host runs never attempt a rendezvous.
    """
    import os

    configured = (
        force
        or coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or bool(kwargs)
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_IP")
    )
    if not configured:
        return
    already_up = getattr(jax.distributed, "is_initialized", None)
    if already_up is not None and already_up():
        return  # idempotent: launcher or a previous call initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        # Fallback idempotency for jax versions without is_initialized():
        # a second initialize raises "should only be called once".
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return
        raise


def stage_global_batch(
    batch, mesh: Mesh, axis: str = DATA_AXIS, sharding: Optional[NamedSharding] = None
):
    """Stage one *process-local* host batch as the global, batch-sharded
    device array.

    Single-process: a plain async ``device_put`` with the batch sharding.
    Multi-process SPMD: each process holds only its shard (the loader yields
    ``global_batch // process_count`` rows), so the global array is assembled
    with ``jax.make_array_from_process_local_data`` (SURVEY §2.6 — the
    DistributedSampler + DDP input contract, ddpm_torch/datasets.py:244-245).
    """
    if sharding is None:
        sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(batch))
    return jax.device_put(batch, sharding)


def stage_replicated(x, mesh: Mesh):
    """Stage identical host data as a fully-replicated global array.

    Single-process: plain ``device_put``. Multi-process SPMD: every process
    holds the same full value (e.g. the device-cache dataset — in-memory
    datasets are constructed whole on every host, only *indices* are
    sharded), so the global replicated array assembles from each process's
    local copy without communication.
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


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


def data_parallel_extractor(fn, variables, mesh: Optional[Mesh] = None, axis: str = DATA_AXIS):
    """Wrap a jitted feature/inference function so each call's batch is
    sharded over the local device mesh — the SPMD stand-in for the
    reference's single-node ``nn.DataParallel`` metric-model replication
    (fid_score.py:111-113, precision_recall.py:127-130).

    ``fn(variables, x) -> features``. Variables are replicated once up
    front; per call the host batch is padded to a multiple of the mesh size
    (static shapes, so each distinct padded size compiles once), device_put
    with a batch-axis NamedSharding, and the pad rows dropped on return.
    """
    if mesh is None:
        # metric replication is single-node in the reference; local devices
        # keep device_put fully addressable under multi-host runs too
        mesh = make_mesh(jax.local_devices())
    n = mesh.devices.size
    variables = jax.device_put(variables, replicated_sharding(mesh))
    jfn = jax.jit(fn)
    sharding = batch_sharding(mesh, axis)

    def extract(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)  # lists / array-likes: same contract as before
        b = x.shape[0]
        pad = (-b) % n
        if pad:
            if isinstance(x, jax.Array):
                # pad on device — no host round trip for sampler outputs
                import jax.numpy as jnp

                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
            else:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        out = jfn(variables, jax.device_put(x, sharding))
        return out[:b]

    return extract
