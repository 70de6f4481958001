"""Sharded, seeded batch loader — the DistributedSampler equivalent.

Reference semantics being reproduced (ddpm_torch/datasets.py:226-266):
  * per-epoch seeded shuffle: DistributedSampler(shuffle=True, seed) uses
    seed + epoch; here ``epoch_indices(epoch)`` permutes with
    ``default_rng(seed + epoch)``;
  * per-process strided shard: rank r takes indices [r::num_shards] after
    padding to a multiple of the world size (DistributedSampler pads by
    wrap-around); here the shard is the JAX process;
  * global batch divided by world size (datasets.py:244-245): the loader
    yields the per-host slice, which is then device_put with a batch-axis
    NamedSharding over the local devices.
  * drop_last: partial global batches are dropped for static shapes (the
    reference's train path recommends this for cudnn autotune; on TPU it is
    required to avoid recompiles).

Transforms (random flip + [-1,1] normalize) run here, vectorized per batch.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np

from .registry import DATASET_DICT
from .transforms import normalize_to_unit, random_hflip

__all__ = ["ShardedLoader", "get_dataloader", "train_val_split"]


def train_val_split(n_train: int, val_size: float, random_seed: Optional[int] = None):
    """Seeded permutation split (reference: datasets.py:204-211)."""
    rng = np.random.RandomState(random_seed) if random_seed is not None else np.random
    inds = np.arange(n_train)
    rng.shuffle(inds)
    n_val = int(n_train * val_size)
    return inds[n_val:], inds[:n_val]


class ShardedLoader:
    """Iterates (epoch-shuffled, host-sharded) float32 NHWC batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        indices: Optional[np.ndarray] = None,
        raw: bool = False,
        device_normalize: bool = False,
        yield_indices: bool = False,
    ):
        """``device_normalize``: yield uint8 batches (flips still applied
        host-side) and let the jitted train step do the [-1,1] normalize —
        4x less host->device transfer, which matters on tunneled TPUs.

        ``yield_indices``: device-resident dataset mode — yield
        ``(batch_idx int32, flips uint8|None)`` instead of pixel batches;
        the Trainer stages the whole in-memory uint8 dataset to HBM once and
        gathers/flips each batch ON DEVICE, so per-step host->device traffic
        drops from the batch (~1.5 MB at 64^2) to ~1 KB of indices. This is
        both the fast path (no host gather at all) and the leak-proof path:
        the axon tunnel client leaks its host transfer buffer on every
        ``device_put`` (measured ~bytes-transferred per call,
        docs/performance.md round 4 — a 130 GB OOM after 70k disk batches),
        so shipping KBs instead of MBs is a 1000x smaller exposure. The flip
        RNG stream is identical to the host paths (``rng.random(n) < 0.5``),
        pinned by test. Requires an in-memory uint8 dataset (``.images``).
        Works multi-process too: each process yields its strided index
        shard and the Trainer assembles the global (B,) arrays the same way
        it assembles pixel batches."""
        if batch_size % num_shards != 0:
            raise ValueError(f"batch {batch_size} not divisible by {num_shards} shards")
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // num_shards
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.base_indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )
        self.raw = raw
        self.device_normalize = device_normalize
        self.yield_indices = yield_indices
        if yield_indices and not (
            hasattr(dataset, "images") and getattr(dataset.images, "dtype", None) == np.uint8
        ):
            raise ValueError(
                "yield_indices (device-cache) needs an in-memory uint8 "
                f"dataset with an .images array; {type(dataset).__name__} "
                "has none (disk FileDatasets can opt in by materializing "
                "first — get_dataloader does this automatically)"
            )
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.base_indices)
        per_shard = math.ceil(n / self.num_shards) if not self.drop_last else n // self.num_shards
        fn = math.floor if self.drop_last else math.ceil
        return max(int(fn(per_shard / self.local_batch)), 0 if self.drop_last else 1)

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle (reference: sampler.set_epoch, train.py loop)."""
        self.epoch = epoch

    def _shard_indices(self) -> np.ndarray:
        idx = self.base_indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        if self.num_shards > 1:
            # pad by wrap-around so every shard sees the same count
            pad = (-len(idx)) % self.num_shards
            if pad and not self.drop_last:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_index :: self.num_shards]
        return idx

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = self._shard_indices()
        rng = np.random.default_rng((self.seed + self.epoch) * 2654435761 % (2**31))
        n_full = len(idx) // self.local_batch
        end = n_full * self.local_batch if self.drop_last else len(idx)
        do_flip = getattr(self.dataset, "random_flip", False)
        # native fast path: in-memory uint8 arrays go through the C++
        # gather+flip+normalize kernel (GIL-free, multithreaded)
        from .. import native

        in_memory_u8 = (
            hasattr(self.dataset, "images")
            and getattr(self.dataset.images, "flags", None) is not None
            and self.dataset.images.flags.c_contiguous
        )
        use_native = not self.raw and not self.device_normalize and in_memory_u8 and native.available()
        # device_normalize path: uint8 in, uint8 out — the C++ kernel does
        # the gather + flips (numpy would copy per-image in Python otherwise)
        use_native_u8 = (
            not self.raw and self.device_normalize and in_memory_u8 and native.u8_available()
        )
        for start in range(0, end, self.local_batch):
            batch_idx = idx[start : start + self.local_batch]
            if self.yield_indices:
                flips = (
                    (rng.random(len(batch_idx)) < 0.5).astype(np.uint8)
                    if do_flip
                    else None
                )
                yield batch_idx.astype(np.int32), flips
                continue
            if use_native or use_native_u8:
                flips = (
                    (rng.random(len(batch_idx)) < 0.5).astype(np.uint8)
                    if do_flip
                    else None
                )
                kernel = native.gather_flip_u8 if use_native_u8 else native.gather_flip_normalize
                yield kernel(self.dataset.images, batch_idx, flips)
                continue
            batch = self.dataset.get_batch(batch_idx)
            if self.raw:
                yield batch
                continue
            if do_flip:
                batch = random_hflip(batch, rng)
            if self.device_normalize:
                yield batch  # uint8; the train step normalizes on device
                continue
            yield normalize_to_unit(batch)


def get_dataloader(
    dataset: str,
    batch_size: int,
    split: str,
    val_size: float = 0.0,
    random_seed: Optional[int] = None,
    root: Optional[str] = None,
    drop_last: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
    raw: bool = False,
    device_normalize: bool = False,
    yield_indices: bool = False,
    **kwargs,
):
    """Factory mirroring the reference's get_dataloader contract
    (datasets.py:226-266) — returns (loader, loader); the loader doubles as
    its own sampler (set_epoch lives on it)."""
    from .datasets import ROOT

    cls = DATASET_DICT[dataset]
    ds_split = "all" if split == "all" else ("train" if split in ("train", "val") else "test")
    ds = cls(root=root or ROOT, split=ds_split, **kwargs)
    if yield_indices and not hasattr(ds, "images") and hasattr(ds, "materialize"):
        # disk dataset + device-cache: decode the folder once up front so
        # the whole uint8 dataset can live in HBM (FileDataset.materialize)
        import time as _time

        t0 = _time.time()
        imgs = ds.materialize()
        print(
            f"materialized {dataset} ({len(imgs)} images, "
            f"{imgs.nbytes / 1e9:.2f} GB uint8) for device-cache in "
            f"{_time.time() - t0:.1f}s",
            flush=True,
        )
    indices = None
    if split in ("train", "val") and val_size > 0:
        train_inds, val_inds = train_val_split(len(ds), val_size, random_seed)
        indices = train_inds if split == "train" else val_inds
    shuffle = split in ("train", "all") and not raw
    loader = ShardedLoader(
        ds,
        batch_size,
        shuffle=shuffle,
        seed=random_seed or 0,
        drop_last=drop_last,
        num_shards=num_shards,
        shard_index=shard_index,
        indices=indices,
        raw=raw,
        device_normalize=device_normalize,
        yield_indices=yield_indices,
    )
    return loader, loader
