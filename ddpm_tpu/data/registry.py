"""Dataset registry (reference: ddpm_torch/datasets.py:17-25).

``DATASET_DICT`` maps name -> dataset class; ``DATASET_INFO`` exposes the
static attributes (resolution, channels, split sizes) used by the CLIs to
size models and loaders without instantiating datasets.
"""

from __future__ import annotations

from typing import Dict, Type

__all__ = ["register_dataset", "DATASET_DICT", "DATASET_INFO", "fid_stats_split"]

DATASET_DICT: Dict[str, type] = {}
DATASET_INFO: Dict[str, dict] = {}

_INFO_KEYS = (
    "resolution",
    "channels",
    "train_size",
    "test_size",
    "val_size",
    "all_size",
    "fid_split",
)


def fid_stats_split(dataset: str) -> str:
    """Which split FID/PR target statistics are computed from.

    The reference uses the full dataset for CelebA/HQ and the train split
    otherwise (reference eval.py:82-100 with get_dataloader defaults);
    datasets can override via a ``fid_split`` class attribute — Blobs uses a
    fresh test draw so the target statistics are independent of the training
    samples (FID against the train set mildly rewards memorization)."""
    info = DATASET_INFO.get(dataset, {})
    if "fid_split" in info:
        return info["fid_split"]
    return "all" if dataset.startswith("celeba") else "train"


def register_dataset(cls: Type) -> Type:
    name = cls.__name__.lower()
    DATASET_DICT[name] = cls
    DATASET_INFO[name] = {
        k: getattr(cls, k) for k in _INFO_KEYS if hasattr(cls, k)
    }
    return cls
