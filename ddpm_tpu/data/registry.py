"""Dataset registry (reference: ddpm_torch/datasets.py:17-25).

``DATASET_DICT`` maps name -> dataset class; ``DATASET_INFO`` exposes the
static attributes (resolution, channels, split sizes) used by the CLIs to
size models and loaders without instantiating datasets.
"""

from __future__ import annotations

from typing import Dict, Type

__all__ = ["register_dataset", "DATASET_DICT", "DATASET_INFO"]

DATASET_DICT: Dict[str, type] = {}
DATASET_INFO: Dict[str, dict] = {}

_INFO_KEYS = ("resolution", "channels", "train_size", "test_size", "val_size", "all_size")


def register_dataset(cls: Type) -> Type:
    name = cls.__name__.lower()
    DATASET_DICT[name] = cls
    DATASET_INFO[name] = {
        k: getattr(cls, k) for k in _INFO_KEYS if hasattr(cls, k)
    }
    return cls
