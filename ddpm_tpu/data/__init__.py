from . import datasets as _datasets  # noqa: F401 — populates the registry
from .loader import ShardedLoader, get_dataloader, train_val_split
from .registry import DATASET_DICT, DATASET_INFO, fid_stats_split, register_dataset
from .toy import TOY_DATASETS, DataStreamer, Gaussian8, Gaussian25, SwissRoll
from .transforms import crop_celeba, normalize_to_unit, random_hflip, resize_batch, to_uint8

__all__ = [
    "DATASET_DICT",
    "DATASET_INFO",
    "fid_stats_split",
    "register_dataset",
    "get_dataloader",
    "ShardedLoader",
    "train_val_split",
    "DataStreamer",
    "Gaussian8",
    "Gaussian25",
    "SwissRoll",
    "TOY_DATASETS",
    "crop_celeba",
    "normalize_to_unit",
    "random_hflip",
    "resize_batch",
    "to_uint8",
]
