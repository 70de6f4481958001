"""General utilities: config, seeding, running statistics."""

from __future__ import annotations

import random

import numpy as np

from .config import CONFIG_DIR, ConfigDict, dict2str, get_param, load_config, resolve_config

__all__ = [
    "ConfigDict",
    "get_param",
    "dict2str",
    "load_config",
    "resolve_config",
    "CONFIG_DIR",
    "seed_all",
    "RunningStatistics",
]


def seed_all(seed: int) -> None:
    """Seed host-side RNGs. Device randomness in this framework is explicit
    (jax.random keys), so there is no device RNG to seed."""
    random.seed(seed)
    np.random.seed(seed)


class RunningStatistics:
    """Count-weighted running means for logged scalars
    (reference: ddpm_torch/utils/train.py:29-58)."""

    def __init__(self, **kwargs):
        self.count = 0
        self.stats = {k: (0.0 if v is None else float(v)) for k, v in kwargs.items()}

    def reset(self, *keys):
        if not keys:
            keys = tuple(self.stats.keys())
        for k in keys:
            self.stats[k] = 0.0
        self.count = 0

    def update(self, n: int, **kwargs):
        self.count += n
        for k, v in kwargs.items():
            self.stats[k] = self.stats.get(k, 0.0) + float(v) * n

    def extract(self):
        if self.count == 0:
            return dict(self.stats)
        return {k: v / self.count for k, v in self.stats.items()}

    def __repr__(self):
        return f"RunningStatistics(count={self.count}, {self.extract()})"
