"""2-D toy datasets: Gaussian8, Gaussian25, SwissRoll + DataStreamer.

Semantics match ddpm_torch/toy/toy_data.py exactly:
  * Gaussian8 (toy_data.py:34-55): 8 modes = scale * 8th roots of unity
    (scale 2), per-mode stdev 0.02, data divided by the total stdev
    sqrt(noise^2 + scale^2 * 0.5);
  * Gaussian25 (58-75): modes = scale * {-2..2}^2 grid assigned round-robin
    (arange(size) % 25), stdev 0.05, divided by sqrt(noise^2 + scale^2 * 2);
  * SwissRoll (78-112): sklearn make_swiss_roll x/z slice divided by the
    per-axis analytic stdevs sqrt(39 pi^2/8 - 4 -/+ 0.25 + noise^2);
  * DataStreamer (115-146): one epoch of num_batches batches per __iter__
    pass, optional resample at epoch end.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

__all__ = ["Gaussian8", "Gaussian25", "SwissRoll", "DataStreamer", "TOY_DATASETS"]


class ToyDataset:
    def __init__(self, size: int, stdev: float, random_state: Optional[int] = None):
        self.size = size
        self.noise = stdev
        self.random_state = random_state
        self.stdev = self._calc_stdev()
        self.data = self._sample()

    def _calc_stdev(self):
        raise NotImplementedError

    def _sample(self) -> np.ndarray:
        raise NotImplementedError

    def resample(self) -> None:
        self.data = self._sample()

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, i):
        return self.data[i]


class Gaussian8(ToyDataset):
    scale = 2

    def __init__(self, size, stdev: float = 0.02, random_state: Optional[int] = 1234):
        self.modes = self.scale * np.array(
            [
                (math.cos(0.25 * t * math.pi), math.sin(0.25 * t * math.pi))
                for t in range(8)
            ],
            dtype=np.float32,
        )
        super().__init__(size, stdev, random_state)

    def _calc_stdev(self):
        # law of total variance; x-y symmetric
        return math.sqrt(self.noise**2 + (self.scale**2) * 0.5)

    def _sample(self):
        rng = np.random.default_rng(self.random_state)
        data = self.noise * rng.standard_normal((self.size, 2), dtype=np.float32)
        data += self.modes[rng.integers(0, 8, size=self.size)]
        return data / self.stdev


class Gaussian25(ToyDataset):
    scale = 2

    def __init__(self, size, stdev: float = 0.05, random_state: Optional[int] = 1234):
        self.modes = self.scale * np.array(
            [(i, j) for i in range(-2, 3) for j in range(-2, 3)], dtype=np.float32
        )
        super().__init__(size, stdev, random_state)

    def _calc_stdev(self):
        return math.sqrt(self.noise**2 + (self.scale**2) * 2.0)

    def _sample(self):
        rng = np.random.default_rng(self.random_state)
        data = self.noise * rng.standard_normal((self.size, 2), dtype=np.float32)
        data += self.modes[np.arange(self.size) % 25]
        return data / self.stdev


class SwissRoll(ToyDataset):
    def __init__(self, size, stdev: float = 0.25, random_state: Optional[int] = 1234):
        super().__init__(size, stdev, random_state)

    def _calc_stdev(self):
        # analytic covariate stdevs of the x/z slice (toy_data.py:82-106)
        stdev = np.empty((1, 2))
        stdev.fill(39 * math.pi**2 / 8 - 4)
        stdev += np.array([[-1, 1]]) * 0.25 + self.noise**2
        return np.sqrt(stdev)

    def _sample(self):
        from sklearn.datasets import make_swiss_roll

        data = make_swiss_roll(self.size, noise=self.noise, random_state=self.random_state)[
            0
        ][:, [0, 2]].astype(np.float32)
        return (data / self.stdev).astype(np.float32)


TOY_DATASETS = {"gaussian8": Gaussian8, "gaussian25": Gaussian25, "swissroll": SwissRoll}


class DataStreamer:
    """One epoch of ``num_batches`` batches per iteration pass, with optional
    resampling at epoch end (reference: toy_data.py:115-146)."""

    def __init__(self, dataset: str, batch_size: int, num_batches: int, resample: bool = False):
        cls = TOY_DATASETS[dataset]
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.resample = resample
        self.dataset = cls(batch_size * num_batches, random_state=None)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self):
        for cnt in range(self.num_batches):
            start = cnt * self.batch_size
            yield self.dataset.data[start : start + self.batch_size]
        if self.resample:
            self.dataset.resample()
