"""Datasets: MNIST / CIFAR-10 / CelebA / CelebA-HQ, parsed natively.

The reference leans on torchvision (ddpm_torch/datasets.py); this framework
parses the raw archives directly (MNIST idx files, CIFAR-10 python pickles,
CelebA image folder + list_eval_partition.txt, CelebA-HQ image folder) into
numpy, so the input pipeline has no torch dependency and feeds batched NHWC
uint8 straight to the device feed.

Each dataset yields **uint8 NHWC** images at its training resolution; the
loader applies the random flip + [-1,1] normalization per batch
(data/transforms.py). A ``FakeData`` dataset provides synthetic images for
benchmarks and tests.

Split semantics match the reference:
  MNIST 60k/10k (datasets.py:28-44); CIFAR-10 50k/10k with train-split
  horizontal flips (47-65); CelebA train/valid/test/all via the official
  partition file (72-153); CelebA-HQ 30k images, sorted then shuffled with
  RandomState(123) to reproduce legacy ProGAN order (156-198).
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct as _struct
from typing import List, Optional

import numpy as np

from .registry import register_dataset
from .transforms import resize_batch

__all__ = [
    "MNIST",
    "CIFAR10",
    "CelebA",
    "CelebA_HQ",
    "FakeData",
    "Blobs",
    "Blobs64",
    "Blobs256",
    "ROOT",
]

ROOT = os.path.expanduser("~/datasets")


class ArrayDataset:
    """In-memory uint8 NHWC dataset."""

    random_flip: bool = False

    def __init__(self, images: np.ndarray):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images

    def __len__(self) -> int:
        return len(self.images)

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        return self.images[indices]


class FileDataset:
    """Lazily-decoded image-folder dataset (decode on batch fetch).

    Decoding runs on a persistent thread pool (the reference's
    num_workers role, ddpm_torch/train.py:139): PIL/numpy decode releases
    the GIL, and reusing the pool avoids thread spawn/teardown per batch.
    """

    random_flip: bool = False

    def __init__(self, files: List[str], decode, num_workers: int = 16):
        self.files = files
        self._decode = decode
        self._num_workers = num_workers
        self._pool = None

    def __len__(self) -> int:
        return len(self.files)

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self._num_workers, thread_name_prefix="decode"
            )
        return self._pool

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_pool"] = None  # executors don't pickle; recreate lazily
        return state

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        if getattr(self, "images", None) is not None:  # materialized
            return self.images[indices]
        paths = [self.files[i] for i in indices]
        return np.stack(list(self._executor().map(self._decode, paths)))

    def materialize(self) -> np.ndarray:
        """Decode the whole folder once into an in-memory uint8 array.

        Bridges disk datasets into device-cache input mode
        (`train.py --device-cache`): after this, the dataset satisfies the
        loader's `.images` contract and the Trainer stages the array to HBM
        once, so per-step host->device traffic is ~1 KB of indices. Worth it
        whenever the decoded uint8 dataset fits HBM next to the model (e.g.
        blobs256/celebahq-shape: 10k x 256^2 x 3 = 2.0 GB) — it removes
        both the per-batch decode cost and the axon per-transfer host-buffer
        leak (docs/performance.md round 4) that otherwise grows with every
        pixel batch shipped. One decode pass over the thread pool; identical
        pixels to the lazy path by construction (same `_decode`).
        """
        if getattr(self, "images", None) is None:
            self.images = np.stack(
                list(self._executor().map(self._decode, self.files))
            )
            assert self.images.dtype == np.uint8
        return self.images


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = _struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = _struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


@register_dataset
class MNIST(ArrayDataset):
    resolution = (32, 32)  # reference resizes 28 -> 32 (datasets.py:33)
    channels = 1
    train_size = 60000
    test_size = 10000

    def __init__(self, root: str = ROOT, split: str = "train", **_):
        base = os.path.join(root, "mnist", "MNIST", "raw")
        if not os.path.isdir(base):
            base = os.path.join(root, "mnist")
        name = "train" if split in ("train", "all") else "t10k"
        for suffix in ("-images-idx3-ubyte", "-images.idx3-ubyte"):
            for ext in ("", ".gz"):
                path = os.path.join(base, f"{name}{suffix}{ext}")
                if os.path.exists(path):
                    break
            else:
                continue
            break
        else:
            raise FileNotFoundError(f"MNIST idx files not found under {base}")
        imgs = _read_idx(path)[..., None]  # (N, 28, 28, 1)
        super().__init__(resize_batch(imgs, 32))


@register_dataset
class CIFAR10(ArrayDataset):
    resolution = (32, 32)
    channels = 3
    train_size = 50000
    test_size = 10000
    random_flip = True  # RandomHorizontalFlip on train (datasets.py:50-55)

    def __init__(self, root: str = ROOT, split: str = "train", **_):
        base = os.path.join(root, "cifar-10-batches-py")
        if not os.path.isdir(base):
            base = os.path.join(root, "cifar10", "cifar-10-batches-py")
        names = (
            [f"data_batch_{i}" for i in range(1, 6)]
            if split in ("train", "all")
            else ["test_batch"]
        )
        chunks = []
        for n in names:
            with open(os.path.join(base, n), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            chunks.append(np.asarray(d[b"data"], np.uint8))
        data = np.concatenate(chunks).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        super().__init__(np.ascontiguousarray(data))


def _decode_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _decode_celeba(path: str) -> np.ndarray:
    """CelebA decode as one PIL pipeline: crop(top 40, left 15, 148x148) ->
    bilinear resize 64 (reference datasets.py:68-69 + Resize(64)). Staying
    in PIL end-to-end skips two PIL<->numpy copies — bit-identical to
    resize_batch(crop_celeba(decode)) and measured 1.4x faster per decode
    (docs/performance.md round 3, file-dataset input path)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").crop((15, 40, 163, 188)).resize((64, 64), Image.BILINEAR)
        return np.asarray(im, np.uint8)


@register_dataset
class CelebA(FileDataset):
    resolution = (64, 64)
    channels = 3
    train_size = 162770
    val_size = 19867
    test_size = 19962
    all_size = 202599
    random_flip = True

    _SPLIT_CODE = {"train": 0, "valid": 1, "val": 1, "test": 2}

    def __init__(self, root: str = ROOT, split: str = "all", **_):
        base = os.path.join(root, "celeba")
        img_dir = os.path.join(base, "img_align_celeba")
        part_file = os.path.join(base, "list_eval_partition.txt")
        with open(part_file) as f:
            rows = [line.split() for line in f if line.strip()]
        if split == "all":
            names = [r[0] for r in rows]
        else:
            code = self._SPLIT_CODE[split]
            names = [r[0] for r in rows if int(r[1]) == code]
        files = [os.path.join(img_dir, n) for n in names]

        super().__init__(files, _decode_celeba)


@register_dataset
class CelebA_HQ(FileDataset):
    resolution = (256, 256)
    channels = 3
    all_size = 30000
    random_flip = True

    def __init__(self, root: str = ROOT, split: str = "all", **_):
        img_dir = os.path.join(root, "celeba_hq", "img_celeba_hq")
        # The canonical ordering filters to .png and sorts numerically by the
        # filename stem BEFORE the seeded shuffle; lexicographic sorting would
        # permute non-zero-padded names ("2.png" vs "10.png") differently and
        # break the legacy ProGAN order (ddpm_torch/datasets.py:181-186).
        names = sorted(
            (n for n in os.listdir(img_dir) if n.endswith(".png")),
            key=lambda n: int(n[:-4]),
        )
        # legacy ProGAN order: deterministic shuffle with seed 123
        # (ddpm_torch/datasets.py:186)
        np.random.RandomState(123).shuffle(names)
        files = [os.path.join(img_dir, n) for n in names]
        super().__init__(files, _decode_image)


def _make_blobs(n: int, res, seed: int, max_blobs: int = 3) -> np.ndarray:
    """Synthesize ``n`` h*w*3 uint8 images: a smooth two-color vertical
    gradient background with 1..max_blobs alpha-composited Gaussian color
    blobs at random centers/radii/colors. ``res`` is an int (square) or an
    ``(h, w)`` pair (e.g. CelebA's raw 218x178 geometry for the on-disk
    variant). Deterministic given (n, res, seed) — for square res the draw
    order is identical to the historical int-only version, so existing Blobs
    images are bit-stable; chunked so peak scratch memory stays ~100 MB
    regardless of n."""
    h, w = (res, res) if isinstance(res, int) else res
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    grad = (yy / (h - 1))[None, :, :, None]
    out = np.empty((n, h, w, 3), np.uint8)
    chunk = 4096  # fixed: determinism must not depend on caller-visible knobs
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        c_top = rng.uniform(0.0, 1.0, (m, 1, 1, 3)).astype(np.float32)
        c_bot = rng.uniform(0.0, 1.0, (m, 1, 1, 3)).astype(np.float32)
        img = c_top * (1.0 - grad) + c_bot * grad
        k = rng.integers(1, max_blobs + 1, m)
        for j in range(max_blobs):
            cx = rng.uniform(w * 0.15, w * 0.85, (m, 1, 1)).astype(np.float32)
            cy = rng.uniform(h * 0.15, h * 0.85, (m, 1, 1)).astype(np.float32)
            sig = rng.uniform(min(h, w) / 16.0, min(h, w) / 5.0, (m, 1, 1)).astype(
                np.float32
            )
            col = rng.uniform(0.0, 1.0, (m, 1, 1, 3)).astype(np.float32)
            d2 = (xx[None] - cx) ** 2 + (yy[None] - cy) ** 2
            alpha = np.exp(-0.5 * d2 / sig**2)[..., None]
            alpha *= (j < k).astype(np.float32)[:, None, None, None]
            img = img * (1.0 - alpha) + col * alpha
        out[lo : lo + m] = np.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    return out


@register_dataset
class Blobs(ArrayDataset):
    """Procedural *learnable* synthetic distribution at CIFAR-10 shapes.

    Unlike ``FakeData`` (i.i.d. uniform noise — nothing to learn), this
    distribution has strong low-dimensional structure (gradient backgrounds +
    Gaussian blobs), so a diffusion model trained on it exhibits a sharply
    falling FID and visually recognizable samples. It powers the offline
    end-to-end convergence evidence for the flagship UNet — the image-domain
    counterpart of the toy stack's acceptance-signal role in the reference
    (reference README.md:256-306); no reference equivalent exists because the
    reference assumes downloadable datasets.

    train/test splits draw from disjoint seed streams; FID target statistics
    are computed against a fresh test draw (``fid_split``), so the target is
    independent of the training samples.
    """

    resolution = (32, 32)
    channels = 3
    train_size = 50000
    test_size = 10000
    random_flip = True
    fid_split = "test"

    def __init__(
        self,
        root: str = ROOT,
        split: str = "train",
        size: Optional[int] = None,
        resolution: int = 32,
        seed: int = 7,
        **_,
    ):
        n = size or (self.train_size if split in ("train", "all") else self.test_size)
        if split == "test":
            seed = seed + 1  # disjoint from the train stream
        super().__init__(_make_blobs(n, resolution, seed))


@register_dataset
class Blobs64(FileDataset):
    """On-disk Blobs at CelebA geometry — the disk-pipeline convergence
    workload.

    ``scripts/make_blobs_disk.py`` renders the Blobs distribution at the raw
    CelebA frame size (178x218 JPEGs, the real ``img_align_celeba``
    distribution format) into ``<root>/blobs64/{train,test}/``; this class
    then consumes the folder EXACTLY like the production CelebA dataset
    (reference datasets.py:68-153): lazily decoded on the persistent thread
    pool through ``_decode_celeba`` (single-PIL crop(15,40,163,188) ->
    bilinear resize 64), per-epoch seeded file reshuffle in the loader, and
    random flips. It exists so a convergence run can traverse the full disk
    FileDataset path — decode pool, epoch reshuffle over files, prefetch —
    rather than the in-memory ArrayDataset the `blobs` flagship used.

    FID target statistics come from the held-out test folder (fid_split),
    disjoint from the training images by construction (seed streams 7/8).
    """

    resolution = (64, 64)
    channels = 3
    train_size = 40000
    test_size = 10000
    random_flip = True
    fid_split = "test"

    def __init__(self, root: str = ROOT, split: str = "train", **_):
        base = os.path.join(root, "blobs64")
        sub = "train" if split in ("train", "all") else "test"
        img_dir = os.path.join(base, sub)
        if not os.path.isdir(img_dir):
            raise FileNotFoundError(
                f"{img_dir} not found; render it once with "
                f"scripts/make_blobs_disk.py --root {root}"
            )
        files = [
            os.path.join(img_dir, n)
            for n in sorted(os.listdir(img_dir))
            if n.endswith((".jpg", ".png"))
        ]
        super().__init__(files, _decode_celeba)


@register_dataset
class Blobs256(FileDataset):
    """On-disk Blobs at CelebA-HQ geometry — the HQ-shape convergence
    workload.

    ``scripts/make_blobs_disk.py --variant blobs256`` renders the Blobs
    distribution at the CelebA-HQ frame size (256x256 PNGs, the real
    ``img_celeba_hq`` distribution format) into ``<root>/blobs256/``; this
    class consumes the folder EXACTLY like the production CelebA-HQ dataset
    (reference datasets.py:156-198): lazily decoded 256^2 PNGs on the
    persistent thread pool with no crop/resize, per-epoch seeded file
    reshuffle, random flips. It exists so the reference's largest flagship
    *shape* (configs/celebahq.json: 6 levels (1,1,2,2,4,4), attn at level 4,
    batch 64 via num_accum) can be trained to convergence end-to-end on a
    learnable distribution without the (non-downloadable) HQ data.

    FID target statistics come from the held-out test folder (fid_split),
    disjoint from the training images by construction (seed streams 7/8).
    """

    resolution = (256, 256)
    channels = 3
    train_size = 10000
    test_size = 2500
    random_flip = True
    fid_split = "test"

    def __init__(self, root: str = ROOT, split: str = "train", **_):
        base = os.path.join(root, "blobs256")
        sub = "train" if split in ("train", "all") else "test"
        img_dir = os.path.join(base, sub)
        if not os.path.isdir(img_dir):
            raise FileNotFoundError(
                f"{img_dir} not found; render it once with "
                f"scripts/make_blobs_disk.py --variant blobs256 --root {root}"
            )
        files = [
            os.path.join(img_dir, n)
            for n in sorted(os.listdir(img_dir))
            if n.endswith((".jpg", ".png"))
        ]
        super().__init__(files, _decode_image)


@register_dataset
class FakeData(ArrayDataset):
    """Deterministic synthetic uint8 images for benchmarks/tests (not in the
    reference, which has no test data story at all — SURVEY.md §4)."""

    resolution = (32, 32)
    channels = 3
    train_size = 1024
    test_size = 256
    random_flip = True

    def __init__(
        self,
        root: str = ROOT,
        split: str = "train",
        size: Optional[int] = None,
        resolution: int = 32,
        channels: int = 3,
        seed: int = 0,
        **_,
    ):
        n = size or (self.train_size if split in ("train", "all") else self.test_size)
        rng = np.random.default_rng(seed)
        imgs = rng.integers(0, 256, (n, resolution, resolution, channels), dtype=np.uint8)
        super().__init__(np.asarray(imgs))
