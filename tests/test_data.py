"""Data pipeline tests: registry, sharded loader semantics, toy stats."""

import numpy as np
import pytest

from ddpm_tpu.data import DATASET_DICT, DATASET_INFO
from ddpm_tpu.data.datasets import FakeData
from ddpm_tpu.data.loader import ShardedLoader, train_val_split
from ddpm_tpu.data.toy import DataStreamer, Gaussian8, Gaussian25, SwissRoll
from ddpm_tpu.data.transforms import normalize_to_unit, random_hflip, to_uint8


def test_registry_contains_all_datasets():
    for name in ("mnist", "cifar10", "celeba", "celeba_hq", "fakedata"):
        assert name in DATASET_DICT, name
        assert name in DATASET_INFO


def test_dataset_info_static():
    assert DATASET_INFO["cifar10"]["train_size"] == 50000
    assert DATASET_INFO["celeba"]["all_size"] == 202599
    assert DATASET_INFO["mnist"]["resolution"] == (32, 32)


def test_loader_epoch_shuffle_deterministic():
    ds = FakeData(size=64, resolution=8)
    a = ShardedLoader(ds, 16, seed=1)
    b = ShardedLoader(ds, 16, seed=1)
    a.set_epoch(2), b.set_epoch(2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epoch -> different order
    b.set_epoch(3)
    diff = any(not np.array_equal(x, y) for x, y in zip(a, b))
    assert diff


def test_loader_sharding_partitions():
    """Shards see disjoint, collectively-exhaustive examples per epoch."""
    ds = FakeData(size=64, resolution=8)
    shards = [
        ShardedLoader(ds, 32, seed=0, num_shards=4, shard_index=i, raw=True)
        for i in range(4)
    ]
    assert all(s.local_batch == 8 for s in shards)
    seen = []
    for s in shards:
        for batch in s:
            seen.extend(batch.reshape(len(batch), -1).sum(1).tolist())
    assert len(seen) == 64


def test_loader_normalized_range():
    ds = FakeData(size=32, resolution=8)
    batch = next(iter(ShardedLoader(ds, 16, seed=0)))
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_loader_drop_last():
    ds = FakeData(size=70, resolution=8)
    loader = ShardedLoader(ds, 16, drop_last=True)
    assert len(list(loader)) == 4  # 70 // 16


def test_train_val_split_seeded():
    t1, v1 = train_val_split(100, 0.2, random_seed=9)
    t2, v2 = train_val_split(100, 0.2, random_seed=9)
    np.testing.assert_array_equal(t1, t2)
    assert len(v1) == 20 and len(t1) == 80
    assert len(np.intersect1d(t1, v1)) == 0


def test_uint8_roundtrip():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    x = normalize_to_unit(u8)
    back = to_uint8(x)
    np.testing.assert_array_equal(u8, back)


def test_random_hflip_only_flips_horizontally():
    rng = np.random.default_rng(0)
    batch = np.arange(2 * 4 * 4 * 1, dtype=np.uint8).reshape(2, 4, 4, 1)
    out = random_hflip(batch, rng, p=1.0)
    np.testing.assert_array_equal(out, batch[:, :, ::-1])


@pytest.mark.parametrize("cls", [Gaussian8, Gaussian25, SwissRoll])
def test_toy_datasets_unit_scale(cls):
    data = cls(20000, random_state=0).data
    assert data.shape == (20000, 2)
    # normalized to ~unit per-axis variance
    v = data.var(axis=0)
    assert np.all(v > 0.5) and np.all(v < 1.5), v


def test_data_streamer_epochs():
    ds = DataStreamer("gaussian8", batch_size=32, num_batches=4)
    batches = list(ds)
    assert len(batches) == 4
    assert all(b.shape == (32, 2) for b in batches)


def test_mnist_idx_parser_roundtrip(tmp_path):
    """Write a synthetic gzipped IDX3 file in the real MNIST format and load
    it through the MNIST dataset class (28->32 resize, NHWC, HW preserved)."""
    import gzip
    import struct

    from ddpm_tpu.data.datasets import MNIST

    # constant-valued images survive the 28->32 bilinear stretch exactly
    imgs = np.stack([np.full((28, 28), v, np.uint8) for v in (0, 40, 80, 120, 160, 200, 240)])
    base = tmp_path / "mnist"
    base.mkdir()
    with gzip.open(base / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">I", 0x00000803))  # magic: ubyte, 3 dims
        f.write(struct.pack(">3I", *imgs.shape))
        f.write(imgs.tobytes())

    ds = MNIST(root=str(tmp_path), split="train")
    assert len(ds) == 7
    batch = ds.get_batch(np.arange(7))
    assert batch.shape == (7, 32, 32, 1) and batch.dtype == np.uint8
    # constant images resize to the same constant
    for i, v in enumerate((0, 40, 80, 120, 160, 200, 240)):
        assert np.all(batch[i] == v), (i, v)


def test_cifar10_pickle_parser_roundtrip(tmp_path):
    """Write synthetic CIFAR-10 python-pickle batches (channel-major rows,
    the real disk format) and load via the CIFAR10 class (NHWC out)."""
    import pickle

    from ddpm_tpu.data.datasets import CIFAR10

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(1)
    per = 4
    truth = []
    for i in range(1, 6):
        arr = rng.randint(0, 256, (per, 3, 32, 32), dtype=np.uint8)
        truth.append(arr)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": arr.reshape(per, -1)}, f)
    ds = CIFAR10(root=str(tmp_path), split="train")
    assert len(ds) == 20
    batch = ds.get_batch(np.arange(20))
    want = np.concatenate(truth).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(batch, want)


def test_celeba_split_and_crop(tmp_path):
    """Synthetic CelebA tree: list_eval_partition.txt split filtering plus
    the (top=40, left=15, 148x148) crop -> 64x64 resize pipeline
    (reference datasets.py:68-69, 72-153)."""
    from PIL import Image

    from ddpm_tpu.data.datasets import CelebA

    base = tmp_path / "celeba"
    img_dir = base / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rows = []
    for i, code in enumerate([0, 0, 1, 2, 0]):
        name = f"{i:06d}.jpg"
        # celebA aligned images are 178x218 (WxH)
        arr = np.full((218, 178, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        rows.append(f"{name} {code}")
    (base / "list_eval_partition.txt").write_text("\n".join(rows) + "\n")

    for split, want in (("train", 3), ("valid", 1), ("test", 1), ("all", 5)):
        ds = CelebA(root=str(tmp_path), split=split)
        assert len(ds) == want, (split, len(ds), want)

    ds = CelebA(root=str(tmp_path), split="all")
    batch = ds.get_batch(np.array([0, 4]))
    assert batch.shape == (2, 64, 64, 3) and batch.dtype == np.uint8
    assert np.all(batch[0] == 0) and np.all(batch[1] == 160)


def test_celebahq_legacy_order(tmp_path):
    """CelebA-HQ files are sorted then shuffled with RandomState(123) to
    reproduce the legacy ProGAN order (reference datasets.py:156-198)."""
    from PIL import Image

    from ddpm_tpu.data.datasets import CelebA_HQ

    img_dir = tmp_path / "celeba_hq" / "img_celeba_hq"
    img_dir.mkdir(parents=True)
    n = 8
    for i in range(n):
        Image.fromarray(np.full((16, 16, 3), i * 30, np.uint8)).save(
            img_dir / f"{i:05d}.png"
        )
    ds = CelebA_HQ(root=str(tmp_path))
    names = sorted(f"{i:05d}.png" for i in range(n))
    np.random.RandomState(123).shuffle(names)
    batch = ds.get_batch(np.arange(n))
    for j, nm in enumerate(names):
        v = int(nm.split(".")[0]) * 30
        assert np.all(batch[j] == v), (j, nm)


def test_celebahq_legacy_order_unpadded_names(tmp_path):
    """Non-zero-padded filenames must be sorted NUMERICALLY by stem, with
    non-.png files filtered out, before the seeded shuffle — exactly the
    reference's `sorted(..., key=int(name[:-4].zfill(5)))` over `.png` files
    (reference datasets.py:181-186). Lexicographic order ("10.png" < "2.png")
    would feed the RandomState(123) shuffle a different base permutation."""
    import os

    from PIL import Image

    from ddpm_tpu.data.datasets import CelebA_HQ

    img_dir = tmp_path / "celeba_hq" / "img_celeba_hq"
    img_dir.mkdir(parents=True)
    n = 12  # "2.png" sorts after "10.png" lexicographically
    for i in range(n):
        Image.fromarray(np.full((16, 16, 3), i * 20, np.uint8)).save(
            img_dir / f"{i}.png"
        )
    # stray non-png files the reference filters out
    (img_dir / "index.txt").write_text("junk")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "0.jpg")

    ds = CelebA_HQ(root=str(tmp_path))
    assert len(ds) == n
    # reference computation, verbatim semantics
    ref_names = sorted(
        [f for f in os.listdir(img_dir) if f.endswith(".png")],
        key=lambda name: int(name[:-4].zfill(5)),
    )
    np.random.RandomState(123).shuffle(ref_names)
    batch = ds.get_batch(np.arange(n))
    for j, nm in enumerate(ref_names):
        v = int(nm[:-4]) * 20
        assert np.all(batch[j] == v), (j, nm)


def test_decode_celeba_pipeline_matches_crop_resize():
    """The single-PIL CelebA decode must be bit-identical to the composed
    crop_celeba + resize_batch path it replaced (same crop box, same
    bilinear resample)."""
    import numpy as np
    from PIL import Image

    from ddpm_tpu.data.datasets import _decode_celeba, _decode_image
    from ddpm_tpu.data.transforms import crop_celeba, resize_batch

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
    path = "/tmp/test_celeba_decode.png"
    Image.fromarray(img).save(path)
    want = resize_batch(crop_celeba(_decode_image(path))[None], 64)[0]
    got = _decode_celeba(path)
    np.testing.assert_array_equal(got, want)


def test_blobs_dataset_structure_and_determinism():
    """Blobs is the learnable synthetic distribution behind the flagship
    end-to-end convergence evidence: deterministic per seed, disjoint
    train/test streams, and spatially smooth (structured) unlike FakeData."""
    from ddpm_tpu.data.datasets import Blobs

    a = Blobs(size=32, resolution=16)
    b = Blobs(size=32, resolution=16)
    assert a.images.shape == (32, 16, 16, 3) and a.images.dtype == np.uint8
    np.testing.assert_array_equal(a.images, b.images)

    test = Blobs(size=32, resolution=16, split="test")
    assert not np.array_equal(a.images, test.images)

    assert "blobs" in DATASET_DICT and DATASET_INFO["blobs"]["train_size"] == 50000

    # structure: mean neighbor difference far below uniform noise (~85)
    smooth = np.abs(np.diff(a.images.astype(np.int16), axis=1)).mean()
    assert smooth < 20.0, smooth


def test_yield_indices_mode_streams_and_rng_parity():
    # device-cache mode: the loader yields (idx, flips); the flip stream is
    # bit-identical to the host pipeline's (rng.random(n) < 0.5 per batch),
    # so a device gather reproduces the host batches exactly
    ds = FakeData(split="train", size=64, resolution=8)
    ds.random_flip = True
    host = ShardedLoader(ds, 16, seed=3, device_normalize=True)
    idxl = ShardedLoader(ds, 16, seed=3, device_normalize=True, yield_indices=True)
    host.set_epoch(2)
    idxl.set_epoch(2)
    for hb, (idx, flips) in zip(host, idxl):
        assert idx.dtype == np.int32 and flips.dtype == np.uint8
        want = ds.images[idx]
        flip = flips.astype(bool)
        want = want.copy()
        want[flip] = want[flip, :, ::-1]
        np.testing.assert_array_equal(hb, want)


def test_yield_indices_rejects_disk_datasets():
    class NoImages:
        random_flip = False

        def __len__(self):
            return 8

    with pytest.raises(ValueError, match="device-cache"):
        ShardedLoader(NoImages(), 4, yield_indices=True)


def test_blobs256_dataset_hq_format(tmp_path):
    """Blobs256 consumes a 256^2 PNG folder exactly like CelebA-HQ
    (reference datasets.py:156-198: direct decode, no crop/resize) and
    exposes the HQ geometry through the registry."""
    from ddpm_tpu.data.datasets import Blobs256, _make_blobs

    base = tmp_path / "blobs256" / "train"
    base.mkdir(parents=True)
    from PIL import Image

    imgs = _make_blobs(4, 256, seed=3)
    for j in range(4):
        Image.fromarray(imgs[j]).save(base / f"{j:06d}.png")

    ds = Blobs256(root=str(tmp_path), split="train")
    assert len(ds) == 4
    batch = ds.get_batch(np.arange(4))
    assert batch.shape == (4, 256, 256, 3) and batch.dtype == np.uint8
    # PNG is lossless: decode must round-trip the rendered pixels exactly
    np.testing.assert_array_equal(batch, imgs)

    info = DATASET_INFO["blobs256"]
    assert info["resolution"] == (256, 256)
    assert info["fid_split"] == "test"

    with pytest.raises(FileNotFoundError):
        Blobs256(root=str(tmp_path), split="test")


def test_file_dataset_materialize_enables_device_cache(tmp_path):
    """Disk datasets bridge into device-cache mode by materializing: one
    decode pass fills `.images`, after which (a) get_batch serves from the
    array with identical pixels, and (b) get_dataloader(yield_indices=True)
    accepts the dataset and streams (idx, flips) descriptors."""
    from PIL import Image

    from ddpm_tpu.data.datasets import Blobs256, _make_blobs
    from ddpm_tpu.data.loader import get_dataloader

    imgs = _make_blobs(6, 32, seed=5)
    base = tmp_path / "blobs256" / "train"
    base.mkdir(parents=True)
    for j in range(6):
        Image.fromarray(imgs[j]).save(base / f"{j:06d}.png")

    ds = Blobs256(root=str(tmp_path), split="train")
    lazy = ds.get_batch(np.arange(6))
    mat = ds.materialize()
    assert mat.dtype == np.uint8 and mat.shape == (6, 32, 32, 3)
    np.testing.assert_array_equal(mat, lazy)
    np.testing.assert_array_equal(ds.get_batch(np.arange(6)), lazy)
    assert ds.materialize() is mat  # idempotent, no re-decode

    loader, _ = get_dataloader(
        "blobs256", 2, split="train", random_seed=0, root=str(tmp_path),
        yield_indices=True,
    )
    assert loader.dataset.images is not None
    idx, flips = next(iter(loader))
    assert idx.dtype == np.int32 and idx.shape == (2,)
    assert flips is None or flips.dtype == np.uint8
