"""Render the Blobs distribution to disk as a CelebA-format image folder.

Produces ``<root>/blobs64/train/*.jpg`` (+ ``test/``) at the raw CelebA frame
geometry — 178x218 JPEG, quality 95, the same container format as the real
``img_align_celeba`` distribution (reference datasets.py:68-69 opens those
JPEGs directly) — so the ``blobs64`` FileDataset can drive the production
disk pipeline (decode pool -> crop(15,40,163,188) -> bilinear resize 64 ->
flip -> uint8 ship) through a full convergence run.

Train and test folders draw from disjoint seed streams (7 / 8, matching the
in-memory Blobs convention of ``test seed = seed + 1``), so FID target
statistics computed from ``test/`` are independent of the training images.

Usage:
  python scripts/make_blobs_disk.py [--root ~/datasets] [--train-size 40000]
                                    [--test-size 10000] [--seed 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# CelebA raw frame geometry: 178 wide x 218 high (reference datasets.py:68)
CELEBA_W, CELEBA_H = 178, 218


def render_split(out_dir: str, n: int, seed: int, quality: int) -> None:
    from PIL import Image

    from ddpm_tpu.data.datasets import _make_blobs

    os.makedirs(out_dir, exist_ok=True)
    existing = sum(1 for f in os.listdir(out_dir) if f.endswith(".jpg"))
    if existing >= n:
        print(f"{out_dir}: {existing} images already present, skipping")
        return
    t0 = time.time()
    imgs = _make_blobs(n, (CELEBA_H, CELEBA_W), seed)
    for j in range(n):
        Image.fromarray(imgs[j]).save(
            os.path.join(out_dir, f"{j:06d}.jpg"), quality=quality
        )
        if (j + 1) % 5000 == 0:
            print(
                f"{out_dir}: {j + 1}/{n} "
                f"({(j + 1) / max(time.time() - t0, 1e-9):.0f} imgs/s)",
                flush=True,
            )
    print(f"{out_dir}: {n} images in {time.time() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="~/datasets")
    ap.add_argument("--train-size", type=int, default=40000)
    ap.add_argument("--test-size", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    base = os.path.join(os.path.expanduser(args.root), "blobs64")
    render_split(os.path.join(base, "train"), args.train_size, args.seed, args.quality)
    render_split(
        os.path.join(base, "test"), args.test_size, args.seed + 1, args.quality
    )
    total_mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(base)
        for f in fs
    ) / 1e6
    print(f"{base}: done ({total_mb:.0f} MB on disk)")


if __name__ == "__main__":
    main()
