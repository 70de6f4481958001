"""Render the Blobs distribution to disk as a CelebA- or CelebA-HQ-format
image folder.

Two variants, matching the two reference disk-dataset container formats:

  blobs64  — ``<root>/blobs64/{train,test}/*.jpg`` at the raw CelebA frame
             geometry (178x218 JPEG quality 95, the ``img_align_celeba``
             distribution format; reference datasets.py:68-69 opens those
             JPEGs directly), driving the production CelebA disk pipeline
             (decode pool -> crop(15,40,163,188) -> bilinear resize 64 ->
             flip -> uint8 ship).
  blobs256 — ``<root>/blobs256/{train,test}/*.png`` at the CelebA-HQ frame
             geometry (256x256 PNG, the ``img_celeba_hq`` distribution
             format; reference datasets.py:156-198 reads 256^2 PNGs with no
             crop/resize), driving the HQ disk pipeline and the
             ``configs/celebahq.json`` six-level model shape.

Train and test folders draw from disjoint seed streams (seed / seed+1,
matching the in-memory Blobs convention), so FID target statistics computed
from ``test/`` are independent of the training images.

Usage:
  python scripts/make_blobs_disk.py [--variant blobs64|blobs256]
                                    [--root ~/datasets] [--train-size N]
                                    [--test-size N] [--seed 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# CelebA raw frame geometry: 178 wide x 218 high (reference datasets.py:68);
# CelebA-HQ frame geometry: 256x256 (reference datasets.py:156-198)
VARIANTS = {
    # name: (height, width, format, default train size, default test size)
    "blobs64": (218, 178, "jpg", 40000, 10000),
    "blobs256": (256, 256, "png", 10000, 2500),
}


def render_split(
    out_dir: str, n: int, res, seed: int, fmt: str, quality: int
) -> None:
    from PIL import Image

    from ddpm_tpu.data.datasets import _make_blobs

    os.makedirs(out_dir, exist_ok=True)
    existing = sum(1 for f in os.listdir(out_dir) if f.endswith("." + fmt))
    if existing >= n:
        print(f"{out_dir}: {existing} images already present, skipping")
        return
    t0 = time.time()
    imgs = _make_blobs(n, res, seed)  # chunks internally; ~100 MB scratch
    for j in range(n):
        img = Image.fromarray(imgs[j])
        if fmt == "jpg":
            img.save(os.path.join(out_dir, f"{j:06d}.jpg"), quality=quality)
        else:
            img.save(os.path.join(out_dir, f"{j:06d}.png"))
        if (j + 1) % 2000 == 0:
            print(
                f"{out_dir}: {j + 1}/{n} "
                f"({(j + 1) / max(time.time() - t0, 1e-9):.0f} imgs/s)",
                flush=True,
            )
    print(f"{out_dir}: {n} images in {time.time() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(VARIANTS), default="blobs64")
    ap.add_argument("--root", default="~/datasets")
    ap.add_argument("--train-size", type=int, default=None)
    ap.add_argument("--test-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    h, w, fmt, train_n, test_n = VARIANTS[args.variant]
    if args.train_size is not None:
        train_n = args.train_size
    if args.test_size is not None:
        test_n = args.test_size
    res = h if h == w else (h, w)

    base = os.path.join(os.path.expanduser(args.root), args.variant)
    render_split(
        os.path.join(base, "train"), train_n, res, args.seed, fmt, args.quality
    )
    render_split(
        os.path.join(base, "test"), test_n, res, args.seed + 1, fmt, args.quality
    )
    total_mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(base)
        for f in fs
    ) / 1e6
    print(f"{base}: done ({total_mb:.0f} MB on disk)")


if __name__ == "__main__":
    main()
