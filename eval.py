"""Offline evaluation CLI: FID + improved Precision/Recall on a folder of
generated samples (reference: eval.py).

``--sample-folder`` points at PNGs written by generate.py; target statistics
come from precomputed npz files (or are computed from the raw dataset and
cached, the reference's fallback at eval.py:87-94). The true-data PR
manifold is cached to ``precomputed/pr_manifold_{dataset}.npz``
(reference eval.py:114-122 caches a .pt).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def iter_image_folder(folder: str, batch_size: int, total: int, seed: int = 1234):
    """Yield uint8 NHWC batches from a folder of images (subsampled to
    ``total`` — reference eval.py:56-79; ``seed`` drives the subsample as
    the reference's seed_all does, eval.py:29,71)."""
    from PIL import Image

    files = sorted(
        os.path.join(folder, f)
        for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    if total and len(files) > total:
        files = [files[i] for i in np.random.RandomState(seed).choice(len(files), total, replace=False)]
    batch = []
    for path in files:
        with Image.open(path) as im:
            batch.append(np.asarray(im.convert("RGB"), np.uint8))
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def main():
    parser = ArgumentParser()
    parser.add_argument("--root", default="~/datasets", type=str)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--sample-folder", required=True, type=str)
    parser.add_argument("--batch-size", default=256, type=int)
    parser.add_argument("--eval-total-size", default=50000, type=int)
    parser.add_argument("--metrics", nargs="+", default=["fid", "pr"])
    parser.add_argument("--precomputed-dir", default="precomputed", type=str)
    parser.add_argument("--nhood-size", default=3, type=int)
    parser.add_argument("--row-batch-size", default=10000, type=int)
    parser.add_argument("--col-batch-size", default=10000, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    args = parser.parse_args()

    from ddpm_tpu.data import fid_stats_split, get_dataloader
    from ddpm_tpu.metrics import (
        INCEPTION_WEIGHTS,
        VGG_WEIGHTS,
        ManifoldBuilder,
        StreamingStats,
        calc_fd,
        calc_pr,
        compute_dataset_stats,
        get_precomputed,
        load_inception_variables,
        load_vgg_variables,
        make_feature_extractor,
        make_vgg_extractor,
        weights_cache_tag,
    )

    root = os.path.expanduser(args.root)
    results = {}
    try:
        extract = make_feature_extractor(load_inception_variables(INCEPTION_WEIGHTS))
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}")

    def raw_data_batches():
        loader, _ = get_dataloader(
            args.dataset,
            args.batch_size,
            split=fid_stats_split(args.dataset),
            root=root,
            raw=True,
            drop_last=False,
        )
        return iter(loader)

    # stats/manifold caches are keyed on the feature weights too: an
    # INCEPTION_NPZ/VGG_NPZ override producing different features must not
    # reuse (or poison) caches built under the stock weights
    inception_tag = weights_cache_tag(INCEPTION_WEIGHTS, "INCEPTION_NPZ")

    if "fid" in args.metrics:
        ds_key = args.dataset + inception_tag
        try:
            mu_t, sig_t = get_precomputed(ds_key, args.precomputed_dir)
        except FileNotFoundError:
            mu_t, sig_t = compute_dataset_stats(
                raw_data_batches(),
                extract,
                save_path=os.path.join(args.precomputed_dir, f"fid_stats_{ds_key}.npz"),
            )
        # dim inferred from the first batch: keeps the CLI agnostic to the
        # embedding width (2048 for Inception, anything for injected/test
        # extractors)
        stats = StreamingStats(dim=None)
        for batch in iter_image_folder(args.sample_folder, args.batch_size, args.eval_total_size, args.seed):
            stats.update(np.asarray(extract(batch.astype(np.float32) / 255.0)))
        mu_g, sig_g = stats.get_statistics()
        results["fid"] = calc_fd(mu_g, sig_g, mu_t, sig_t)
        print(f"fid: {results['fid']:.4f}", flush=True)

    if "pr" in args.metrics:
        # PR uses the StyleGAN2-ADA VGG16 embedding when the converted
        # weights exist (reference precision_recall.py:22-40); otherwise it
        # degrades to the Inception pool features (documented fallback,
        # metrics/vgg.py).
        if os.path.exists(VGG_WEIGHTS):
            pr_extract = make_vgg_extractor(load_vgg_variables(VGG_WEIGHTS))
        else:
            print("note: VGG16 weights absent; using Inception features for PR", flush=True)
            pr_extract = extract
        # cache key must encode everything that changes the stored manifold:
        # the embedding (Inception fallback vs VGG), the neighborhood size
        # (kth-neighbor radii are k-dependent), and the feature-set size.
        # The reference keys only on dataset (eval.py:114-122) and silently
        # reuses a manifold built with a different --nhood-size; we don't.
        # row/col batch sizes are compute tiling only — they do not alter
        # the radii — so they stay out of the key.
        emb = (
            "vgg" + weights_cache_tag(VGG_WEIGHTS, "VGG_NPZ")
            if os.path.exists(VGG_WEIGHTS)
            else "inception" + inception_tag
        )
        manifold_path = os.path.join(
            args.precomputed_dir,
            f"pr_manifold_{args.dataset}_{emb}"
            f"_k{args.nhood_size}_n{args.eval_total_size}.npz",
        )
        kw = dict(
            nhood_size=args.nhood_size,
            row_batch_size=args.row_batch_size,
            col_batch_size=args.col_batch_size,
        )
        if os.path.exists(manifold_path):
            true_manifold = ManifoldBuilder.load(manifold_path)
        else:
            builder = ManifoldBuilder(
                data=raw_data_batches(), extractor=pr_extract,
                max_size=args.eval_total_size, **kw,
            )
            builder.save(manifold_path)
            true_manifold = builder.manifold
        gen_manifold = ManifoldBuilder(
            data=iter_image_folder(args.sample_folder, args.batch_size, args.eval_total_size, args.seed),
            extractor=pr_extract,
            max_size=args.eval_total_size,
            **kw,
        ).manifold
        precision, recall = calc_pr(
            gen_manifold, true_manifold, args.row_batch_size, args.col_batch_size
        )
        # record WHICH embedding produced these numbers: an Inception-feature
        # PR is not comparable to the reference's VGG-feature PR
        # (precision_recall.py:22-40), and the bare numbers don't say
        results.update(precision=precision, recall=recall, pr_embedding=emb)
        print(
            f"precision: {precision:.4f} recall: {recall:.4f} "
            f"(embedding: {emb})",
            flush=True,
        )

    with open("metrics.txt", "a") as f:
        f.write(f"{args.dataset} {args.sample_folder}: {results}\n")


if __name__ == "__main__":
    main()
