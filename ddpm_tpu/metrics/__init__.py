"""Metrics: FID (streaming Inception statistics + Frechet distance),
improved Precision/Recall, toy histogram-KLD, and the in-loop Evaluator.

Reference: ddpm_torch/metrics/ (inception.py, fid_score.py,
precision_recall.py, __init__.py).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from .fid import StreamingStats, calc_fd, compute_dataset_stats, get_precomputed
from .inception import FIDInceptionV3, make_feature_extractor
from .pr import Manifold, ManifoldBuilder, calc_pr, compute_distance
from .toy import ToyEvaluator
from .vgg import VGG16Features, make_vgg_extractor

__all__ = [
    "Evaluator",
    "StreamingStats",
    "calc_fd",
    "get_precomputed",
    "compute_dataset_stats",
    "FIDInceptionV3",
    "make_feature_extractor",
    "Manifold",
    "ManifoldBuilder",
    "calc_pr",
    "compute_distance",
    "ToyEvaluator",
    "VGG16Features",
    "make_vgg_extractor",
    "load_inception_variables",
    "load_vgg_variables",
    "INCEPTION_WEIGHTS",
    "VGG_WEIGHTS",
    "weights_cache_tag",
]

# Converted-weight locations; the INCEPTION_NPZ / VGG_NPZ env vars override
# (used by scripts/parity_gate.sh and its offline rehearsal to point at
# seeded stand-in weights without touching ~/.cache).
_STOCK_INCEPTION_WEIGHTS = os.path.join(
    os.path.expanduser("~/.cache/ddpm_tpu"), "fid_inception_v3.npz"
)
_STOCK_VGG_WEIGHTS = os.path.join(
    os.path.expanduser("~/.cache/ddpm_tpu"), "vgg16_stylegan2.npz"
)
INCEPTION_WEIGHTS = os.environ.get("INCEPTION_NPZ", _STOCK_INCEPTION_WEIGHTS)
VGG_WEIGHTS = os.environ.get("VGG_NPZ", _STOCK_VGG_WEIGHTS)


def weights_cache_tag(path: str | None = None, env: str = "INCEPTION_NPZ") -> str:
    """Cache-filename suffix binding stats/manifolds to their feature weights.

    Empty only when the weights in effect ARE the stock converted file at
    ``~/.cache/ddpm_tpu`` (keeps reference-compatible names like
    ``fid_stats_cifar10.npz``); any other effective path — whether it came
    from an INCEPTION_NPZ / VGG_NPZ override or a direct
    ``Evaluator(inception_weights=...)`` argument — yields a short
    path-derived tag, so statistics computed under different weight files
    never share a cache entry (the parity-gate rehearsal's seeded stand-ins
    must not poison — or be poisoned by — stats for the real weights).
    Keying on the path in use rather than on env-var presence closes the
    hole where custom weights passed as an argument silently read/wrote the
    untagged stock entry. Path-keyed, not content-keyed: swapping different
    weights in at the SAME path still needs the stale npz deleted by hand,
    the same contract as the reference's downloaded precomputed stats."""
    stock = _STOCK_VGG_WEIGHTS if env == "VGG_NPZ" else _STOCK_INCEPTION_WEIGHTS
    if path is None:
        path = os.environ.get(env, stock)
    path = os.path.expanduser(path)
    if os.path.abspath(path) == os.path.abspath(stock):
        return ""
    import hashlib

    stem = os.path.splitext(os.path.basename(path))[0]
    digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]
    return f"_{stem}-{digest}"


def _load_variables_npz(path: str, what: str, converter: str):
    from flax.traverse_util import unflatten_dict

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{what} weights not found at {path}. This environment has no "
            f"network egress; obtain the reference torch weights and run "
            f"{converter} once to produce the npz."
        )
    data = np.load(path)
    flat = {tuple(k.split("/")): data[k] for k in data.files}
    return unflatten_dict(flat)


def load_inception_variables(path: str = INCEPTION_WEIGHTS):
    """Load converted FID-Inception weights (scripts/convert_inception.py)."""
    return _load_variables_npz(path, "FID InceptionV3", "scripts/convert_inception.py")


def load_vgg_variables(path: str = VGG_WEIGHTS):
    """Load converted StyleGAN2-ADA VGG16 weights (scripts/convert_vgg.py)."""
    return _load_variables_npz(path, "VGG16", "scripts/convert_vgg.py")


class Evaluator:
    """In-loop FID evaluator (reference: ddpm_torch/metrics/__init__.py:18-53).

    ``eval(sample_fn)`` generates ``total_size`` images batchwise (sample_fn
    returns float [-1,1] NHWC), streams them through the jitted Inception
    extractor, and returns {"fid": ...} against the precomputed target stats.
    """

    def __init__(
        self,
        dataset: str,
        total_size: int = 50000,
        batch_size: int = 256,
        root: Optional[str] = None,
        precomputed_dir: str = "precomputed",
        inception_weights: str = INCEPTION_WEIGHTS,
        variables=None,
        extractor: Optional[Callable] = None,
        target_stats=None,
    ):
        """``variables`` injects already-loaded (or test) Inception weights;
        otherwise they are loaded from ``inception_weights`` (the npz written
        by scripts/convert_inception.py). ``extractor`` overrides the feature
        function entirely (``f(batch_01_nhwc) -> (B, D)``) — used by tests
        and by callers that bring their own embedding network.
        ``target_stats=(mean, cov)`` injects the target statistics directly,
        skipping the precomputed-file lookup / raw-dataset fallback."""
        import jax

        self.dataset = dataset
        self.total_size = total_size
        self.batch_size = batch_size
        self.last_extracted = 0  # rows this host extracted in the last eval()
        if extractor is not None:
            self.extract = extractor
        else:
            if variables is None:
                variables = load_inception_variables(inception_weights)
            self.extract = make_feature_extractor(variables)
        if target_stats is not None:
            self.target_mean, self.target_var = target_stats
            self.key = jax.random.key(571)
            return
        # same weights-aware cache key as eval.py: stats computed under an
        # INCEPTION_NPZ override never collide with stock-weight stats
        ds_key = dataset + weights_cache_tag(inception_weights, "INCEPTION_NPZ")
        try:
            self.target_mean, self.target_var = get_precomputed(ds_key, precomputed_dir)
        except FileNotFoundError:
            if jax.process_count() > 1 and jax.process_index() != 0:
                # leader-gated eval (see eval()): non-leaders never consume
                # target stats, and skipping the fallback avoids both the
                # duplicated dataset extraction and a shared-FS write race
                # on the stats npz (reference leader-gates accumulation the
                # same way, ddpm_torch/metrics/__init__.py:34-47)
                self.target_mean = self.target_var = None
                self.key = jax.random.key(571)
                return
            # fall back to computing target stats from the raw dataset
            # (reference eval.py:87-94); the split is dataset-defined
            # (data/registry.py fid_stats_split)
            from ..data import fid_stats_split, get_dataloader

            loader, _ = get_dataloader(
                dataset, batch_size, split=fid_stats_split(dataset),
                root=root, raw=True, drop_last=False,
            )
            self.target_mean, self.target_var = compute_dataset_stats(
                iter(loader),
                self.extract,
                save_path=os.path.join(precomputed_dir, f"fid_stats_{ds_key}.npz"),
            )
        self.key = jax.random.key(571)

    def eval(self, sample_fn: Callable) -> dict:
        """Generate + extract + FID.

        Under multi-process SPMD every host must drive ``sample_fn`` (the
        sampler is a collective program over the global mesh), but feature
        extraction and statistics run on the LEADER only — the reference
        leader-gates exactly the same way (metrics/__init__.py:34-47).
        Without the gate each host would re-extract the full ``total_size``
        images; eval cost now stays independent of host count. Non-leaders
        return ``{"fid": None}``.
        """
        import jax

        is_leader = jax.process_index() == 0
        stats = StreamingStats(dim=None)
        self.last_extracted = 0
        remaining = self.total_size
        while remaining > 0:
            n = min(self.batch_size, remaining)
            self.key, sub = jax.random.split(self.key)
            # always request a FULL batch and discard the surplus of the
            # final one: one static shape -> one compiled sampler/extractor
            # (the reference instead shapes the last batch dynamically,
            # metrics/__init__.py:42-45, which would recompile under XLA)
            x = np.asarray(sample_fn(self.batch_size, sub))  # float [-1,1] NHWC
            if is_leader:
                x01 = np.clip((x + 1.0) / 2.0, 0.0, 1.0)
                if x01.shape[-1] == 1:
                    x01 = np.repeat(x01, 3, axis=-1)
                stats.update(np.asarray(self.extract(x01))[:n])
                self.last_extracted += n
            remaining -= n
        if not is_leader:
            return {"fid": None}
        gen_mean, gen_var = stats.get_statistics()
        return {"fid": calc_fd(gen_mean, gen_var, self.target_mean, self.target_var)}
