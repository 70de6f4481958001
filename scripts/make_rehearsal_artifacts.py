"""Fabricate the external artifacts the FID parity gate needs, synthetically.

The real gate (scripts/parity_gate.sh) consumes three artifacts this
environment cannot download (zero egress): a released reference checkpoint
(.pt), the FID InceptionV3 weights, and the real dataset. This script builds
seeded stand-ins with EXACTLY the same formats so the full gate pipeline —
convert -> generate -> eval -> FID — can be dress-rehearsed end to end
(VERDICT r2 item 2). The resulting FID value is meaningless; every seam,
checkpoint form, and shape is the point.

  python scripts/make_rehearsal_artifacts.py --out-dir /tmp/parity_rehearsal/artifacts

Produces:
  <out>/cifar10_rehearsal.pt        reference-format checkpoint: {"model":
                                    <torch UNet sd>, "ema": {"shadow":
                                    {"module."-prefixed sd}}} — exercises the
                                    EMA-shadow branch AND the DDP prefix strip
                                    (reference generate.py:74-93)
  <out>/fid_inception_v3.npz        seeded random FIDInceptionV3 variables in
                                    scripts/convert_inception.py's npz layout.
                                    NEVER copy this file to the stock cache
                                    path (~/.cache/ddpm_tpu/fid_inception_v3
                                    .npz): that location is reserved for the
                                    REAL converted weights, and stats computed
                                    there get untagged reference-compatible
                                    cache names. Point INCEPTION_NPZ at this
                                    file instead (as rehearse_parity_gate.sh
                                    does) so every derived stat carries a
                                    weights tag (metrics.weights_cache_tag).
  <out>/datasets/cifar-10-batches-py/  synthetic CIFAR-10 pickle batches in
                                    the real disk format (channel-major rows)
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import pickle
import sys
import types

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def load_reference_unet(reference: str = "/root/reference"):
    """Import the reference torch UNet as an oracle without torchvision
    (same synthetic-package trick as scripts/check_parity.py)."""
    pkg = types.ModuleType("ddpm_torch")
    pkg.__path__ = [os.path.join(reference, "ddpm_torch")]
    sys.modules["ddpm_torch"] = pkg
    models_pkg = types.ModuleType("ddpm_torch.models")
    models_pkg.__path__ = [os.path.join(reference, "ddpm_torch", "models")]
    sys.modules["ddpm_torch.models"] = models_pkg
    for name, rel in (
        ("ddpm_torch.functions", "ddpm_torch/functions.py"),
        ("ddpm_torch.modules", "ddpm_torch/modules.py"),
        ("ddpm_torch.models.unet", "ddpm_torch/models/unet.py"),
    ):
        spec = importlib.util.spec_from_file_location(name, os.path.join(reference, rel))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ddpm_torch.models.unet"].UNet


def make_checkpoint(out_path: str, config: str, seed: int) -> None:
    import torch

    from ddpm_tpu.utils import load_config

    model_cfg = dict(load_config(config)["model"])
    TorchUNet = load_reference_unet()
    torch.manual_seed(seed)
    model = TorchUNet(out_channels=model_cfg["in_channels"], **model_cfg)
    sd = model.state_dict()
    n = sum(v.numel() for v in sd.values())
    # EMA shadow: a deterministic perturbation of the live weights so the
    # gate's --use-ema path demonstrably selects the shadow tree
    shadow = {f"module.{k}": v + 0.01 for k, v in sd.items()}
    torch.save({"model": sd, "ema": {"shadow": shadow}, "epoch": 2040}, out_path)
    print(f"wrote {out_path} ({n / 1e6:.2f}M params, model + ema.shadow)")


def make_inception_npz(out_path: str, seed: int) -> None:
    """Seeded stand-in FID-Inception weights that actually discriminate.

    Flax's default init collapses to ~0 through the 90+ ReLU conv stack
    (measured: feature sigma ~5e-12, so every FID came out 0.000 and the
    rehearsal could not tell the Frechet math was alive). He-normal conv
    kernels keep activations O(1) at depth, so different image
    distributions land on measurably different (mu, sigma) and the
    rehearsal's FID is a real nonzero distance.
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from ddpm_tpu.metrics.inception import FIDInceptionV3

    model = FIDInceptionV3()
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 299, 299, 3)))
    rng = np.random.RandomState(seed)
    flat = {}
    for k, v in flatten_dict(variables).items():
        a = np.asarray(v)
        if k[-1] == "kernel" and a.ndim >= 2:
            fan_in = int(np.prod(a.shape[:-1]))
            a = rng.normal(0.0, np.sqrt(2.0 / fan_in), a.shape).astype(a.dtype)
        flat["/".join(k)] = a
    np.savez(out_path, **flat)
    print(f"wrote {out_path} ({len(flat)} arrays, He-normal kernels)")


def make_cifar10(root: str, per_batch: int, seed: int) -> None:
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(seed)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        arr = rng.randint(0, 256, (per_batch, 3, 32, 32), dtype=np.uint8)
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump({b"data": arr.reshape(per_batch, -1)}, f)
    print(f"wrote {base} (5x{per_batch} train + {per_batch} test images)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--seed", default=7, type=int)
    ap.add_argument("--cifar-per-batch", default=512, type=int)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    make_checkpoint(
        os.path.join(args.out_dir, f"{args.config}_rehearsal.pt"), args.config, args.seed
    )
    make_inception_npz(os.path.join(args.out_dir, "fid_inception_v3.npz"), args.seed)
    make_cifar10(os.path.join(args.out_dir, "datasets"), args.cifar_per_batch, args.seed)


if __name__ == "__main__":
    main()
