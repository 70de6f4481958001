"""Convert NVIDIA's StyleGAN2-ADA TorchScript vgg16.pt to ddpm_tpu format.

Usage:
  python scripts/convert_vgg.py --pt vgg16.pt \
      [--out ~/.cache/ddpm_tpu/vgg16_features.npz]

The TorchScript archive (ddpm_torch/metrics/precision_recall.py:23) wraps a
standard VGG16; this extracts its conv/fc weights by walking the scripted
module's named_parameters and maps them onto metrics/vgg.py's flax names
(conv0..conv12, fc6, fc7). fc8 (the classifier) is dropped — the PR metric
uses the 4096-d fc7 features.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def torchscript_vgg_to_flax(named_params) -> dict:
    """named_params: iterable of (name, tensor). Returns flat path->array."""
    convs, fcs = [], []
    for name, p in named_params:
        arr = p.detach().cpu().numpy()
        if arr.ndim == 4:
            convs.append((name, arr))
        elif arr.ndim == 2:
            fcs.append((name, arr))
        elif arr.ndim == 1:
            # biases are paired with the preceding weight by name prefix
            if convs and name.rsplit(".", 1)[0] == convs[-1][0].rsplit(".", 1)[0]:
                convs.append((name, arr))
            else:
                fcs.append((name, arr))
    flat = {}
    conv_w = [a for n, a in convs if a.ndim == 4]
    conv_b = [a for n, a in convs if a.ndim == 1]
    assert len(conv_w) == 13 and len(conv_b) == 13, (len(conv_w), len(conv_b))
    for i, (w, b) in enumerate(zip(conv_w, conv_b)):
        flat[f"conv{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        flat[f"conv{i}/bias"] = b
    fc_w = [a for n, a in fcs if a.ndim == 2]
    fc_b = [a for n, a in fcs if a.ndim == 1]
    # fc6, fc7 (fc8 classifier dropped)
    flat["fc6/kernel"] = np.transpose(fc_w[0], (1, 0))
    flat["fc6/bias"] = fc_b[0]
    flat["fc7/kernel"] = np.transpose(fc_w[1], (1, 0))
    flat["fc7/bias"] = fc_b[1]
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True)
    ap.add_argument(
        "--out", default=os.path.expanduser("~/.cache/ddpm_tpu/vgg16_features.npz")
    )
    args = ap.parse_args()

    import torch

    model = torch.jit.load(args.pt, map_location="cpu")
    flat = torchscript_vgg_to_flax(model.named_parameters())
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **{f"params/{k}": v for k, v in flat.items()})
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
