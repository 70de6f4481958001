"""Convert a reference ddpm-torch UNet checkpoint (.pt) to ddpm_tpu params.

Usage:
  python scripts/convert_checkpoint.py --chkpt cifar10_2040.pt \
      --config cifar10 --out cifar10_2040.npz [--use-ema]

Maps the torch state dict (NCHW convs, Sequential indices; see
ddpm_torch/models/unet.py) onto the flax NHWC parameter tree of
ddpm_tpu.models.UNet:
  * conv weights OIHW -> HWIO transpose;
  * linear weights (out, in) -> (in, out) transpose;
  * 1x1 attention projections become Dense kernels;
  * GroupNorm weight/bias -> scale/bias;
  * EMA shadow dicts and DDP "module." prefixes are handled like
    generate.py:74-93 in the reference.

The output .npz stores the flattened parameter tree ("a/b/c" keys) loadable
by scripts' load_converted().
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w):  # (out, in) -> (in, out)
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _dense_from_1x1(w):  # (out, in, 1, 1) -> (in, out)
    return _dense(w[:, :, 0, 0])


def torch_unet_to_flax(sd: dict, ch_multipliers, num_res_blocks, apply_attn) -> dict:
    """Return a flat {path: array} flax parameter mapping."""
    levels = len(ch_multipliers)
    out = {}

    def put(path, arr):
        out[path] = np.asarray(arr)

    def res_block(src, dst):
        put(f"{dst}/norm1/GroupNorm_0/scale", sd[f"{src}.norm1.weight"])
        put(f"{dst}/norm1/GroupNorm_0/bias", sd[f"{src}.norm1.bias"])
        put(f"{dst}/conv1/kernel", _conv(sd[f"{src}.conv1.weight"]))
        put(f"{dst}/conv1/bias", sd[f"{src}.conv1.bias"])
        put(f"{dst}/fc/kernel", _dense(sd[f"{src}.fc.weight"]))
        put(f"{dst}/fc/bias", sd[f"{src}.fc.bias"])
        put(f"{dst}/norm2/GroupNorm_0/scale", sd[f"{src}.norm2.weight"])
        put(f"{dst}/norm2/GroupNorm_0/bias", sd[f"{src}.norm2.bias"])
        put(f"{dst}/conv2/kernel", _conv(sd[f"{src}.conv2.weight"]))
        put(f"{dst}/conv2/bias", sd[f"{src}.conv2.bias"])
        if f"{src}.skip.weight" in sd:
            put(f"{dst}/skip/kernel", _conv(sd[f"{src}.skip.weight"]))
            put(f"{dst}/skip/bias", sd[f"{src}.skip.bias"])

    def attn_block(src, dst):
        put(f"{dst}/norm/GroupNorm_0/scale", sd[f"{src}.norm.weight"])
        put(f"{dst}/norm/GroupNorm_0/bias", sd[f"{src}.norm.bias"])
        put(f"{dst}/project_in/kernel", _dense_from_1x1(sd[f"{src}.project_in.weight"]))
        put(f"{dst}/project_in/bias", sd[f"{src}.project_in.bias"])
        put(f"{dst}/project_out/kernel", _dense_from_1x1(sd[f"{src}.project_out.weight"]))
        put(f"{dst}/project_out/bias", sd[f"{src}.project_out.bias"])
        if f"{src}.skip.weight" in sd:
            put(f"{dst}/skip/kernel", _dense_from_1x1(sd[f"{src}.skip.weight"]))
            put(f"{dst}/skip/bias", sd[f"{src}.skip.bias"])

    # timestep embedding MLP (Sequential indices 0, 2)
    put("embed_fc1/kernel", _dense(sd["embed.0.weight"]))
    put("embed_fc1/bias", sd["embed.0.bias"])
    put("embed_fc2/kernel", _dense(sd["embed.2.weight"]))
    put("embed_fc2/bias", sd["embed.2.bias"])
    put("in_conv/kernel", _conv(sd["in_conv.weight"]))
    put("in_conv/bias", sd["in_conv.bias"])

    def block_paths(kind, i, j):
        """(torch prefix, uses_attn) for block j of level i on path `kind`."""
        base = f"{kind}samples.level_{i}.{j}"
        if apply_attn[i]:
            return f"{base}.0", f"{base}.1"
        return base, None

    for i in range(levels):
        for j in range(num_res_blocks):
            res_src, attn_src = block_paths("down", i, j)
            res_block(res_src, f"down_{i}_{j}_res")
            if attn_src:
                attn_block(attn_src, f"down_{i}_{j}_attn")
        if i != levels - 1:
            # downsample Sequential(SamePad2d, Conv2d) -> index 1
            src = f"downsamples.level_{i}.{num_res_blocks}.1"
            if f"{src}.weight" in sd:
                put(f"downsample_{i}/conv/kernel", _conv(sd[f"{src}.weight"]))
                put(f"downsample_{i}/conv/bias", sd[f"{src}.bias"])

    res_block("middle.0", "mid_res1")
    attn_block("middle.1", "mid_attn")
    res_block("middle.2", "mid_res2")

    for i in range(levels):
        for j in range(num_res_blocks + 1):
            res_src, attn_src = block_paths("up", i, j)
            res_block(res_src, f"up_{i}_{j}_res")
            if attn_src:
                attn_block(attn_src, f"up_{i}_{j}_attn")
        if i != 0:
            # upsample Sequential(Upsample, Conv2d) -> index 1
            src = f"upsamples.level_{i}.{num_res_blocks + 1}.1"
            if f"{src}.weight" in sd:
                put(f"upsample_{i}/conv/kernel", _conv(sd[f"{src}.weight"]))
                put(f"upsample_{i}/conv/bias", sd[f"{src}.bias"])

    put("out_norm/GroupNorm_0/scale", sd["out_conv.0.weight"])
    put("out_norm/GroupNorm_0/bias", sd["out_conv.0.bias"])
    put("out_conv/kernel", _conv(sd["out_conv.2.weight"]))
    put("out_conv/bias", sd["out_conv.2.bias"])
    return out


def extract_state_dict(raw: dict, use_ema: bool) -> dict:
    """Pull the (EMA) model weights out of a reference checkpoint, stripping
    DDP 'module.' prefixes (reference generate.py:74-93 fallback chain)."""
    if use_ema and "ema" in raw:
        sd = raw["ema"]["shadow"] if "shadow" in raw["ema"] else raw["ema"]
    elif "model" in raw:
        sd = raw["model"]
    else:
        sd = raw
    return { (k[7:] if k.startswith("module.") else k): np.asarray(v) for k, v in sd.items() }


def load_converted(path: str) -> dict:
    """Load a converted .npz into a nested flax params dict."""
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    return unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chkpt", required=True)
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--out", required=True)
    ap.add_argument("--use-ema", action="store_true")
    args = ap.parse_args()

    import torch

    from ddpm_tpu.utils import load_config

    cfg = load_config(args.config)
    model_cfg = cfg["model"]
    raw = torch.load(args.chkpt, map_location="cpu", weights_only=False)
    sd = extract_state_dict(raw, args.use_ema)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    flat = torch_unet_to_flax(
        sd,
        tuple(model_cfg["ch_multipliers"]),
        model_cfg["num_res_blocks"],
        list(model_cfg["apply_attn"]),
    )
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
