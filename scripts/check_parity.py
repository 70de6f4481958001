"""Numerical parity check: reference torch UNet vs ddpm_tpu flax UNet.

Instantiates the *reference* PyTorch UNet (imported from /root/reference as a
test oracle), converts its weights with scripts/convert_checkpoint.py's
mapping, runs both on the same input, and reports the max abs difference.

Run:  python scripts/check_parity.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

from convert_checkpoint import load_converted, torch_unet_to_flax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="use the full CIFAR-10 config")
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    import torch

    # the reference package __init__ needs torchvision; load only the UNet
    # oracle modules through a synthetic package registration
    import importlib.util
    import types

    ref = args.reference
    pkg = types.ModuleType("ddpm_torch")
    pkg.__path__ = [os.path.join(ref, "ddpm_torch")]
    sys.modules["ddpm_torch"] = pkg
    models_pkg = types.ModuleType("ddpm_torch.models")
    models_pkg.__path__ = [os.path.join(ref, "ddpm_torch", "models")]
    sys.modules["ddpm_torch.models"] = models_pkg
    for name, rel in (
        ("ddpm_torch.functions", "ddpm_torch/functions.py"),
        ("ddpm_torch.modules", "ddpm_torch/modules.py"),
        ("ddpm_torch.models.unet", "ddpm_torch/models/unet.py"),
    ):
        spec = importlib.util.spec_from_file_location(name, os.path.join(ref, rel))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    TorchUNet = sys.modules["ddpm_torch.models.unet"].UNet  # oracle

    from ddpm_tpu.models import UNet as FlaxUNet

    if args.full:
        kw = dict(
            in_channels=3, hid_channels=128, ch_multipliers=(1, 2, 2, 2),
            num_res_blocks=2, apply_attn=(False, True, False, False),
        )
        res, out_ch = 32, 3
    else:
        kw = dict(
            in_channels=3, hid_channels=32, ch_multipliers=(1, 2),
            num_res_blocks=2, apply_attn=(False, True),
        )
        res, out_ch = 16, 3

    torch.manual_seed(0)
    tmodel = TorchUNet(out_channels=out_ch, drop_rate=0.0, **kw).eval()
    # zero-init layers (conv2 / project_out / out_conv) would mask most of the
    # network from the output; randomize them so the check is meaningful
    with torch.no_grad():
        for p in tmodel.parameters():
            if float(p.abs().max()) == 0.0:
                p.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = torch_unet_to_flax(sd, kw["ch_multipliers"], kw["num_res_blocks"], list(kw["apply_attn"]))

    from flax.traverse_util import unflatten_dict

    params = unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})

    fmodel = FlaxUNet(out_channels=out_ch, drop_rate=0.0, **kw)
    # sanity: converted tree must exactly match the flax-init tree structure
    ref_params = fmodel.init(
        jax.random.key(0), jnp.zeros((1, res, res, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    ref_flat = {"/".join(k): v.shape for k, v in
                __import__("flax.traverse_util", fromlist=["flatten_dict"]).flatten_dict(ref_params).items()}
    got_flat = {k: v.shape for k, v in flat.items()}
    missing = set(ref_flat) - set(got_flat)
    extra = set(got_flat) - set(ref_flat)
    mismatched = {k for k in set(ref_flat) & set(got_flat) if ref_flat[k] != got_flat[k]}
    assert not missing and not extra and not mismatched, (missing, extra, mismatched)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, res, res, 3)).astype(np.float32)
    t = np.array([17, 543], np.int64)

    with torch.inference_mode():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
    t_out = t_out.numpy().transpose(0, 2, 3, 1)

    f_out = np.asarray(fmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))

    diff = np.abs(t_out - f_out)
    rel = diff.max() / (np.abs(t_out).max() + 1e-12)
    print(f"max abs diff: {diff.max():.3e}  (rel {rel:.3e}); out mag {np.abs(t_out).max():.3f}")
    assert diff.max() < 1e-3, "PARITY FAIL"
    print("PARITY OK")


if __name__ == "__main__":
    main()
