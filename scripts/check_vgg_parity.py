"""Validate the flax VGG16 PR-feature extractor against torch — offline.

Same methodology as check_inception_parity.py: a plain-torch VGG16 (the
StyleGAN2-ADA vgg16.pt wraps a standard 13-conv/3-fc VGG16,
ddpm_torch/metrics/precision_recall.py:22-40) is built with seeded random
weights, its parameters run through scripts/convert_vgg.torchscript_vgg_to_
flax, and the 4096-d fc7 features compared on fixed inputs — validating the
layer mapping, OIHW->HWIO transposes, the channel-major flatten at the
conv->fc boundary, ImageNet mean subtraction, and the 224 resize path.

Usage: python scripts/check_vgg_parity.py ; prints "VGG PARITY OK".
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_IMAGENET_MEAN = (123.68, 116.779, 103.939)


def build_torch_vgg(seed: int = 0):
    import torch
    import torch.nn as nn

    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU())
            cin = v
    features = nn.Sequential(*layers)
    fc6 = nn.Linear(512 * 7 * 7, 4096)
    fc7 = nn.Linear(4096, 4096)

    g = torch.Generator().manual_seed(seed)
    model = nn.ModuleDict({"features": features, "fc6": fc6, "fc7": fc7})
    for m in model.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
            with torch.no_grad():
                m.bias.uniform_(-0.05, 0.05, generator=g)
    model.eval()
    return model


def torch_vgg_features(model, x_nchw_255):
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        mean = torch.tensor(_IMAGENET_MEAN).view(1, 3, 1, 1)
        x = x_nchw_255 - mean
        x = model["features"](x)
        x = torch.flatten(x, 1)  # channel-major (B, 512*7*7)
        x = F.relu(model["fc6"](x))
        return model["fc7"](x).numpy()


def run_check():
    import torch
    from flax.traverse_util import unflatten_dict

    from convert_vgg import torchscript_vgg_to_flax
    from ddpm_tpu.metrics.vgg import VGG16Features, make_vgg_extractor

    model = build_torch_vgg()
    flat = torchscript_vgg_to_flax(list(model.named_parameters()))
    variables = {"params": unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})}

    rng = np.random.default_rng(7)
    # case 1: native 224 input, [0,255] range (the StyleGAN2-ADA convention)
    x = (rng.random((2, 224, 224, 3), dtype=np.float32) * 255.0).astype(np.float32)
    want = torch_vgg_features(model, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = np.asarray(VGG16Features().apply(variables, x))
    diff = float(np.max(np.abs(got - want)))
    mag = float(np.max(np.abs(want)))
    print(f"  224 [0,255]: max abs diff {diff:.3e} (feature mag {mag:.3f})")
    assert diff < 1e-3 * max(mag, 1.0), (diff, mag)

    # case 2: 32x32 [0,1] input through make_vgg_extractor's x255 + resize
    import torch.nn.functional as F

    x32 = rng.random((2, 32, 32, 3), dtype=np.float32)
    xt = torch.from_numpy(np.transpose(x32 * 255.0, (0, 3, 1, 2)))
    xt = F.interpolate(xt, size=(224, 224), mode="bilinear", align_corners=False)
    want = torch_vgg_features(model, xt)
    got = np.asarray(make_vgg_extractor(variables, jit=False)(x32))
    diff = float(np.max(np.abs(got - want)))
    mag = float(np.max(np.abs(want)))
    print(f"  32->224 [0,1]: max abs diff {diff:.3e} (feature mag {mag:.3f})")
    assert diff < 2e-3 * max(mag, 1.0), (diff, mag)
    print("VGG PARITY OK (seeded random weights)")


if __name__ == "__main__":
    run_check()
