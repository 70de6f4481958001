"""Validate the flax FID-InceptionV3 port numerically against torch — offline.

No pretrained weights are needed: the torch FID-Inception architecture
(torchvision inception_v3 + the mseitzer pooling patches the reference uses,
ddpm_torch/metrics/inception.py:190-220) is built with *seeded random*
weights of sane magnitude, its state_dict is run through
scripts/convert_inception.torch_inception_to_flax, and the 2048-d pooled
features of both models are compared on fixed inputs. This validates the
complete numeric pipeline — key mapping, NCHW->NHWC transposes, BatchNorm
inference semantics, the count_include_pad=False / max-pool FID patches,
and the 299 bilinear resize — everything except the released weight values
themselves. With ``--pt <pt_inception-...pth>`` it validates the real
weights the same way.

Usage: python scripts/check_inception_parity.py [--pt weights.pth]
Prints "INCEPTION PARITY OK (...)" on success.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_torch_fid_inception(seed: int = 0, pt_path: str | None = None):
    """FID-patched InceptionV3 in plain torch (torchvision is not available in
    this image), module names matching the real pt_inception checkpoint so
    --pt works. Channel plan per the published InceptionV3 spec, FID patches
    per mseitzer (reference inception.py:208-216)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def fid_avg_pool(x):
        return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1, count_include_pad=False)

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class FIDInceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(fid_avg_pool(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat(
                [
                    self.branch3x3(x),
                    self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                    F.max_pool2d(x, kernel_size=3, stride=2),
                ],
                1,
            )

    class FIDInceptionC(nn.Module):
        def __init__(self, cin, channels_7x7):
            super().__init__()
            c7 = channels_7x7
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(
                self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
                )
            )
            bp = self.branch_pool(fid_avg_pool(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat(
                [
                    self.branch3x3_2(self.branch3x3_1(x)),
                    self.branch7x7x3_4(
                        self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
                    ),
                    F.max_pool2d(x, kernel_size=3, stride=2),
                ],
                1,
            )

    class FIDInceptionE(nn.Module):
        def __init__(self, cin, use_max_pool=False):
            super().__init__()
            self.use_max_pool = use_max_pool
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.use_max_pool:
                bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
            else:
                bp = fid_avg_pool(x)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class TorchFIDInception(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = FIDInceptionA(192, 32)
            self.Mixed_5c = FIDInceptionA(256, 64)
            self.Mixed_5d = FIDInceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = FIDInceptionC(768, 128)
            self.Mixed_6c = FIDInceptionC(768, 160)
            self.Mixed_6d = FIDInceptionC(768, 160)
            self.Mixed_6e = FIDInceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = FIDInceptionE(1280, use_max_pool=False)
            self.Mixed_7c = FIDInceptionE(2048, use_max_pool=True)
            self.fc = nn.Linear(2048, 1008)

    net = TorchFIDInception()

    if pt_path:
        sd = torch.load(pt_path, map_location="cpu", weights_only=False)
        sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
        net.load_state_dict(sd)
    else:
        # seeded weights with activation-preserving magnitudes so 94 conv
        # layers neither explode nor vanish; BN stats/affine nontrivial so
        # the conversion of all four BN arrays is actually exercised
        g = torch.Generator().manual_seed(seed)
        for m in net.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
                with torch.no_grad():
                    m.weight.mul_(
                        1.0 + 0.01 * torch.randn(1, generator=g).item()
                    )
            elif isinstance(m, torch.nn.BatchNorm2d):
                with torch.no_grad():
                    m.weight.uniform_(0.8, 1.2, generator=g)
                    m.bias.uniform_(-0.1, 0.1, generator=g)
                    m.running_mean.normal_(0.0, 0.1, generator=g)
                    m.running_var.uniform_(0.7, 1.3, generator=g)
            elif isinstance(m, torch.nn.Linear):
                torch.nn.init.normal_(m.weight, 0.0, 0.01, generator=g)
                torch.nn.init.zeros_(m.bias)
    net.eval()
    return net


def torch_fid_features(net, x_nchw):
    """The pytorch-fid block sequence up to the 2048-d pool
    (reference inception.py:100-150: stem -> maxpool -> ... -> avgpool)."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        x = 2.0 * x_nchw - 1.0  # (0,1) -> (-1,1), inception.py:157-159
        x = net.Conv2d_1a_3x3(x)
        x = net.Conv2d_2a_3x3(x)
        x = net.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = net.Conv2d_3b_1x1(x)
        x = net.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(net, name)(x)
        x = torch.nn.functional.adaptive_avg_pool2d(x, (1, 1))
        return x.squeeze(-1).squeeze(-1).numpy()


def run_check(pt_path: str | None = None, batch: int = 2, quick: bool = False):
    import torch
    from flax.traverse_util import unflatten_dict

    from convert_inception import torch_inception_to_flax
    from ddpm_tpu.metrics import make_feature_extractor
    from ddpm_tpu.metrics.inception import FIDInceptionV3

    net = build_torch_fid_inception(pt_path=pt_path)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params_flat, stats_flat = torch_inception_to_flax(sd)
    variables = {
        "params": unflatten_dict({tuple(k.split("/")): v for k, v in params_flat.items()}),
        "batch_stats": unflatten_dict({tuple(k.split("/")): v for k, v in stats_flat.items()}),
    }

    rng = np.random.default_rng(123)
    results = {}

    # case 1: native 299x299 input (resize path inactive)
    x = rng.random((batch, 299, 299, 3), dtype=np.float32)
    want = torch_fid_features(net, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    model = FIDInceptionV3(resize_input=False, normalize_input=True)
    got = np.asarray(model.apply(variables, x))
    diff = float(np.max(np.abs(got - want)))
    mag = float(np.max(np.abs(want)))
    results["299"] = (diff, mag)
    assert diff < 1e-3 * max(mag, 1.0), f"299 path: {diff} vs mag {mag}"

    if not quick:
        # case 2: 32x32 input through the on-device bilinear resize vs
        # torch's F.interpolate(..., align_corners=False) as used by the
        # reference wrapper (inception.py:152-156)
        import torch.nn.functional as F

        x32 = rng.random((batch, 32, 32, 3), dtype=np.float32)
        xt = torch.from_numpy(np.transpose(x32, (0, 3, 1, 2)))
        xt = F.interpolate(xt, size=(299, 299), mode="bilinear", align_corners=False)
        want = torch_fid_features(net, xt)
        got = np.asarray(make_feature_extractor(variables, jit=False)(x32))
        diff = float(np.max(np.abs(got - want)))
        mag = float(np.max(np.abs(want)))
        results["32->299"] = (diff, mag)
        assert diff < 2e-3 * max(mag, 1.0), f"resize path: {diff} vs mag {mag}"

    for case, (diff, mag) in results.items():
        print(f"  {case}: max abs diff {diff:.3e} (feature mag {mag:.3f})")
    print(f"INCEPTION PARITY OK ({'real weights' if pt_path else 'seeded random weights'})")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", default=None, help="real pt_inception .pth to validate")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run_check(args.pt, quick=args.quick)
