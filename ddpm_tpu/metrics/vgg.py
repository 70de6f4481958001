"""VGG16 feature extractor for Precision/Recall (flax, NHWC).

The reference loads NVIDIA's StyleGAN2-ADA TorchScript ``vgg16.pt`` and calls
it with ``return_features=True`` (ddpm_torch/metrics/precision_recall.py:
22-40), which yields the 4096-d fc7 (pre-ReLU of the classifier head is
applied inside) features of a standard VGG16 fed with uint8-range images.

This is the structural re-implementation: the classic 13-conv/3-fc VGG16
(Simonyan & Zisserman), NHWC, returning the 4096-d second-FC features.
Inputs are float in [0, 255] (the StyleGAN2-ADA calling convention — raw
uint8 casts); the network performs its own ImageNet mean subtraction.
Weights are converted from the TorchScript archive when available
(scripts/convert_vgg.py); absent the file (no-egress environments), use the
FID Inception pool features as the PR embedding instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["VGG16Features", "make_vgg_extractor"]

_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")
_IMAGENET_MEAN = (123.68, 116.779, 103.939)


class VGG16Features(nn.Module):
    """Returns 4096-d fc7 features; input NHWC float in [0, 255]."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        x = x - mean
        conv_idx = 0
        for v in _CFG:
            if v == "M":
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            else:
                x = nn.relu(
                    nn.Conv(v, (3, 3), padding="SAME", name=f"conv{conv_idx}")(x)
                )
                conv_idx += 1
        # torch flatten of (B, 512, 7, 7) is channel-major: transpose first
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.Dense(4096, name="fc7")(x)
        return x


def make_vgg_extractor(
    variables, jit: bool = True, input_range: str = "unit", data_parallel: bool = True
):
    """``input_range``: 'unit' for [0,1] floats (scaled x255 here), 'u8' for
    already-[0,255] values.

    ``data_parallel`` shards each batch over the local device mesh (the
    reference's ``nn.DataParallel`` VGG replication,
    precision_recall.py:127-130)."""
    model = VGG16Features()
    scale = 255.0 if input_range == "unit" else 1.0

    def body(v, x):
        x = jnp.asarray(x).astype(jnp.float32) * scale
        if x.shape[1] != 224 or x.shape[2] != 224:
            x = jax.image.resize(
                x, (x.shape[0], 224, 224, x.shape[3]), method="bilinear", antialias=False
            )
        return model.apply(v, x)

    if jit and data_parallel and len(jax.local_devices()) > 1:
        from ..parallel import data_parallel_extractor

        return data_parallel_extractor(body, variables)

    def f(x):
        return body(variables, x)

    return jax.jit(f) if jit else f
