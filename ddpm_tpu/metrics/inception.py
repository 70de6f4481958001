"""FID InceptionV3 feature extractor in flax (NHWC).

Re-implements the TF-ported FID Inception network used by the reference
(ddpm_torch/metrics/inception.py:190-340 — torchvision inception_v3 skeleton
with the mseitzer FID patches):
  * every in-block average pool uses ``count_include_pad=False`` semantics
    (FIDInceptionA/C/E_1, reference inception.py:208-216 etc.);
  * the final InceptionE block (Mixed_7c) replaces its average-pool branch
    with a 3x3/1 max pool (FIDInceptionE_2);
  * 1008-class TF head (unused — features are taken at the 2048-d pool).

The jitted ``extract_features`` runs resize(299, bilinear) + (0,1)->(-1,1)
normalization + the trunk + global average pool entirely on device; weights
are converted once from the torch ``pt_inception-2015-12-05`` checkpoint by
scripts/convert_inception.py (NCHW->NHWC transpose + BN fold-in kept as BN).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["FIDInceptionV3", "make_feature_extractor"]


def _avg_pool(x, window: int, stride: int, pad: int, count_include_pad: bool):
    """NHWC average pool with torch-style padding semantics."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, padding)
    if count_include_pad:
        return summed / float(window * window)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, padding)
    return summed / counts


def _max_pool(x, window: int, stride: int, pad: int = 0):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class BasicConv2d(nn.Module):
    """conv(no bias) + BatchNorm(eps 1e-3, inference stats) + ReLU."""

    out_channels: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)  # FID patch
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)  # FID patch
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """use_max_pool=True reproduces FIDInceptionE_2 (Mixed_7c)."""

    use_max_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = _max_pool(x, 3, 1, 1)
        else:
            bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Returns the 2048-d pooled features (the FID activation layer).

    ``resize_input``: bilinear-resize to 299x299 (fid_score.py applies it via
    the model's own forward, inception.py:152-156); ``normalize_input``:
    (0,1) -> (-1,1) (inception.py:157-159).
    """

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear", antialias=False
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


def make_feature_extractor(variables, jit: bool = True, data_parallel: bool = True):
    """Jitted ``f(batch_01) -> (B, 2048)`` feature function; input is NHWC
    float in [0, 1].

    ``data_parallel`` shards each batch over the local device mesh — the
    equivalent of the reference wrapping Inception in ``nn.DataParallel``
    (fid_score.py:111-113) so 50k-image extractions don't serialize on one
    chip of a pod."""
    model = FIDInceptionV3()

    if jit and data_parallel and len(jax.local_devices()) > 1:
        from ..parallel import data_parallel_extractor

        return data_parallel_extractor(
            lambda v, x: model.apply(v, x), variables
        )

    def f(x):
        return model.apply(variables, x)

    return jax.jit(f) if jit else f
