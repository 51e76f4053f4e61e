"""Resize ops matching torch ``interpolate`` semantics (no antialiasing).

The reference uses ``interpolate(mode='bilinear', align_corners=False)`` for
512<->256 hops (reference: src/tha4/poser/modes/mode_07.py:99-115,
src/tha4/nn/siren/morpher/siren_morpher_03.py:118) and legacy ``nearest`` for
U-Net upsampling (reference: src/tha4/nn/common/unet.py:46).

``jax.image.resize`` antialiases when downscaling, which torch does not, so
bilinear is implemented directly: output pixel i samples input coordinate
``(i + 0.5) * scale - 0.5`` with edge clamping.  Separable 1-D matmuls along H
then W keep everything on the MXU (a (Hi x Ho) weight matrix instead of
per-pixel gathers) — ideal for the fixed 512<->256 sizes, which XLA constant-
folds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) interpolation matrix, torch half-pixel rule."""
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    src = np.clip((i + 0.5) * scale - 0.5, 0.0, in_size - 1.0)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = src - i0
    mat = np.zeros((in_size, out_size), dtype=np.float32)
    mat[i0, np.arange(out_size)] += (1.0 - t).astype(np.float32)
    mat[i1, np.arange(out_size)] += t.astype(np.float32)
    return mat


def resize_bilinear(image: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Torch-equivalent bilinear resize of NHWC ``image`` to (H, W) = size."""
    n, h, w, c = image.shape
    ho, wo = size
    if (h, w) == (ho, wo):
        return image
    dtype = image.dtype
    x = image.astype(jnp.float32)
    if h != ho:
        mh = jnp.asarray(_bilinear_matrix_np(h, ho))  # (h, ho)
        x = jnp.einsum("nhwc,hk->nkwc", x, mh)
    if w != wo:
        mw = jnp.asarray(_bilinear_matrix_np(w, wo))  # (w, wo)
        x = jnp.einsum("nhwc,wk->nhkc", x, mw)
    return x.astype(dtype)


def resize_bilinear_nchw(image: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Torch-equivalent bilinear resize of NCHW ``image`` (channels-first
    layout used by the fused SIREN path; pixels stay on lanes)."""
    n, c, h, w = image.shape
    ho, wo = size
    if (h, w) == (ho, wo):
        return image
    dtype = image.dtype
    x = image.astype(jnp.float32)
    if h != ho:
        mh = jnp.asarray(_bilinear_matrix_np(h, ho))
        x = jnp.einsum("nchw,hk->nckw", x, mh)
    if w != wo:
        mw = jnp.asarray(_bilinear_matrix_np(w, wo))
        x = jnp.einsum("nchw,wk->nchk", x, mw)
    return x.astype(dtype)


def upsample_nearest_2x(image: jnp.ndarray) -> jnp.ndarray:
    """Legacy torch 'nearest' 2x upsample: src index = floor(dst / 2)."""
    return jnp.repeat(jnp.repeat(image, 2, axis=1), 2, axis=2)


def downsample_avg_2x(image: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2) on NHWC (reference unet.py:58)."""
    n, h, w, c = image.shape
    x = image.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))
