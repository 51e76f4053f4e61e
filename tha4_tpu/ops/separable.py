"""Depthwise-separable conv blocks.

Reference: src/tha4/nn/separable_conv.py, resnet_block_seperable.py,
common/poser_encoder_decoder_00_separable.py — alternative factories that
split each kxk conv into depthwise kxk + pointwise 1x1.  Not used by the
shipped modes; provided for capability parity and as a cheaper trunk option.

On TPU the depthwise conv runs on the VPU and the pointwise 1x1 is an MXU
GEMM — often a good trade at large spatial sizes.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from tha4_tpu.ops import nn as tnn

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def init_separable_conv(
    key, k: int, cin: int, cout: int, bias: bool, method: str = "he", dtype=jnp.float32
) -> Dict:
    kd, kp = jax.random.split(key)
    depthwise = tnn.init_conv_weight(kd, k, k, 1, cin, method, dtype)  # (k,k,1,cin)
    pointwise = tnn.init_conv(kp, 1, 1, cin, cout, bias=bias, method=method, dtype=dtype)
    return {"depthwise": {"w": depthwise}, "pointwise": pointwise}


def separable_conv2d(params: Dict, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    dw = params["depthwise"]["w"].astype(x.dtype)
    k = dw.shape[0]
    pad = (k - 1) // 2
    out = lax.conv_general_dilated(
        x,
        dw,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DIMSPEC,
        feature_group_count=x.shape[-1],
    )
    return tnn.conv2d(params["pointwise"], out)


def init_separable_conv_block(
    key, k: int, cin: int, cout: int, method: str = "he", dtype=jnp.float32
) -> Dict:
    return {
        "conv": init_separable_conv(key, k, cin, cout, bias=False, method=method, dtype=dtype),
        "norm": tnn.init_norm_affine(cout, dtype),
    }


def separable_conv_block(params: Dict, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    out = separable_conv2d(params["conv"], x)
    return tnn.nonlinearity(nonlin, tnn.instance_norm(params["norm"], out))


def init_separable_resnet_block(key, c: int, method: str = "he", dtype=jnp.float32) -> Dict:
    k0, k1 = jax.random.split(key)
    return {
        "conv0": init_separable_conv(k0, 3, c, c, bias=False, method=method, dtype=dtype),
        "norm0": tnn.init_norm_affine(c, dtype),
        "conv1": init_separable_conv(k1, 3, c, c, bias=False, method=method, dtype=dtype),
        "norm1": tnn.init_norm_affine(c, dtype),
    }


def separable_resnet_block(params: Dict, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    h = tnn.nonlinearity(nonlin, tnn.instance_norm(params["norm0"], separable_conv2d(params["conv0"], x)))
    h = tnn.instance_norm(params["norm1"], separable_conv2d(params["conv1"], h))
    return x + h
