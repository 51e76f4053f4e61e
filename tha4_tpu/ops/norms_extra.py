"""The rest of the reference's normalization zoo.

Reference: src/tha4/nn/normalization.py:21-126.  The shipped teacher modes
use InstanceNorm only (ops.nn.instance_norm); these exist for capability
parity with the reference's factory registry:

  * BatchNorm2d (train/eval with running stats)
  * LayerNorm2d (normalizes over (C, H, W) per sample)
  * PixelNorm (per-pixel channel RMS)
  * Bias2d / NoNorm (the affine/no-affine halves of NoNorm2dFactory)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from jax import lax


def init_batch_norm(c: int, dtype=jnp.float32) -> Dict:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }


def batch_norm(
    params: Dict,
    x: jnp.ndarray,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Dict]:
    """BatchNorm2d over NHWC. Returns (out, updated params)."""
    xf = x.astype(jnp.float32)
    if training:
        mean = xf.mean(axis=(0, 1, 2))
        var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        params = dict(
            params,
            running_mean=(1 - momentum) * params["running_mean"] + momentum * mean,
            running_var=(1 - momentum) * params["running_var"] + momentum * unbiased,
        )
    else:
        mean = params["running_mean"]
        var = params["running_var"]
    out = (xf - mean) * lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return out.astype(x.dtype), params


def layer_norm_2d(params: Optional[Dict], x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over (C, H, W) per sample with (1, C, 1, 1)-shaped affine
    (reference normalization.py:106-119). NHWC here: normalize over (1,2,3)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    if params is not None:
        out = out * params["scale"] + params["bias"]
    return out.astype(x.dtype)


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """x / sqrt(mean_c(x^2) + eps) (reference normalization.py:13-19)."""
    xf = x.astype(jnp.float32)
    return (xf * lax.rsqrt((xf ** 2).mean(axis=-1, keepdims=True) + eps)).astype(x.dtype)


def bias_2d(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x + per-channel bias (reference Bias2d, normalization.py:37-45)."""
    return x + params["bias"].astype(x.dtype)


def init_bias_2d(c: int, dtype=jnp.float32) -> Dict:
    return {"bias": jnp.zeros((c,), dtype)}
