"""Functional NN primitives: convs, norms, nonlinearities, initializers.

Parameter conventions (chosen for TPU, converters handle torch interop):
  * conv weights are HWIO ``(kh, kw, in, out)``; torch Conv2d is OIHW — the
    converter transposes (2, 3, 1, 0).
  * transposed-conv weights are also stored HWIO of the *equivalent forward
    conv* applied to the dilated input; torch ConvTranspose2d (I, O, kh, kw)
    converts via spatial flip + (2, 3, 0, 1) transpose.
  * activations NHWC; normalization statistics always f32.

Initializers replicate the torch distributions the reference uses
(reference: src/tha4/nn/init_function.py:9-33, kaiming/xavier/zero/dcgan),
so from-scratch training starts from the same statistics.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tha4_tpu.ops import quant

Params = Dict[str, jnp.ndarray]

# ---------------------------------------------------------------------------
# Initializers (std formulas match torch.nn.init on OIHW conv weights)
# ---------------------------------------------------------------------------


def _fan_in_out(kh: int, kw: int, cin: int, cout: int) -> Tuple[int, int]:
    receptive = kh * kw
    return cin * receptive, cout * receptive


def init_conv_weight(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    method: str = "he",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """HWIO conv weight with the named init distribution.

    'he' = torch kaiming_normal_(a=0, fan_in, leaky_relu): std = sqrt(2/fan_in)
    (reference: src/tha4/nn/init_function.py:14-16).
    """
    fan_in, fan_out = _fan_in_out(kh, kw, cin, cout)
    shape = (kh, kw, cin, cout)
    if method == "none":
        # torch Conv2d default: kaiming_uniform_(a=sqrt(5)) -> U(+-1/sqrt(fan_in))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    if method == "he":
        std = math.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std
    if method == "xavier":
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    if method == "dcgan":
        return jax.random.normal(key, shape, dtype) * 0.02
    if method == "dcgan_001":
        return jax.random.normal(key, shape, dtype) * 0.01
    if method == "zero":
        return jnp.zeros(shape, dtype)
    raise ValueError(f"Invalid initialization method {method}")


def init_conv(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    bias: bool,
    method: str = "he",
    dtype=jnp.float32,
) -> Params:
    wkey, bkey = jax.random.split(key)
    params = {"w": init_conv_weight(wkey, kh, kw, cin, cout, method, dtype)}
    if bias:
        # torch Conv2d bias init: U(+-1/sqrt(fan_in)) regardless of weight init.
        fan_in = kh * kw * cin
        bound = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return params


def init_linear(
    key: jax.Array, cin: int, cout: int, bias: bool = True, method: str = "none", dtype=jnp.float32
) -> Params:
    wkey, bkey = jax.random.split(key)
    if method == "none":
        bound = 1.0 / math.sqrt(cin)
        w = jax.random.uniform(wkey, (cin, cout), dtype, -bound, bound)
    elif method == "zero":
        w = jnp.zeros((cin, cout), dtype)
    else:
        raise ValueError(method)
    params = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(cin)
        params["b"] = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return params


def init_conv_transpose(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    bias: bool,
    method: str = "he",
    dtype=jnp.float32,
) -> Params:
    """Transposed-conv params, stored as the equivalent forward-conv HWIO.

    torch inits ConvTranspose2d (I, O, kh, kw) with fan_in = O*kh*kw; the
    equivalent forward conv has cin->cout so the same std applies directly.
    """
    wkey, bkey = jax.random.split(key)
    fan_in = cout * kh * kw  # torch fan_in for ConvTranspose2d
    shape = (kh, kw, cin, cout)
    if method == "none":
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(wkey, shape, dtype, -bound, bound)
    elif method == "he":
        w = jax.random.normal(wkey, shape, dtype) * math.sqrt(2.0 / fan_in)
    elif method == "xavier":
        fan_out = cin * kh * kw
        w = jax.random.normal(wkey, shape, dtype) * math.sqrt(2.0 / (fan_in + fan_out))
    elif method == "zero":
        w = jnp.zeros(shape, dtype)
    else:
        raise ValueError(method)
    params = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return params


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(params: Params, x: jnp.ndarray, stride: int = 1, padding: Optional[int] = None) -> jnp.ndarray:
    """2-D conv, NHWC x HWIO. Default padding = 'same-ish' torch (k-1)//2.

    The single chokepoint every model conv routes through; when an int8
    quantization scope is active (ops/quant.py — frozen-teacher PTQ) and the
    call is eligible, the conv runs int8 on the MXU instead of bf16."""
    w = params["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = (kh - 1) // 2

    qctx = quant.current()
    if qctx is not None and quant.eligible(x.shape, w.shape, stride):
        if isinstance(qctx, quant.Calibration):
            qctx.observe(x, w, stride)
        else:
            x_scale = qctx.next_scale(x, w, stride)
            out = quant.conv2d_int8(x, params["w"], x_scale, padding)
            if "b" in params:
                out = out + params["b"].astype(x.dtype)
            return out

    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMSPEC,
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def conv_transpose2d_s2(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(kernel=4, stride=2, padding=1) equivalent: 2x upsample.

    Implemented as conv over a 2x-dilated input with padding kh-1-p = 2
    (reference usage: src/tha4/nn/conv.py:168-177 upsample blocks).
    """
    w = params["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    pad = kh - 1 - 1  # kernel-1 - torch_padding(=1)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(2, 2),
        dimension_numbers=_DIMSPEC,
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ params["w"].astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def instance_norm(params: Optional[Params], x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=True, track_running_stats=False), NHWC.

    Stats accumulate in f32 (bf16 batch-1 reductions drift; SURVEY.md 'hard
    parts').  On bf16 inputs the reductions accumulate in f32 WITHOUT
    materializing an f32 copy of the activation (these norms are pure
    HBM-bandwidth on TPU; the cast tensor doubled the traffic)."""
    if x.dtype == jnp.bfloat16:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        # E[(x-mean)^2] with the subtraction in bf16: the mean is O(1) and
        # activations are O(1), so (x - mean) keeps bf16's full relative
        # precision; the square-sum accumulates in f32.
        centered = x - mean.astype(x.dtype)
        var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        out = centered.astype(jnp.float32) * lax.rsqrt(var + eps)
    else:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        out = (xf - mean) * lax.rsqrt(var + eps)
    if params is not None:
        out = out * params["scale"] + params["bias"]
    return out.astype(x.dtype)


def group_norm(params: Optional[Params], x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC; reference GroupNorm32 uses min(32, C) groups
    (reference: src/tha4/nn/common/unet.py:65-66).  Same bf16 fast-stats
    strategy as instance_norm."""
    n, h, w, c = x.shape
    g = num_groups
    if x.dtype == jnp.bfloat16:
        xg = x.reshape(n, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
        centered = xg - mean.astype(x.dtype)
        var = jnp.mean(centered * centered, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
        out = (centered.astype(jnp.float32) * lax.rsqrt(var + eps)).reshape(n, h, w, c)
    else:
        xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        out = ((xf - mean) * lax.rsqrt(var + eps)).reshape(n, h, w, c)
    if params is not None:
        out = out * params["scale"] + params["bias"]
    return out.astype(x.dtype)


def init_norm_affine(c: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def nonlinearity(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "relu":
        return jax.nn.relu(x)
    if name == "leaky_relu_02":
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "silu":
        return jax.nn.silu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "elu":
        return jax.nn.elu(x)
    if name == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "hardswish":
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    raise ValueError(f"Unknown nonlinearity {name}")


# ---------------------------------------------------------------------------
# Reference block zoo (reference: src/tha4/nn/conv.py, resnet_block.py)
# ---------------------------------------------------------------------------


def init_conv_block(
    key: jax.Array, k: int, cin: int, cout: int, method: str = "he", dtype=jnp.float32
) -> Params:
    """conv(k, bias=False) -> InstanceNorm(affine) -> nonlinearity."""
    return {
        "conv": init_conv(key, k, k, cin, cout, bias=False, method=method, dtype=dtype),
        "norm": init_norm_affine(cout, dtype),
    }


def conv_block(params: Params, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    return nonlinearity(nonlin, instance_norm(params["norm"], conv2d(params["conv"], x)))


def init_downsample_block(
    key: jax.Array, cin: int, cout: int, method: str = "he", dtype=jnp.float32
) -> Params:
    """Conv2d(4, stride 2, pad 1, bias=False) -> norm -> nonlin
    (reference: src/tha4/nn/conv.py:130-152)."""
    return {
        "conv": init_conv(key, 4, 4, cin, cout, bias=False, method=method, dtype=dtype),
        "norm": init_norm_affine(cout, dtype),
    }


def downsample_block(params: Params, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    out = conv2d(params["conv"], x, stride=2, padding=1)
    return nonlinearity(nonlin, instance_norm(params["norm"], out))


def init_upsample_block(
    key: jax.Array, cin: int, cout: int, method: str = "he", dtype=jnp.float32
) -> Params:
    """ConvTranspose2d(4, stride 2, pad 1, bias=False) -> norm -> nonlin
    (reference: src/tha4/nn/conv.py:168-189)."""
    return {
        "conv": init_conv_transpose(key, 4, 4, cin, cout, bias=False, method=method, dtype=dtype),
        "norm": init_norm_affine(cout, dtype),
    }


def upsample_block(params: Params, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    out = conv_transpose2d_s2(params["conv"], x)
    return nonlinearity(nonlin, instance_norm(params["norm"], out))


def init_resnet_block(key: jax.Array, c: int, method: str = "he", dtype=jnp.float32) -> Params:
    """2 x (conv3 -> norm) with identity skip
    (reference: src/tha4/nn/resnet_block.py:50-61)."""
    k0, k1 = jax.random.split(key)
    return {
        "conv0": init_conv(k0, 3, 3, c, c, bias=False, method=method, dtype=dtype),
        "norm0": init_norm_affine(c, dtype),
        "conv1": init_conv(k1, 3, 3, c, c, bias=False, method=method, dtype=dtype),
        "norm1": init_norm_affine(c, dtype),
    }


def resnet_block(params: Params, x: jnp.ndarray, nonlin: str = "relu") -> jnp.ndarray:
    h = nonlinearity(nonlin, instance_norm(params["norm0"], conv2d(params["conv0"], x)))
    h = instance_norm(params["norm1"], conv2d(params["conv1"], h))
    return x + h
