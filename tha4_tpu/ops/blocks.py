"""Block factory: the BlockArgs/ConvBlockFactory layer, fully plumbed.

Functional equivalent of the reference's block-construction bundle
(reference: src/tha4/nn/util.py:22-40 BlockArgs,
src/tha4/nn/common/conv_block_factory.py ConvBlockFactory,
src/tha4/nn/conv.py:100-189 block builders,
src/tha4/nn/separable_conv.py separable builders,
src/tha4/nn/resnet_block.py:13-67 ResnetBlock incl. the 1x1 and
learned-scale variants).

One ``BlockConfig`` carries the four BlockArgs fields (init method, spectral
norm, norm factory, nonlinearity) plus the ConvBlockFactory routing flag
(separable).  Every builder honors every flag — notably ``use_spectral_norm``
reaches each conv (both halves of a separable conv, exactly like the
reference's wrap_conv_or_linear_module).

Spectral norm is functional here: the power-iteration vector ``u`` lives in
the param dict ("sn_u").  ``apply`` computes the normalized weight with one
fresh power-iteration step (identical arithmetic to a torch TRAIN-mode
forward with n_power_iterations=1); trainers persist the iteration by
calling :func:`advance_spectral` once per optimization step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import norms_extra
from tha4_tpu.ops.spectral_norm import init_spectral_state, spectral_normalize

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


@dataclass(frozen=True)
class BlockConfig:
    """BlockArgs + ConvBlockFactory routing (reference nn/util.py:22-40)."""

    init: str = "he"
    use_spectral_norm: bool = False
    norm: str = "instance"  # instance | layer | pixel | none_affine | none
    nonlin: str = "relu"
    separable: bool = False


# ---------------------------------------------------------------------------
# conv primitives with the spectral-norm flag plumbed through
# ---------------------------------------------------------------------------


def _init_wrapped_conv(key, kh, kw, cin, cout, bias, cfg: BlockConfig, groups=1, transpose=False, dtype=jnp.float32) -> Dict:
    wkey, ukey = jax.random.split(key)
    if transpose:
        p = tnn.init_conv_transpose(wkey, kh, kw, cin, cout, bias=bias, method=cfg.init, dtype=dtype)
    elif groups == cin and groups > 1:
        # depthwise: HWIO with I=1, O=cin (feature_group_count = cin)
        p = tnn.init_conv(wkey, kh, kw, 1, cin, bias=bias, method=cfg.init, dtype=dtype)
    else:
        p = tnn.init_conv(wkey, kh, kw, cin, cout, bias=bias, method=cfg.init, dtype=dtype)
    if cfg.use_spectral_norm:
        p["sn_u"] = init_spectral_state(ukey, p["w"])
    return p


def _weight(params: Dict) -> jnp.ndarray:
    if "sn_u" in params:
        w, _ = spectral_normalize(params["w"], params["sn_u"])
        return w
    return params["w"]


def _conv(params: Dict, x: jnp.ndarray, stride=1, padding=None, groups=1) -> jnp.ndarray:
    w = _weight(params).astype(x.dtype)
    kh = w.shape[0]
    if padding is None:
        padding = (kh - 1) // 2
    out = lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=_DIMSPEC, feature_group_count=groups,
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def _conv_transpose_s2(params: Dict, x: jnp.ndarray, groups=1) -> jnp.ndarray:
    w = _weight(params).astype(x.dtype)
    kh = w.shape[0]
    pad = kh - 1 - 1
    out = lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)), lhs_dilation=(2, 2),
        dimension_numbers=_DIMSPEC, feature_group_count=groups,
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def advance_spectral(params):
    """Advance every spectral-norm ``u`` in a param tree one power-iteration
    step (the state update a torch train-mode forward does in place)."""

    def visit(node):
        if isinstance(node, dict):
            if "sn_u" in node and "w" in node:
                _, u = spectral_normalize(node["w"], node["sn_u"])
                return {**{k: visit(v) for k, v in node.items()}, "sn_u": u}
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(visit(v) for v in node)
        return node

    return visit(params)


def _norm_init(cfg: BlockConfig, c: int, dtype=jnp.float32) -> Optional[Dict]:
    if cfg.norm == "instance":
        return tnn.init_norm_affine(c, dtype)
    if cfg.norm == "layer":
        return tnn.init_norm_affine(c, dtype)
    if cfg.norm == "none_affine":
        return {"bias": jnp.zeros((c,), dtype)}  # Bias2d (reference NoNorm affine)
    return None  # pixel / none: parameter-free


def _norm_apply(cfg: BlockConfig, params: Optional[Dict], x: jnp.ndarray) -> jnp.ndarray:
    if cfg.norm == "instance":
        return tnn.instance_norm(params, x)
    if cfg.norm == "layer":
        return norms_extra.layer_norm_2d(params, x)
    if cfg.norm == "pixel":
        return norms_extra.pixel_norm(x)
    if cfg.norm == "none_affine":
        return x + params["bias"].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# ConvBlockFactory builders
# ---------------------------------------------------------------------------


def init_conv3(key, cin, cout, bias, cfg: BlockConfig, dtype=jnp.float32) -> Dict:
    """Raw conv3 (reference ConvBlockFactory.create_conv3)."""
    if cfg.separable:
        kd, kp = jax.random.split(key)
        return {
            "depthwise": _init_wrapped_conv(kd, 3, 3, cin, cin, False, cfg, groups=cin, dtype=dtype),
            "pointwise": _init_wrapped_conv(kp, 1, 1, cin, cout, bias, cfg, dtype=dtype),
        }
    return _init_wrapped_conv(key, 3, 3, cin, cout, bias, cfg, dtype=dtype)


def apply_conv3(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    if "depthwise" in params:
        return _conv(params["pointwise"], _conv(params["depthwise"], x, groups=x.shape[-1]))
    return _conv(params, x)


def init_conv_block(key, k: int, cin, cout, cfg: BlockConfig, dtype=jnp.float32) -> Dict:
    """conv-k(bias=False) -> norm -> nonlin (reference create_conv{3,7}_block)."""
    ck, _ = jax.random.split(key)
    if cfg.separable:
        kd, kp = jax.random.split(ck)
        conv = {
            "depthwise": _init_wrapped_conv(kd, k, k, cin, cin, False, cfg, groups=cin, dtype=dtype),
            "pointwise": _init_wrapped_conv(kp, 1, 1, cin, cout, False, cfg, dtype=dtype),
        }
    else:
        conv = _init_wrapped_conv(ck, k, k, cin, cout, False, cfg, dtype=dtype)
    out = {"conv": conv}
    n = _norm_init(cfg, cout, dtype)
    if n is not None:
        out["norm"] = n
    return out


def apply_conv_block(cfg: BlockConfig, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    conv = params["conv"]
    if "depthwise" in conv:
        h = _conv(conv["pointwise"], _conv(conv["depthwise"], x, groups=x.shape[-1]))
    else:
        h = _conv(conv, x)
    h = _norm_apply(cfg, params.get("norm"), h)
    return tnn.nonlinearity(cfg.nonlin, h)


def init_downsample_block(key, cin, cout, is_output_1x1: bool, cfg: BlockConfig, dtype=jnp.float32) -> Dict:
    """conv4 s2 p1 (bias=False) -> [norm unless output is 1x1] -> nonlin
    (reference create_downsample_block, conv.py:127-148)."""
    if cfg.separable:
        kd, kp = jax.random.split(key)
        conv = {
            "depthwise": _init_wrapped_conv(kd, 4, 4, cin, cin, False, cfg, groups=cin, dtype=dtype),
            "pointwise": _init_wrapped_conv(kp, 1, 1, cin, cout, False, cfg, dtype=dtype),
        }
    else:
        conv = _init_wrapped_conv(key, 4, 4, cin, cout, False, cfg, dtype=dtype)
    out = {"conv": conv}
    if not is_output_1x1:
        n = _norm_init(cfg, cout, dtype)
        if n is not None:
            out["norm"] = n
    return out


def apply_downsample_block(cfg: BlockConfig, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    conv = params["conv"]
    if "depthwise" in conv:
        h = _conv(conv["depthwise"], x, stride=2, padding=1, groups=x.shape[-1])
        h = _conv(conv["pointwise"], h)
    else:
        h = _conv(conv, x, stride=2, padding=1)
    if "norm" in params or cfg.norm == "pixel":
        h = _norm_apply(cfg, params.get("norm"), h)
    return tnn.nonlinearity(cfg.nonlin, h)


def init_upsample_block(key, cin, cout, cfg: BlockConfig, dtype=jnp.float32) -> Dict:
    """ConvTranspose4 s2 p1 (bias=False) -> norm -> nonlin."""
    if cfg.separable:
        kd, kp = jax.random.split(key)
        conv = {
            "depthwise_t": _init_wrapped_conv(kd, 4, 4, cin, cin, False, cfg, groups=cin, transpose=True, dtype=dtype),
            "pointwise": _init_wrapped_conv(kp, 1, 1, cin, cout, False, cfg, dtype=dtype),
        }
    else:
        conv = _init_wrapped_conv(key, 4, 4, cin, cout, False, cfg, transpose=True, dtype=dtype)
    out = {"conv": conv}
    n = _norm_init(cfg, cout, dtype)
    if n is not None:
        out["norm"] = n
    return out


def apply_upsample_block(cfg: BlockConfig, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    conv = params["conv"]
    if "depthwise_t" in conv:
        h = _conv_transpose_s2(conv["depthwise_t"], x, groups=x.shape[-1])
        h = _conv(conv["pointwise"], h)
    else:
        h = _conv_transpose_s2(conv, x)
    h = _norm_apply(cfg, params.get("norm"), h)
    return tnn.nonlinearity(cfg.nonlin, h)


def init_resnet_block(
    key, c: int, cfg: BlockConfig, is_1x1: bool = False, use_scale_parameter: bool = False, dtype=jnp.float32
) -> Dict:
    """ResnetBlock with every reference variant
    (reference resnet_block.py:13-67):
      * 3x3: conv3(no bias)->norm->nonlin->conv3(no bias)->norm
      * 1x1: conv1(bias)->nonlin->conv1(bias), NO norms
      * use_scale_parameter: out = x + scale * path(x), scale zero-init
    """
    k0, k1 = jax.random.split(key)
    if is_1x1:
        p = {
            "conv0": _init_1x1(k0, c, cfg, dtype),
            "conv1": _init_1x1(k1, c, cfg, dtype),
        }
    else:
        p = {
            "conv0": init_conv3(k0, c, c, False, cfg, dtype),
            "conv1": init_conv3(k1, c, c, False, cfg, dtype),
        }
        n0, n1 = _norm_init(cfg, c, dtype), _norm_init(cfg, c, dtype)
        if n0 is not None:
            p["norm0"] = n0
            p["norm1"] = n1
    if use_scale_parameter:
        p["scale"] = jnp.zeros((1,), dtype)
    return p


def _init_1x1(key, c, cfg: BlockConfig, dtype):
    # Both ResnetBlock and ResnetBlockSeparable use a plain conv1 for the
    # is_1x1 variant (a 1x1 conv has no separable split) — reference
    # resnet_block_seperable.py:45-52.
    return _init_wrapped_conv(key, 1, 1, c, c, True, cfg, dtype=dtype)


def apply_resnet_block(cfg: BlockConfig, params: Dict, x: jnp.ndarray, is_1x1: bool = False) -> jnp.ndarray:
    if is_1x1:
        h = _conv(params["conv0"], x)
        h = tnn.nonlinearity(cfg.nonlin, h)
        h = _conv(params["conv1"], h)
    else:
        h = apply_conv3(params["conv0"], x)
        h = _norm_apply(cfg, params.get("norm0"), h)
        h = tnn.nonlinearity(cfg.nonlin, h)
        h = apply_conv3(params["conv1"], h)
        h = _norm_apply(cfg, params.get("norm1"), h)
    if "scale" in params:
        h = params["scale"].astype(h.dtype) * h
    return x + h
