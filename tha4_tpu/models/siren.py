"""SIREN student networks, TPU-first.

The reference's SIREN layers are 1x1 Conv2d + sin(omega0 * x)
(reference: src/tha4/nn/siren/vanilla/siren.py:12-39).  A 1x1 conv over an
NHWC grid is exactly a per-pixel matmul, so here every layer is a single
``(N*H*W, Cin) @ (Cin, Cout)`` GEMM on the MXU followed by the VPU sin — the
whole student collapses into a chain of large fused GEMMs, with position grids
precomputed (the reference rebuilds them every frame,
siren_morpher_03.py:92-105).

Three models:
  * ``Siren`` — vanilla chain (siren.py:62-91)
  * ``SirenFaceMorpher00`` — pose -> 128x128 RGBA face crop (no input image)
    (siren_face_morpher_00.py:28-52)
  * ``SirenMorpher03`` — 3-level coarse-to-fine body morpher with final
    grid-warp + alpha blend (siren_morpher_03.py:42-145)

Weights are stored as (Cin, Cout) matrices; the torch converter squeezes the
(O, I, 1, 1) conv weights and transposes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tha4_tpu.ops import warp
from tha4_tpu.ops.resize import resize_bilinear

Params = Dict


@dataclass(frozen=True)
class SirenConfig:
    """reference: src/tha4/nn/siren/vanilla/siren.py:42-59."""

    in_channels: int
    out_channels: int
    intermediate_channels: int
    num_sine_layers: int
    use_tanh: bool = False
    omega0: float = 30.0


def _init_sine_linear(key, cin: int, cout: int, is_first: bool, omega0: float) -> Params:
    """SIREN init: first layer U(+-1/cin), later U(+-sqrt(6/cin)/omega0)
    (reference: siren.py:30-36); bias uses torch Conv2d default U(+-1/sqrt(cin))."""
    wkey, bkey = jax.random.split(key)
    if is_first:
        bound = 1.0 / cin
    else:
        bound = math.sqrt(6.0 / cin) / omega0
    w = jax.random.uniform(wkey, (cin, cout), jnp.float32, -bound, bound)
    b_bound = 1.0 / math.sqrt(cin)
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -b_bound, b_bound)
    return {"w": w, "b": b}


def _init_he_linear(key, cin: int, cout: int) -> Params:
    """shion HeInitialization on a 1x1 conv: kaiming_normal fan_in leaky_relu(0)
    => std = sqrt(2/cin) (reference: shion/nn00/initialization_funcs.py:9-19)."""
    wkey, bkey = jax.random.split(key)
    w = jax.random.normal(wkey, (cin, cout), jnp.float32) * math.sqrt(2.0 / cin)
    b_bound = 1.0 / math.sqrt(cin)
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -b_bound, b_bound)
    return {"w": w, "b": b}


def _sine_linear(params: Params, x: jnp.ndarray, omega0: float, mixed: bool = False) -> jnp.ndarray:
    """x: (..., Cin) -> sin(omega0 * (x @ w + b)).

    Uses the polynomial sine (ops.pallas_siren._fast_sin, max err 6.5e-7 —
    four orders under bf16 quantization): on TPU the VPU transcendental, not
    the matmul, dominates the sine-layer cost in both directions.  The
    poly_sin custom_vjp pins the backward residual to the bf16
    pre-activation with a cos recompute (measured byte/time-neutral vs
    plain autodiff — XLA already rematerializes the polynomial chain; see
    its STATUS docstring).  The torch/builtin-sin oracles in
    tests/test_mode_14_parity.py and tests/test_pallas_siren.py lock this
    path at 2e-4 f32 regardless.

    ``mixed``: selective-f32 for bf16 TRAINING (tools/dtype_ab.py measured
    bf16's grid_l1 6x worse than f32 at 51k examples).  The phase of
    sin(omega0*pre) loses ~omega0*|pre|*2^-8 radians to a bf16 pre-activation
    — up to ~0.1 rad, i.e. ~10% activation error — so mixed keeps the matmul
    OPERANDS bf16 (one MXU pass, same speed) but accumulates to f32 and runs
    the sine in f32; only the layer OUTPUT is stored bf16.  Weights are cast
    through bf16 first so the multiplied values match the pure-bf16 path."""
    from tha4_tpu.ops.pallas_siren import poly_sin

    if mixed:
        w = params["w"].astype(jnp.bfloat16) if x.dtype == jnp.bfloat16 else params["w"]
        pre = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        pre = pre + params["b"].astype(jnp.float32)
        return poly_sin(omega0 * pre).astype(x.dtype)
    pre = x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
    return poly_sin(omega0 * pre).astype(x.dtype)


def _linear(params: Params, x: jnp.ndarray, mixed: bool = False) -> jnp.ndarray:
    if mixed:
        # Head in selective-f32: bf16 operands, f32 accumulation, f32 OUTPUT
        # (grid_change/alpha/color slices stay f32 into the warp and loss).
        w = params["w"].astype(jnp.bfloat16) if x.dtype == jnp.bfloat16 else params["w"]
        return jnp.matmul(x, w, preferred_element_type=jnp.float32) + params["b"].astype(jnp.float32)
    return x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)


def siren_init(key, cfg: SirenConfig) -> Params:
    keys = jax.random.split(key, cfg.num_sine_layers + 1)
    layers = []
    cin = cfg.in_channels
    for i in range(cfg.num_sine_layers):
        layers.append(_init_sine_linear(keys[i], cin, cfg.intermediate_channels, i == 0, cfg.omega0))
        cin = cfg.intermediate_channels
    return {
        "sine_layers": layers,
        "last_linear": _init_he_linear(keys[-1], cfg.intermediate_channels, cfg.out_channels),
    }


def siren_apply(cfg: SirenConfig, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., in_channels), channels-last."""
    for layer in params["sine_layers"]:
        x = _sine_linear(layer, x, cfg.omega0)
    x = _linear(params["last_linear"], x)
    if cfg.use_tanh:
        x = jnp.tanh(x)
    return x


# ---------------------------------------------------------------------------
# Face morpher student
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SirenFaceMorpherConfig:
    """reference: src/tha4/nn/siren/face_morpher/siren_face_morpher_00.py:12-25;
    shipped instantiation mode_14.py:96-106."""

    image_size: int = 128
    image_channels: int = 4
    pose_size: int = 39
    siren: SirenConfig = field(
        default_factory=lambda: SirenConfig(
            in_channels=41, out_channels=4, intermediate_channels=128, num_sine_layers=8
        )
    )


def siren_face_morpher_init(key, cfg: SirenFaceMorpherConfig) -> Params:
    return {"siren": siren_init(key, cfg.siren)}


def siren_face_morpher_apply(
    cfg: SirenFaceMorpherConfig, params: Params, pose: jnp.ndarray
) -> jnp.ndarray:
    """pose (N, pose_size) -> (N, S, S, C) RGBA crop.

    Position grid = identity affine grid values, broadcast-concat with pose
    (reference: siren_face_morpher_00.py:34-52).  The whole sine chain runs
    as one fused Pallas kernel on TPU (ops.pallas_siren).
    """
    from tha4_tpu.ops import pallas_siren

    n = pose.shape[0]
    s = cfg.image_size
    pos_t = warp.identity_grid(s, s).reshape(s * s, 2).T.astype(pose.dtype)  # (2, HW)
    out = pallas_siren.sine_chain_t(
        None, pos_t, pose, params["siren"]["sine_layers"], params["siren"]["last_linear"], cfg.siren.omega0
    )  # (N, C, HW)
    out = jnp.transpose(out.reshape(n, cfg.image_channels, s, s), (0, 2, 3, 1))
    if cfg.siren.use_tanh:
        out = jnp.tanh(out)
    return out


# ---------------------------------------------------------------------------
# Body morpher student
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SirenMorpherLevelConfig:
    image_size: int
    intermediate_channels: int
    num_sine_layers: int


@dataclass(frozen=True)
class SirenMorpherConfig:
    """reference: src/tha4/nn/siren/morpher/siren_morpher_03.py:14-39;
    shipped instantiation mode_14.py:109-131."""

    image_size: int = 512
    image_channels: int = 4
    pose_size: int = 45
    levels: Tuple[SirenMorpherLevelConfig, ...] = (
        SirenMorpherLevelConfig(128, 360, 3),
        SirenMorpherLevelConfig(256, 180, 3),
        SirenMorpherLevelConfig(512, 90, 3),
    )


# Output list indices (reference: siren_morpher_03.py:141-145)
SIREN_MORPHER_INDEX_BLENDED_IMAGE = 0
SIREN_MORPHER_INDEX_ALPHA = 1
SIREN_MORPHER_INDEX_COLOR_CHANGE = 2
SIREN_MORPHER_INDEX_WARPED_IMAGE = 3
SIREN_MORPHER_INDEX_GRID_CHANGE = 4
SIREN_MORPHER_OUTPUT_LENGTH = 5


def siren_morpher_init(key, cfg: SirenMorpherConfig) -> Params:
    """Level i layer stack (reference: siren_morpher_03.py:48-85):
    first layer in (pose+2 [+prev channels if i>0]) -> C_i (is_first only at
    level 0), middle layers C_i -> C_i, last layer C_i -> C_{i+1} (or C_i at
    the last level); then a He-init linear head to image_channels + 2 + 1."""
    n_levels = len(cfg.levels)
    keys = jax.random.split(key, n_levels + 1)
    levels = []
    for i, lv in enumerate(cfg.levels):
        lkeys = jax.random.split(keys[i], lv.num_sine_layers)
        layers = []
        if i == 0:
            layers.append(_init_sine_linear(lkeys[0], cfg.pose_size + 2, lv.intermediate_channels, True, 30.0))
        else:
            layers.append(
                _init_sine_linear(
                    lkeys[0], lv.intermediate_channels + cfg.pose_size + 2, lv.intermediate_channels, False, 30.0
                )
            )
        for j in range(1, lv.num_sine_layers - 1):
            layers.append(_init_sine_linear(lkeys[j], lv.intermediate_channels, lv.intermediate_channels, False, 30.0))
        out_ch = cfg.levels[i + 1].intermediate_channels if i < n_levels - 1 else lv.intermediate_channels
        layers.append(_init_sine_linear(lkeys[-1], lv.intermediate_channels, out_ch, False, 30.0))
        levels.append(layers)
    head = _init_he_linear(keys[-1], cfg.levels[-1].intermediate_channels, cfg.image_channels + 2 + 1)
    return {"levels": levels, "last_linear": head}


def _first_sine_linear_split(layer: Params, x_resized, pose: jnp.ndarray, size: int, omega0: float, mixed: bool = False):
    """A level's first sine layer WITHOUT materializing the [x, pos, pose]
    concat (which at 512^2/B8 is a 575 MB bf16 tensor written + re-read as a
    backward residual).  The weight rows split as [x | pos | pose]
    (matching the concat order in the reference, siren_morpher_03.py:92-105),
    so the layer is x @ W_x plus two cheap terms: a (H, W, C) position map
    shared across the batch and a (N, C) per-sample pose vector, both
    accumulated in f32 and folded into the bias."""
    from tha4_tpu.ops.pallas_siren import poly_sin

    w, b = layer["w"], layer["b"]
    dt = pose.dtype
    pos = warp.identity_grid(size, size)  # (H, W, 2) f32
    cx = 0 if x_resized is None else x_resized.shape[-1]
    pos_term = pos @ w[cx : cx + 2].astype(jnp.float32)  # (H, W, C)
    pose_term = pose.astype(jnp.float32) @ w[cx + 2 :].astype(jnp.float32)  # (N, C)
    bias_f32 = pos_term[None] + pose_term[:, None, None, :] + b.astype(jnp.float32)
    if mixed:
        # Selective-f32 (see _sine_linear): the f32 pos/pose terms stay f32
        # through the sine instead of being quantized to bf16 first — at 512^2
        # the bf16 grid spacing near |x|=1 is 1-2 px, so casting the
        # pre-activation aliases edge positions before the phase-sensitive
        # sin(30*pre).  Matmul operands stay bf16 (same MXU passes).
        if x_resized is None:
            pre = bias_f32
        else:
            wx = w[:cx].astype(dt) if dt == jnp.bfloat16 else w[:cx]
            pre = jnp.matmul(x_resized, wx, preferred_element_type=jnp.float32) + bias_f32
        return poly_sin(omega0 * pre).astype(dt)
    bias = bias_f32.astype(dt)
    pre = bias if x_resized is None else x_resized @ w[:cx].astype(dt) + bias
    return poly_sin(omega0 * pre).astype(dt)


def _position_and_pose(pose: jnp.ndarray, size: int) -> jnp.ndarray:
    n = pose.shape[0]
    pos = warp.identity_grid(size, size).astype(pose.dtype)
    pos = jnp.broadcast_to(pos[None], (n, size, size, 2))
    pose_img = jnp.broadcast_to(pose[:, None, None, :], (n, size, size, pose.shape[1]))
    return jnp.concatenate([pos, pose_img], axis=-1)


def _morpher_head(out_nhwc: jnp.ndarray, image: jnp.ndarray) -> List[jnp.ndarray]:
    """Shared output contract: slice grid/alpha/color from the head tensor,
    warp, alpha-blend; ordering per SIREN_MORPHER_INDEX_*
    (reference siren_morpher_03.py:125-145)."""
    grid_change = out_nhwc[..., 0:2]
    alpha = out_nhwc[..., 2:3]
    color_change = out_nhwc[..., 3:]
    warped = warp.apply_grid_change(grid_change, image)
    blended = (1.0 - alpha) * warped + alpha * color_change
    return [blended, alpha, color_change, warped, grid_change]


def siren_morpher_apply_nhwc(
    cfg: SirenMorpherConfig, params: Params, image: jnp.ndarray, pose: jnp.ndarray,
    mixed: bool = False,
) -> List[jnp.ndarray]:
    """Channels-last reference formulation (better autodiff layouts; the
    distillation loss uses this for training, where the backward pass
    dominates and XLA's NHWC gradients measure faster than the
    channels-first einsum gradients).  Must stay numerically equivalent to
    siren_morpher_apply — tests/test_mode_14_parity.py asserts it.

    ``mixed`` (training-only knob): bf16 matmul operands with f32
    accumulation + f32 sines + f32 head — closes the bf16 training-fidelity
    gap (tools/dtype_ab.py) at bf16-like step cost.  See _sine_linear."""
    x = None
    for i, lv in enumerate(cfg.levels):
        layers = params["levels"][i]
        xr = None if i == 0 else resize_bilinear(x, (lv.image_size, lv.image_size))
        x = _first_sine_linear_split(layers[0], xr, pose, lv.image_size, 30.0, mixed=mixed)
        for layer in layers[1:]:
            x = _sine_linear(layer, x, 30.0, mixed=mixed)
    return _morpher_head(_linear(params["last_linear"], x, mixed=mixed), image)


def siren_morpher_apply(
    cfg: SirenMorpherConfig, params: Params, image: jnp.ndarray, pose: jnp.ndarray
) -> List[jnp.ndarray]:
    """image (N, S, S, C), pose (N, P) -> the 5-output list
    (reference forward: siren_morpher_03.py:107-139).

    Each coarse-to-fine level runs as one fused Pallas sine-MLP kernel on TPU
    (ops.pallas_siren); the inter-level bilinear upsample stays in XLA."""
    from tha4_tpu.ops import pallas_siren
    from tha4_tpu.ops.resize import resize_bilinear_nchw

    n = pose.shape[0]
    n_levels = len(cfg.levels)
    x = None  # (N, C, HW) channels-first between levels
    for i, lv in enumerate(cfg.levels):
        s = lv.image_size
        pos_t = warp.identity_grid(s, s).reshape(s * s, 2).T.astype(pose.dtype)
        if i > 0:
            prev_s = cfg.levels[i - 1].image_size
            ch = x.shape[1]
            ximg = resize_bilinear_nchw(x.reshape(n, ch, prev_s, prev_s), (s, s))
            prev = ximg.reshape(n, ch, s * s)
        else:
            prev = None
        final = params["last_linear"] if i == n_levels - 1 else None
        x = pallas_siren.sine_chain_t(prev, pos_t, pose, params["levels"][i], final, 30.0)

    s = cfg.levels[-1].image_size
    out = jnp.transpose(x.reshape(n, cfg.image_channels + 3, s, s), (0, 2, 3, 1))
    return _morpher_head(out, image)
