"""Fused affine+SiLU+conv3x3 Pallas kernel, channels-first (NCHW).

STATUS: superseded for the U-Net resblock path by ops/packed_conv.py — the
lane-packing formulation keeps XLA's native (hardware-windowed) conv and
measured 1.46 ms vs this kernel's 6.2 ms and plain XLA's 3.9 ms per
512^2 x 32 ResBlock: a software im2col on the VPU cannot beat the MXU's
built-in convolution streaming.  Kept (with its parity tests) as the
reference Pallas conv formulation and for shapes the packed path can't
express.

Targets the teacher U-Nets' wide shallow levels (512^2 x 32ch, 256^2 x 64ch
— reference: src/tha4/nn/common/unet.py ResBlock, mode_07.py:241-262
upscaler / :210-231 body morpher instantiations).  Measured in-context on the
chip, each XLA ResBlock at 512^2 x 32 costs ~7-8 ms: with C=32 on the lane
dimension, every NHWC tensor is physically padded 32->128 lanes, so all
bandwidth and VPU work runs at ~25% efficiency, and norm/FiLM stages
round-trip HBM between convs.

This kernel flips the layout: (N, C, H, W) puts W (512/256, always a
multiple of 128) on lanes — zero padding waste — and fuses the per-channel
affine (GroupNorm fold + FiLM scale-shift), the SiLU, the 3x3 conv (as one
MXU matmul over an im2col tile in VMEM) and the residual add into a single
pass over HBM:

    out = conv3x3(silu(x * scale + shift)) + bias [+ skip | + skip_w @ skip]

GroupNorm statistics are computed OUTSIDE the kernel (a cheap f32 reduction
over x) and folded into ``scale``/``shift`` per (n, c) — see
``fold_groupnorm_film``.  The 3x3 kernel is pre-flattened to (Cout, 9*Cin)
('w9' layout) so the conv is a single K=9*Cin matmul per tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tha4_tpu.ops.pallas_util import kernel_dot_precision


def to_w9(w_hwio: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """HWIO (3,3,Cin,Cout) -> (Cout, 9*Cin), k-major: rows of the im2col
    buffer are ordered (dy, dx, ci)."""
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    w = jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(co, kh * kw * ci)
    return w.astype(dtype) if dtype is not None else w


def fold_groupnorm_film(
    x_nchw: jnp.ndarray,
    num_groups: int,
    gn_scale: jnp.ndarray,
    gn_bias: jnp.ndarray,
    film: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...] = (),
    condition_bias: float = 1.0,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(n, c) scale/shift implementing GN(+affine) then a chain of FiLM
    scale-shifts (reference unet.py:90-97): returns (scale, shift) f32 (N, C)
    such that x*scale + shift == film_k(...film_0(GN(x))...)."""
    n, c, h, w = x_nchw.shape
    g = num_groups
    xf = x_nchw.astype(jnp.float32).reshape(n, g, c // g, h, w)
    mean = xf.mean(axis=(2, 3, 4))  # (N, G)
    var = (xf * xf).mean(axis=(2, 3, 4)) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // g, axis=1)  # (N, C)
    r_c = jnp.repeat(r, c // g, axis=1)

    a = gn_scale[None, :].astype(jnp.float32) * jnp.ones((n, c), jnp.float32)
    b = gn_bias[None, :].astype(jnp.float32) * jnp.ones((n, c), jnp.float32)
    for f_scale, f_shift in film:
        # y -> y*(cb + f_scale) + f_shift, per (N, C)
        m = condition_bias + f_scale.astype(jnp.float32)
        a = a * m
        b = b * m + f_shift.astype(jnp.float32)
    scale = a * r_c
    shift = b - mean_c * scale
    return scale, shift


def _kernel(
    scale_ref, shift_ref, w9_ref, b_ref, *rest,
    has_skip, skip_is_conv, c, co, cs, th, w, h, omit_act,
):
    idx = 0
    if skip_is_conv:
        skipw_ref = rest[idx]; idx += 1
    if has_skip:
        skip_ref = rest[idx]; idx += 1
    x_cur = rest[idx]; idx += 1  # (1, c, th, w_mem) this tile's rows
    x_nxt = rest[idx]; idx += 1  # (1, c, th, w_mem) next tile (halo source)
    out_ref = rest[idx]

    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    # x is pre-padded one zero row on top, so output tile ti's (th+2)-row
    # halo window starts exactly at block ti's first row: block ti plus the
    # first two rows of block ti+1 — both auto-pipelined by Pallas (a manual
    # in-kernel DMA here measured 2x slower: no double buffering).
    xw = jnp.concatenate([x_cur[0], x_nxt[0, :, :2, :]], axis=1)  # (c, th+2, w_mem)
    if omit_act:
        act = xw
    else:
        scale = scale_ref[0].reshape(c, 1, 1)  # block (1, c, 1), f32
        shift = shift_ref[0].reshape(c, 1, 1)
        v = xw.astype(jnp.float32) * scale + shift
        # silu spelled out (jax.nn.silu on bf16 hits a Mosaic vector.broadcast
        # element-type verification bug); math in f32, store back in xw dtype.
        act = (v / (1.0 + jnp.exp(-v))).astype(xw.dtype)
    # Zero the activation on the padding rows/columns (conv 'same' pads
    # POST-activation zeros; silu(shift) != 0 would leak into edge outputs).
    w_mem = xw.shape[2]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, th + 2, 1), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_mem), 2)
    top_pad = (ti == 0) & (row_ids == 0)
    bot_pad = (ti == n_tiles - 1) & (row_ids == th + 1)
    col_pad = (lane_ids == 0) | (lane_ids >= w + 1)
    act = jnp.where(top_pad | bot_pad | col_pad, 0.0, act)

    # The 9 conv taps as plain static slices of the halo window (pltpu.roll
    # can't rotate bf16; slices lower to supported lane shifts).
    parts = [act[:, dy : dy + th, dx : dx + w] for dy in range(3) for dx in range(3)]
    imcol = jnp.concatenate(parts, axis=0)  # (9c, th, w)

    acc = jax.lax.dot_general(
        w9_ref[:].astype(imcol.dtype), imcol,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=kernel_dot_precision(imcol.dtype),
    )  # (co, th, w)
    acc = acc + b_ref[:].reshape(co, 1, 1)

    if has_skip:
        if skip_is_conv:
            sk = jax.lax.dot_general(
                skipw_ref[:].astype(skip_ref.dtype), skip_ref[0],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=kernel_dot_precision(skip_ref.dtype),
            )
            acc = acc + sk
        else:
            acc = acc + skip_ref[0].astype(jnp.float32)

    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_th(c: int, w: int, h: int) -> int:
    # VMEM: im2col (9c, th, w) + window (c, th+2, w) in bf16, out f32.
    for th in (32, 16, 8):
        if h % th:
            continue
        bytes_needed = (9 * c * th * w) * 2 + (c * (th + 2) * w) * 2 + 4 * 128 * th * w
        if bytes_needed <= 10_000_000:
            return th
    return 0


def supported(x_shape, w_lane_multiple: int = 128) -> bool:
    n, c, h, w = x_shape
    return (
        jax.default_backend() == "tpu"
        and w % w_lane_multiple == 0
        and _pick_th(c, w, h) > 0
    )


def fused_affine_conv3_nchw(
    x: jnp.ndarray,  # (N, C, H, W)
    scale: Optional[jnp.ndarray],  # (N, C) f32, None => no pre-activation
    shift: Optional[jnp.ndarray],
    w9: jnp.ndarray,  # (Cout, 9*C)
    bias: jnp.ndarray,  # (Cout,) f32
    skip: Optional[jnp.ndarray] = None,  # (N, Cs, H, W)
    skip_w: Optional[jnp.ndarray] = None,  # (Cout, Cs) or None for identity
    out_dtype=None,
) -> jnp.ndarray:
    """out = conv3(silu(x*scale+shift)) + bias [+ skip or skip_w@skip]."""
    n, c, h, w = x.shape
    co = w9.shape[0]
    th = _pick_th(c, w, h)
    assert th > 0, f"unsupported shape {x.shape}"
    omit_act = scale is None

    # Rows: +1 zero halo on top, bottom up to a th multiple (so the padded
    # height tiles into blocks and the 'next' halo block always exists);
    # cols: +1 halo left, right up to the next 128 multiple (lane blocks
    # need 128-aligned sizes).  All pads are zeros; taps never read past
    # col w+1 or window row th+1.
    w_mem = -(-(w + 2) // 128) * 128
    rows_pad = th * -(-(h + 2) // th)
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, rows_pad - h - 1), (1, w_mem - w - 1)))
    nb = rows_pad // th  # number of th-row blocks in x_pad
    out_dtype = out_dtype or x.dtype

    grid = (n, h // th)
    # (N, C, 1) so the BlockSpec's last two dims are full-extent (Mosaic's
    # block-shape divisibility rule).
    in_specs = [
        pl.BlockSpec((1, c, 1), lambda ni, ti: (ni, 0, 0)),
        pl.BlockSpec((1, c, 1), lambda ni, ti: (ni, 0, 0)),
        pl.BlockSpec(w9.shape, lambda ni, ti: (0, 0)),
        pl.BlockSpec((co, 1), lambda ni, ti: (0, 0)),
    ]
    if scale is None:
        scale = jnp.zeros((n, c), jnp.float32)
        shift = jnp.zeros((n, c), jnp.float32)
    args = [scale[..., None], shift[..., None], w9, bias.astype(jnp.float32).reshape(co, 1)]
    skip_is_conv = skip_w is not None
    if skip_is_conv:
        cs = skip.shape[1]
        in_specs.append(pl.BlockSpec(skip_w.shape, lambda ni, ti: (0, 0)))
        args.append(skip_w)
    else:
        cs = skip.shape[1] if skip is not None else 0
    if skip is not None:
        in_specs.append(pl.BlockSpec((1, cs, th, w), lambda ni, ti: (ni, 0, ti, 0)))
        args.append(skip)
    in_specs.append(pl.BlockSpec((1, c, th, w_mem), lambda ni, ti: (ni, 0, ti, 0)))
    args.append(x_pad)
    in_specs.append(
        pl.BlockSpec((1, c, th, w_mem), lambda ni, ti: (ni, 0, jnp.minimum(ti + 1, nb - 1), 0))
    )
    args.append(x_pad)

    kernel = functools.partial(
        _kernel,
        has_skip=skip is not None,
        skip_is_conv=skip_is_conv,
        c=c, co=co, cs=cs, th=th, w=w, h=h, omit_act=omit_act,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, co, th, w), lambda ni, ti: (ni, 0, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((n, co, h, w), out_dtype),
    )(*args)
