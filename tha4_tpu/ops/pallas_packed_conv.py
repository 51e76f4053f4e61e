"""Fused affine+SiLU+conv3 Pallas kernel over LANE-PACKED NHWC tensors.

STATUS: measured on v5e and NOT wired into the U-Net — kept, tested, as the
packed-layout Pallas conv reference.  One fused call (affine+silu+conv3+
1x1-skip, 512^2 64->32 f4 B8) runs 4.45 ms vs 6.25 ms for the XLA packed
composition, but a REAL resblock needs the residual added after the SECOND
conv from a *different* tensor than that conv's input, so the skip cannot
ride this kernel; split across two calls the total (~7 ms) loses to XLA.
Same finding as ops/pallas_conv.py from the other layout: XLA's native
hardware-windowed convolution + fusion is the right tool for these blocks,
and the packed RELAYOUT (ops/packed_conv.py) — not kernel authorship — is
where the win was.

Composes the two wins that each alone left on the table for the teacher
U-Nets' narrow levels (reference src/tha4/nn/common/unet.py ResBlock at
512^2 x 32 / 256^2 x 64, mode_07.py:241-262 / :210-231):

  * ops/packed_conv.py's lane packing ((N,H,W,C) -> (N,H,W/f,f*C), a free
    reinterpret) gives full 128-wide lanes, but leaves XLA to schedule the
    convs — measured in-context each conv runs ~2x its isolated cost and the
    elementwise stages round-trip HBM (dec-skip block: 6.25 ms vs ~3.3 ms of
    component time at 512^2 64->32 B8).
  * ops/pallas_conv.py fuses affine+SiLU+conv in one HBM pass, but its
    channels-first im2col pays a 9x VPU copy per tile.

Here the conv runs directly on the packed layout as NINE shifted
(th, Wq, FC) x (FC, FCo) contractions — K = f*C >= 128 keeps the MXU busy,
the taps are sublane slices of a halo window (no im2col copy), and the
pre-activation affine (folded GroupNorm+FiLM), SiLU, bias, and the residual
add (identity or packed 1x1) all happen in VMEM in the same pass.

Row halos use the two-block trick from pallas_conv.py (the same array is
passed twice, the second blocked one tile ahead; Pallas double-buffers
both).  Column halos are one zero packed-column of padding on each side
(plus sublane alignment), added by the wrapper with a single jnp.pad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tha4_tpu.ops.pallas_util import kernel_dot_precision

_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(*refs, has_affine, has_skip, skip_is_conv, th, wq, wqm, fc, fco):
    """Everything 2D (rows = flattened (row, packed-col) on sublanes, FC on
    lanes): Mosaic handles 2D dots/elementwise robustly where 3D broadcasts
    trigger outer-dim unrolls.  Taps are FLAT static slices at offset
    dy*WqM + dxq — their wraparound positions land in padded columns
    (q in {0} U [wq+1, WqM)), which the output block write discards."""
    idx = 0
    if has_affine:
        scale_ref = refs[idx]; idx += 1  # (1, FC) f32 block
        shift_ref = refs[idx]; idx += 1
    wp_ref = refs[idx]; idx += 1  # (9*FC, FCo)
    b_ref = refs[idx]; idx += 1  # (8, FCo) f32 (row-broadcast copy)
    if skip_is_conv:
        skw_ref = refs[idx]; idx += 1  # (FC, FCo)
    x_cur = refs[idx]; idx += 1  # (1, th, WqM, FC)
    x_nxt = refs[idx]; idx += 1  # (1, th, WqM, FC) block ti+1 (clamped)
    out_ref = refs[idx]  # (1, th, Wq, FCo)

    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    # 3 halo rows from the next block: rows th..th+1 are the real bottom halo;
    # row th+2 exists only so the dxq=2/dy=2 flat tap slice stays in bounds
    # (its contributions land in discarded wraparound columns).
    rows = (th + 3) * wqm
    xw = jnp.concatenate(
        [x_cur[0].reshape(th * wqm, fc), x_nxt[0, :3].reshape(3 * wqm, fc)], axis=0
    )  # (rows, FC)
    if has_affine:
        v = xw.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
        act = (v / (1.0 + jnp.exp(-v))).astype(xw.dtype)
    else:
        act = xw
    # Zero padding rows/cols post-activation (silu(shift) != 0 would leak).
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    q = p - (p // wqm) * wqm  # packed column within the row
    top_pad = (ti == 0) & (p < wqm)
    bot_pad = (ti == n_tiles - 1) & (p >= (th + 1) * wqm)
    col_pad = (q == 0) | (q >= wq + 1)
    act = jnp.where(top_pad | bot_pad | col_pad, 0.0, act)

    out_rows = th * wqm
    acc = jnp.broadcast_to(b_ref[:1].astype(jnp.float32), (out_rows, fco))
    for dy in range(3):
        for dxq in range(3):
            s = dy * wqm + dxq
            a = act[s : s + out_rows]
            wtap = wp_ref[(dy * 3 + dxq) * fc : (dy * 3 + dxq + 1) * fc, :]
            acc = acc + jax.lax.dot_general(
                a, wtap.astype(a.dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=kernel_dot_precision(a.dtype),
            )

    if has_skip:
        xs = xw[wqm + 1 : wqm + 1 + out_rows]
        if skip_is_conv:
            acc = acc + jax.lax.dot_general(
                xs, skw_ref[:].astype(xs.dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=kernel_dot_precision(xs.dtype),
            )
        else:
            acc = acc + xs.astype(jnp.float32)

    # acc flat index r*WqM + j already corresponds to output packed column j
    # (the +1 halo offset cancels against the dxq tap offsets).
    out_ref[0] = acc.reshape(th, wqm, fco)[:, :wq].astype(out_ref.dtype)


def _pick_th(h: int, wqm: int, fc: int, fco: int) -> int:
    for th in (64, 32, 16, 8):
        if h % th:
            continue
        need = 3 * (th + 2) * wqm * fc * 2 + 4 * th * wqm * max(fc, fco) + th * wqm * fco * 4
        if need <= 48 * 1024 * 1024:
            return th
    return 0


def supported(xp_shape) -> bool:
    n, h, wq, fc = xp_shape
    return (
        jax.default_backend() == "tpu"
        and fc % 128 == 0
        and _pick_th(h, -(-(wq + 2) // 8) * 8, fc, fc) > 0
    )


def fused_packed_conv3(
    xp: jnp.ndarray,  # (N, H, Wq, FC) packed
    scale: Optional[jnp.ndarray],  # (N, FC) f32 per-packed-channel, or None
    shift: Optional[jnp.ndarray],
    wp: jnp.ndarray,  # (3, 3, FC, FCo) packed conv weights
    bias: jnp.ndarray,  # (FCo,) f32
    skip: str = "none",  # "none" | "identity" | "conv"
    skip_w: Optional[jnp.ndarray] = None,  # (FC, FCo) packed 1x1
    out_dtype=None,
) -> jnp.ndarray:
    """conv3(silu(xp*scale+shift)) + bias [+ xp | + xp @ skip_w], all in one
    pass over HBM.  SAME padding semantics of the packed conv (exactly
    XLA-SAME on the packed tensor, which pack_conv3_weights makes equal to
    the original conv)."""
    n, h, wq, fc = xp.shape
    fco = wp.shape[3]
    wqm = -(-(wq + 2) // 8) * 8
    th = _pick_th(h, wqm, fc, fco)
    assert th > 0, f"unsupported {xp.shape}"
    has_affine = scale is not None

    rows_pad = th * -(-(h + 2) // th)
    x_pad = jnp.pad(xp, ((0, 0), (1, rows_pad - h - 1), (1, wqm - wq - 1), (0, 0)))
    nb = rows_pad // th
    out_dtype = out_dtype or xp.dtype

    w9 = jnp.transpose(wp, (0, 1, 2, 3)).reshape(9 * fc, fco)

    in_specs = []
    args = []
    if has_affine:
        # (N, 1, FC) so the per-batch block's last two dims satisfy Mosaic's
        # block-divisibility rule (second-minor equals the array dim).
        in_specs += [
            pl.BlockSpec((1, 1, fc), lambda ni, ti: (ni, 0, 0)),
            pl.BlockSpec((1, 1, fc), lambda ni, ti: (ni, 0, 0)),
        ]
        args += [scale.astype(jnp.float32)[:, None, :], shift.astype(jnp.float32)[:, None, :]]
    in_specs.append(pl.BlockSpec(w9.shape, lambda ni, ti: (0, 0)))
    args.append(w9)
    in_specs.append(pl.BlockSpec((8, fco), lambda ni, ti: (0, 0)))
    args.append(jnp.tile(bias.astype(jnp.float32)[None, :], (8, 1)))
    skip_is_conv = skip == "conv"
    if skip_is_conv:
        in_specs.append(pl.BlockSpec(skip_w.shape, lambda ni, ti: (0, 0)))
        args.append(skip_w)
    in_specs.append(pl.BlockSpec((1, th, wqm, fc), lambda ni, ti: (ni, ti, 0, 0)))
    args.append(x_pad)
    in_specs.append(
        pl.BlockSpec((1, th, wqm, fc), lambda ni, ti: (ni, jnp.minimum(ti + 1, nb - 1), 0, 0))
    )
    args.append(x_pad)

    kernel = functools.partial(
        _kernel,
        has_affine=has_affine,
        has_skip=skip != "none",
        skip_is_conv=skip_is_conv,
        th=th, wq=wq, wqm=wqm, fc=fc, fco=fco,
    )
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, wq, fco), lambda ni, ti: (ni, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wq, fco), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*args)
