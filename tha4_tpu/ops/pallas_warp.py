"""Pallas TPU kernel for bilinear grid sampling (the hot warp op).

XLA's gather lowering runs the 512x512x8 warp in ~50-70 ms on a v5e chip
(~2 ns/element) — it dominates the whole distillation step (SURVEY.md section
7 hot-op list).  This kernel reformulates the gather as MXU/VPU work:

  * The source image stays resident in VMEM (512x512x4 bf16 = 2 MB << 16 MB).
  * Per 8x128 output tile, a (KH, KW) window is dynamically sliced around the
    tile's minimum source coordinate (pl.ds with runtime starts).
  * The VERTICAL pick+lerp is ONE matmul per channel: a (P, KH) one-hot
    matrix with the two row weights (1-ty, ty) folded in, times the
    (KH, KW) window -> the MXU does the gather.
  * The HORIZONTAL pick+lerp is a folded one-hot mask multiply + lane
    reduction on the VPU.

Semantics: torch grid_sample(mode='bilinear', padding_mode='border',
align_corners=False), as in ops.warp.grid_sample_bilinear_border, EXCEPT
displacements are clamped to the window: a sample farther than
(KH - TILE_H)/2 rows or (KW - TILE_W)/2 columns from its output pixel clamps
to the window edge.  THA4 flow fields are smooth conv outputs bounded well
inside these budgets (~119 rows / ~63 cols at 512px); the pure-jnp fallback
remains the reference semantics.

The custom VJP differentiates w.r.t. the grid only (all THA4 training paths
stop gradients at the warped image; the reference's students likewise only
backprop into their own grid_change).  The image cotangent is ZERO — the
image is treated as a constant, exactly as if the caller had wrapped it in
``stop_gradient``.  A recipe that must backprop through the warped image's
pixels has to use ops.warp.grid_sample_bilinear_border (the auto-router
``apply_grid_change`` documents the same contract); tests/test_pallas_warp.py
asserts this zero-image-grad contract loudly so it can never drift silently.

Under differentiation the forward runs a second kernel variant
(`_fwd_corners_kernel`) that emits the analytic dOut/d(ix), dOut/d(iy)
fields alongside the samples, so the backward pass is pure elementwise jnp —
no gather ever runs at cotangent time.  The primal-only (inference) path
keeps the cheaper folded single-matmul kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tha4_tpu.ops.pallas_util import kernel_dot_precision

TILE_H = 8

# Mosaic's default scoped-VMEM limit is 16 MB (a v5e core has 128 MB).  The
# kernels' unrolled channel loops keep every channel's (th, tw, kw)
# temporaries live at once — measured 24.04 MB for the bwd at n=1/th=16 and
# 64.62 MB for the f32 fwd at n=1/th=64 — so raise the limit rather than
# shrink tiles (taller tiles are what make small batches fast; see
# _tile_h_fwd).
_VMEM_LIMIT = 96 * 1024 * 1024


def _tile_h_fwd(n: int) -> int:
    """Forward row-tile height.  Small batches use tall tiles with a taller
    source window: measured best latency on v5e at batch 1 is th=64/kh=192
    (1.23 ms vs 1.37 at th=16/kh=128 for the 512^2 x4 warp); vertical budget
    stays (192 - 64 - 8)/2 = 60 px vs the ~36 px trained THA4 flows reach."""
    return 64 if n <= 2 else TILE_H


def _tile_h_bwd(n: int) -> int:
    """Row-tile height of the corners (differentiable-path) kernel: smaller
    than the primal forward's because the unrolled channel loop keeps every
    channel's (th, tw, kw) f32 r0/r1 temporaries live (measured 24 MB at
    th=16; th=64 would blow the 64 MB scoped limit).  Budget
    (128 - 16 - 8)/2 = 52 px; budget introspection reports this tighter of
    the two."""
    return 16 if n <= 2 else TILE_H


def _tile_w(w: int) -> int:
    if w % 128 == 0:
        return 128
    if w % 64 == 0:
        return 64
    raise ValueError(f"width {w} not divisible by 64")


def _window(h: int, w: int, tw: int, th: int) -> Tuple[int, int]:
    # Window sizes leave room for the alignment of the dynamic base (sublane
    # 8 / lane 128) plus the tile extent plus the displacement budget.
    kh = min(192 if th > 16 else 128, h)
    kw = min(tw + 256, w)
    kw = min(-(-kw // 128) * 128, w) if w % 128 == 0 else w
    return kh, kw


def _coords(gx_ref, gy_ref, h, w, w_mem, kh, kw):
    """Shared coordinate/window math for fwd and bwd kernels.

    ``w`` is the true image width (coordinate semantics); ``w_mem`` the padded
    lane-aligned memory width used for window slicing.
    """
    gx = gx_ref[0].astype(jnp.float32)  # (TH, TW)
    gy = gy_ref[0].astype(jnp.float32)
    ix = jnp.clip(((gx + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
    iy = jnp.clip(((gy + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    # Aligned dynamic-slice base (Mosaic requires provable alignment).
    by = pl.multiple_of(jnp.clip(jnp.min(iy0) & ~7, 0, h - kh), 8)
    bx = pl.multiple_of(jnp.clip(jnp.min(ix0) & ~127, 0, max(w_mem - kw, 0)), 128)
    ly0 = jnp.clip(iy0 - by, 0, kh - 1)
    ly1 = jnp.clip(iy1 - by, 0, kh - 1)
    lx0 = jnp.clip(ix0 - bx, 0, kw - 1)
    lx1 = jnp.clip(ix1 - bx, 0, kw - 1)
    return ix, iy, tx, ty, by, bx, ly0, ly1, lx0, lx1


def _fwd_kernel(gx_ref, gy_ref, img_ref, out_ref, *, h, w, w_mem, kh, kw, th, tw, c):
    ix, iy, tx, ty, by, bx, ly0, ly1, lx0, lx1 = _coords(gx_ref, gy_ref, h, w, w_mem, kh, kw)
    # Folded lerp weights as TENT functions: weight[k] = max(0, 1 - |k - l|)
    # where l = clip(coord - base, 0, K-1) is the float sample position in
    # window coordinates.  At k = floor(l) this is exactly (1 - t); at
    # floor(l)+1 it is 1-(1-t) (== t up to one f32 ulp, far below the bf16
    # truncation the MXU dot applies to the weights anyway); everywhere else
    # zero — the same folded one-hot the previous compare+select construction
    # built, in 4 cheap VPU ops per element instead of two integer compares
    # plus two selects plus an add.  One-hot *construction* is this kernel's
    # VPU cost center (tools/warp_probe.py), so this is the hot path; border
    # and out-of-window clamps come out identical because l is clipped to
    # [0, K-1] (a clamped sample puts weight 1 on the window edge).
    # (Mosaic's tpu.iota is integer-only; build int32 and convert.)
    krow = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kh), 2).astype(jnp.float32)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kw), 2).astype(jnp.float32)
    ly = jnp.clip(iy - by, 0.0, kh - 1.0)
    lx = jnp.clip(ix - bx, 0.0, kw - 1.0)
    # The vertical dot runs at explicit DEFAULT precision: one MXU pass, with
    # operands truncated to bf16.  This quantizes the folded lerp weight to a
    # bf16 mantissa (<=0.4% weight error) and is the production inference
    # semantics the 31.9 dB bf16 fidelity lock (tests/test_mode_14_parity.py)
    # was measured under; HIGHEST here is a 6-pass f32 emulation that costs
    # 2.8x end-to-end fps (331 -> 117, BENCH_r03 vs r04) for fidelity below
    # the codec's quantization floor.  The precision is explicit (never None)
    # so an ambient jax.default_matmul_precision('high') cannot leak a
    # Mosaic-unloweable HIGH tier into the kernel — see
    # kernel_dot_precision's docstring and test_pallas_warp's ambient-
    # precision regression test.  An exact-corner alternative exists in
    # _fwd_corners_kernel (used under differentiation).
    ohv = jnp.maximum(0.0, 1.0 - jnp.abs(krow - ly[..., None])).reshape(th * tw, kh)
    ohh = jnp.maximum(0.0, 1.0 - jnp.abs(kcol - lx[..., None]))
    for ch in range(c):
        win = img_ref[0, ch, pl.ds(by, kh), pl.ds(bx, kw)].astype(jnp.float32)
        v = jax.lax.dot_general(
            ohv, win, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ).reshape(th, tw, kw)
        out_ref[0, ch] = jnp.sum(v * ohh, axis=-1).astype(out_ref.dtype)


def _fwd_corners_kernel(gx_ref, gy_ref, img_ref, out_ref, dx_ref, dy_ref, *, h, w, w_mem, kh, kw, th, tw, c):
    """Forward that ALSO emits the analytic grid-gradient fields.

    For bilinear sampling dOut/d(ix) and dOut/d(iy) are pure functions of the
    four corner values and the lerp weights — all available in-register during
    the forward.  Emitting them here makes the whole backward pass elementwise
    (no second gather): dgrid = sum_c dout_c * D{x,y}_c * clamp_mask * size/2.

    vs the retired `_bwd_kernel` (which re-gathered the corners with its own
    one-hot matmuls at dout time): the training-path warp drops from
    fwd 11.7 ms + bwd 20 ms to this fused forward + ~1 ms of jnp elementwise
    (B8 512^2x4 bf16, v5e).  Corners come from pure 0/1 one-hot matmuls — exact
    in bf16 — and are lerped on the VPU in f32, so `out` is bit-identical to
    ops.warp.grid_sample_bilinear_border given the same inputs.
    """
    _, _, tx, ty, by, bx, ly0, ly1, lx0, lx1 = _coords(gx_ref, gy_ref, h, w, w_mem, kh, kw)
    krow = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kh), 2)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kw), 2)
    # Pure 0/1 one-hots are exact in bf16 (halves the VMEM footprint); match
    # the image dtype so f32 inputs keep f32 corners.
    wdt = jnp.bfloat16 if img_ref.dtype == jnp.bfloat16 else jnp.float32
    oh0 = (krow == ly0[..., None]).astype(wdt).reshape(th * tw, kh)
    oh1 = (krow == ly1[..., None]).astype(wdt).reshape(th * tw, kh)
    m0 = (kcol == lx0[..., None]).astype(jnp.float32)
    m1 = (kcol == lx1[..., None]).astype(jnp.float32)

    dn = (((1,), (0,)), ((), ()))
    for ch in range(c):
        win = img_ref[0, ch, pl.ds(by, kh), pl.ds(bx, kw)].astype(wdt)
        prec = kernel_dot_precision(wdt)
        r0 = jax.lax.dot_general(oh0, win, dn, preferred_element_type=jnp.float32,
                                 precision=prec).reshape(th, tw, kw)
        r1 = jax.lax.dot_general(oh1, win, dn, preferred_element_type=jnp.float32,
                                 precision=prec).reshape(th, tw, kw)
        v00 = jnp.sum(r0 * m0, axis=-1)
        v01 = jnp.sum(r0 * m1, axis=-1)
        v10 = jnp.sum(r1 * m0, axis=-1)
        v11 = jnp.sum(r1 * m1, axis=-1)
        top_dx = v01 - v00
        bot_dx = v11 - v10
        top = v00 + top_dx * tx
        bot = v10 + bot_dx * tx
        out_ref[0, ch] = (top + (bot - top) * ty).astype(out_ref.dtype)
        dx_ref[0, ch] = (top_dx + (bot_dx - top_dx) * ty).astype(dx_ref.dtype)
        dy_ref[0, ch] = (bot - top).astype(dy_ref.dtype)


def _forward_impl(image_nchw: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray, true_w: int) -> jnp.ndarray:
    n, c, h, w = image_nchw.shape
    ho, wo = gx.shape[1], gx.shape[2]
    th, tw = _tile_h_fwd(n), _tile_w(wo)
    kh, kw = _window(h, w, tw, th)
    kernel = functools.partial(_fwd_kernel, h=h, w=true_w, w_mem=w, kh=kh, kw=kw, th=th, tw=tw, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n, ho // th, wo // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, c, h, w), lambda nn, i, j: (nn, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, th, tw), lambda nn, i, j: (nn, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((n, c, ho, wo), image_nchw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(gx, gy, image_nchw)


def _forward_corners_impl(image_nchw, gx, gy, true_w: int):
    """Forward + analytic gradient fields (used under differentiation).

    Uses the tighter `_tile_h_bwd` tiling — the r0/r1 f32 temporaries double
    the per-tile VMEM vs the folded forward — so the displacement budget of
    the differentiable path is unchanged from the retired backward kernel.
    """
    n, c, h, w = image_nchw.shape
    ho, wo = gx.shape[1], gx.shape[2]
    th, tw = _tile_h_bwd(n), _tile_w(wo)
    kh, kw = _window(h, w, tw, th)
    kernel = functools.partial(
        _fwd_corners_kernel, h=h, w=true_w, w_mem=w, kh=kh, kw=kw, th=th, tw=tw, c=c
    )
    out, dx, dy = pl.pallas_call(
        kernel,
        grid=(n, ho // th, wo // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, c, h, w), lambda nn, i, j: (nn, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, th, tw), lambda nn, i, j: (nn, 0, i, j)),
            pl.BlockSpec((1, c, th, tw), lambda nn, i, j: (nn, 0, i, j)),
            pl.BlockSpec((1, c, th, tw), lambda nn, i, j: (nn, 0, i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, ho, wo), image_nchw.dtype),
            jax.ShapeDtypeStruct((n, c, ho, wo), jnp.float32),
            jax.ShapeDtypeStruct((n, c, ho, wo), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(gx, gy, image_nchw)
    return out, dx, dy


@jax.custom_vjp
def grid_sample_fast(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear border sample of NHWC ``image`` at ``grid`` (N,Ho,Wo,2).

    The image is treated as a CONSTANT (stop_gradient applied): gradients
    flow to the grid only.  This matches every THA4 training path — students
    backprop only into their own grid_change and the teacher runs no-grad
    (reference: siren_morpher_03.py:130 warps the input image, whose
    cotangent is never consumed).  A recipe that needs image gradients must
    use ops.warp.grid_sample_bilinear_border.
    """
    # Primal-only path (inference): the folded single-matmul kernel with its
    # tall-tile latency tuning.  Under differentiation JAX runs
    # _grid_sample_fast_fwd instead, which uses the corners kernel.
    image = jax.lax.stop_gradient(image)
    image_nchw, gx, gy = _pad_and_pack(image, grid)
    out = _forward_impl(image_nchw, gx, gy, true_w=image.shape[2])
    return jnp.transpose(out[:, :, :, : grid.shape[2]], (0, 2, 3, 1))


def _pad_and_pack(image, grid):
    """Shared NHWC->NCHW + lane-padding prologue for both forward kernels.

    Mosaic wants 128-multiple lane extents: pad widths up (edge values;
    coordinate math still uses the true w) and slice the output back.
    """
    w, wo = image.shape[2], grid.shape[2]
    w_pad = -(-w // 128) * 128
    wo_pad = -(-wo // 128) * 128
    image_nchw = _pad_width(jnp.transpose(image, (0, 3, 1, 2)), w_pad, 3)
    gx = _pad_width(grid[..., 0], wo_pad, 2)
    gy = _pad_width(grid[..., 1], wo_pad, 2)
    return image_nchw, gx, gy


def _pad_width(x, target, axis):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, mode="edge")


def _grid_sample_fast_fwd(image, grid):
    image = jax.lax.stop_gradient(image)
    n, h, w, c = image.shape
    wo = grid.shape[2]
    image_nchw, gx, gy = _pad_and_pack(image, grid)
    out, dx, dy = _forward_corners_impl(image_nchw, gx, gy, true_w=w)
    out = jnp.transpose(out[:, :, :, :wo], (0, 2, 3, 1))
    # Residuals: the analytic per-channel gradient fields + the grid (for the
    # border-clamp mask).  The image is NOT needed again — the backward is
    # pure elementwise.
    return out, (dx[:, :, :, :wo], dy[:, :, :, :wo], grid, h, w, c)


def _grid_sample_fast_bwd(residual, g):
    dx, dy, grid, h, w, c = residual
    dout = jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32)  # (N, C, Ho, Wo)
    dv_dix = jnp.sum(dout * dx, axis=1)
    dv_diy = jnp.sum(dout * dy, axis=1)
    # Chain through unnormalize + border clamp (zero grad where clamped).
    ix_un = ((grid[..., 0].astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    iy_un = ((grid[..., 1].astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    gxmask = ((ix_un > 0.0) & (ix_un < w - 1.0)).astype(jnp.float32)
    gymask = ((iy_un > 0.0) & (iy_un < h - 1.0)).astype(jnp.float32)
    dgrid = jnp.stack(
        [dv_dix * gxmask * (0.5 * w), dv_diy * gymask * (0.5 * h)], axis=-1
    ).astype(grid.dtype)
    dimage = jnp.zeros((g.shape[0], h, w, c), g.dtype)
    return dimage, dgrid


grid_sample_fast.defvjp(_grid_sample_fast_fwd, _grid_sample_fast_bwd)


def supported(image_shape, grid_shape) -> bool:
    """Whether the fast kernel handles these shapes (widths are padded to
    lane multiples internally, so only row-tiling constraints remain)."""
    n, h, w, c = image_shape
    ho, wo = grid_shape[1], grid_shape[2]
    return jax.default_backend() == "tpu" and h % TILE_H == 0 and ho % TILE_H == 0


def displacement_budget_px(image_shape, grid_shape) -> Tuple[float, float]:
    """Conservative per-axis displacement budget (dy, dx) in PIXELS.

    Any grid whose max |displacement| stays within this budget is sampled
    bit-identically to grid_sample_bilinear_border; beyond it, samples may
    clamp to the VMEM window edge (the documented deviation).  Derivation:
    within one (th, tw) output tile the window must cover the source span —
    base alignment can lose 7 rows / 127 cols, rows span th-1 + 2*B_y, and
    the +1 pixel of the bilinear corner:
      th-1 + 2*B_y + 8 <= kh - 1  ->  B_y = (kh - th - 8) / 2
      tw-1 + 2*B_x + 128 <= kw - 1 ->  B_x = (kw - tw - 128) / 2
    """
    n, h, w, c = image_shape
    wo = grid_shape[2]
    w_pad = -(-w // 128) * 128
    wo_pad = -(-wo // 128) * 128
    # Report the TIGHTER configuration (the corners kernel used under
    # differentiation): a grid inside this budget samples exactly in both
    # the primal and the differentiable forward.
    th, tw = _tile_h_bwd(n), _tile_w(wo_pad)
    kh, kw = _window(h, w_pad, tw, th)
    return (kh - th - 8) / 2.0, (kw - tw - 128) / 2.0


def within_budget(grid_change: jnp.ndarray, image_shape, grid_shape) -> jnp.ndarray:
    """Traced scalar bool: every displacement of ``grid_change`` (N,H,W,2,
    normalized offsets) fits the fast kernel's window budget."""
    n, h, w, c = image_shape
    by, bx = displacement_budget_px(image_shape, grid_shape)
    dx_px = jnp.max(jnp.abs(grid_change[..., 0].astype(jnp.float32))) * (w / 2.0)
    dy_px = jnp.max(jnp.abs(grid_change[..., 1].astype(jnp.float32))) * (h / 2.0)
    return (dy_px <= by) & (dx_px <= bx)
