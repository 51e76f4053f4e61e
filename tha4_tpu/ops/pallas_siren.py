"""Fused SIREN MLP Pallas kernels (channels-first), forward AND backward.

The students are chains of 1x1-conv sine layers over dense pixel grids
(reference: src/tha4/nn/siren/vanilla/siren.py:12-39).  Two structural facts
drive this kernel's design (measured on v5e):

  1. Executed layer by layer in XLA, every intermediate round-trips HBM
     (~1 GB per level at 512x512x8; forward ~49 ms vs <1 ms of MXU work).
  2. THA4 channel counts (4..360) leave most of each 128-wide vector lane
     empty in channels-LAST layout — elementwise/memory ops run at ~20% of
     HBM bandwidth.

So the kernels chain all layers of a level over a pixel tile resident in
VMEM, in CHANNELS-FIRST layout: activations are (C, pixels) with pixels on
the lane dimension (always full), weights are (Cout, Cin) so each layer is
``W @ h`` with the huge pixel dim as the MXU N dimension.  Levels pass
(N, C, HW) tensors to each other; only the final head output transposes back
to NHWC.

Gradients: custom_vjp whose backward is ALSO a fused Pallas kernel — it
recomputes the pre-activations for the tile in VMEM (rematerialization:
trading cheap MXU work for the HBM round-trips that dominate the unfused
backward), then runs the reverse chain in one pass, accumulating weight/bias
gradients across grid steps.  Falls back to jax.vjp over the jnp composition
off-TPU or when shapes exceed the VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tha4_tpu.ops.pallas_util import kernel_dot_precision

# Mosaic's default scoped-VMEM limit is 16 MB; a v5e core has 128 MB of VMEM.
# The backward kernel's recompute stash legitimately wants more than 16 MB at
# useful tile sizes, so raise the limit and budget tiles against it below.
_BWD_VMEM_LIMIT = 100 * 1024 * 1024
_BWD_SCOPED_BUDGET = 48 * 1024 * 1024
_FWD_VMEM_LIMIT = 100 * 1024 * 1024
_FWD_SCOPED_BUDGET = 40 * 1024 * 1024


# Polynomial sine for the forward kernel.  jnp.sin costs ~26 VPU ops/elem on
# v5e — measured 0.63 ms per (90, 512^2) sine layer, which made the
# transcendental (not the matmuls, ~0.1 ms each) the real-time bottleneck.
# This is Cody-Waite range reduction to [-pi, pi] + a degree-11 odd
# least-squares-on-Chebyshev-nodes polynomial: 12 VPU ops, max error 6.5e-7
# over |x| <= 200 in f32 (the f32 rounding floor; bf16 activations quantize
# at ~4e-3, four orders coarser).  Fitted/validated offline; the interp-mode
# parity tests (tests/test_pallas_siren.py, atol 1e-4 f32) cover the chain.
_SIN_C1 = 9.9999959991e-01
_SIN_C3 = -1.6666552633e-01
_SIN_C5 = 8.3324029750e-03
_SIN_C7 = -1.9808632984e-04
_SIN_C9 = 2.6997142332e-06
_SIN_C11 = -2.0362228527e-08
_INV_TWO_PI = 0.15915494309189535
_TWO_PI_HI = 6.28125
_TWO_PI_LO = 1.9353071795864769e-03


def _fast_sin(x):
    x = x.astype(jnp.float32)
    k = jnp.round(x * _INV_TWO_PI)
    r = x - k * _TWO_PI_HI - k * _TWO_PI_LO
    r2 = r * r
    return r * (
        _SIN_C1
        + r2 * (_SIN_C3 + r2 * (_SIN_C5 + r2 * (_SIN_C7 + r2 * (_SIN_C9 + r2 * _SIN_C11))))
    )


def _fast_cos(x):
    """cos(x) = sin(x + pi/2) through the same reduction (one extra add)."""
    return _fast_sin(x.astype(jnp.float32) + (jnp.pi / 2))


@jax.custom_vjp
def poly_sin(a):
    """``_fast_sin`` with an explicit one-residual VJP for the autodiff path.

    STATUS (measured, v5e): byte/time NEUTRAL vs plain autodiff of the
    polynomial.  Hypothesis was that autodiff saves full-size f32 residuals
    (r, r2, Horner products) per sine layer; in fact XLA's fusion already
    recomputes the whole elementwise chain across the fwd/bwd boundary —
    cost_analysis reports identical bytes (23.72 GB) and the student B8
    fwd+bwd measures 64.8 vs 65.7 ms (noise).  Kept anyway: it pins the
    residual choice (only ``a``, in its incoming dtype — bf16 on the train
    path) at the jaxpr level, independent of XLA fusion heuristics, and
    makes the gradient explicit.

    The backward uses cos(a) — the derivative of the TRUE sine; the
    forward's polynomial has a slightly different exact derivative
    (relative gap ~1e-6, the poly's fit error — same deliberate
    approximation as the fused Pallas backward kernel below, and four
    orders under the 1e-4 gradient-parity test floors)."""
    return _fast_sin(a).astype(a.dtype)


def _poly_sin_fwd(a):
    return _fast_sin(a).astype(a.dtype), a


def _poly_sin_bwd(a, g):
    return ((g.astype(jnp.float32) * _fast_cos(a)).astype(g.dtype),)


poly_sin.defvjp(_poly_sin_fwd, _poly_sin_bwd)


def _align8(x: int) -> int:
    return -(-x // 8) * 8


def _align128(x: int) -> int:
    return -(-x // 128) * 128


class _PackedSpec:
    __slots__ = ("row_off", "ci", "co")

    def __init__(self, row_off, ci, co):
        self.row_off = row_off
        self.ci = ci
        self.co = co


def pack_weights_t(layers: Sequence[Dict], final_linear: Optional[Dict], compute_dtype):
    """Pack TRANSPOSED (Co, Ci) weight matrices into one (rows, maxCi) buffer
    and biases into one (rows, 128) f32 buffer (bias in lane column 0)."""
    mats = list(layers) + ([final_linear] if final_linear is not None else [])
    max_ci = _align128(max(m["w"].shape[0] for m in mats))
    wblocks = []
    bblocks = []
    specs: List[_PackedSpec] = []
    row = 0
    for m in mats:
        ci, co = m["w"].shape
        co_pad = _align8(co)
        wt = jnp.pad(m["w"].astype(compute_dtype).T, ((0, co_pad - co), (0, max_ci - ci)))
        wblocks.append(wt)
        bblocks.append(
            jnp.pad(m["b"].astype(jnp.float32).reshape(-1, 1), ((0, co_pad - co), (0, 127)))
        )
        specs.append(_PackedSpec(row, ci, co))
        row += co_pad
    return jnp.concatenate(wblocks, axis=0), jnp.concatenate(bblocks, axis=0), specs


def _make_kernel(specs, num_sine, omega, has_prev, n, tile, compute_dtype):
    def kernel(*refs):
        idx = 0
        poset_ref = refs[idx]; idx += 1  # (pose_dim, N)
        pos_ref = refs[idx]; idx += 1  # (1, 2, tile)
        prev_ref = None
        if has_prev:
            prev_ref = refs[idx]; idx += 1  # (n, Cp, tile)
        wref = refs[idx]; idx += 1
        bref = refs[idx]; idx += 1
        out_ref = refs[idx]

        pos = pos_ref[0].astype(compute_dtype)  # (2, tile)

        for bi in range(n):
            pose_col = poset_ref[:, bi : bi + 1]  # (pose_dim, 1) static lane slice
            pose_b = jnp.broadcast_to(pose_col, (pose_col.shape[0], tile)).astype(compute_dtype)
            parts = []
            if prev_ref is not None:
                parts.append(prev_ref[bi])
            parts.extend([pos, pose_b])
            h = jnp.concatenate(parts, axis=0)  # (Cin, tile) sublane concat

            for li, spec in enumerate(specs):
                w = wref[pl.ds(spec.row_off, _align8(spec.co)), : spec.ci]
                b = bref[pl.ds(spec.row_off, _align8(spec.co)), :1]
                acc = jax.lax.dot_general(
                    w.astype(compute_dtype), h[: spec.ci].astype(compute_dtype),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    precision=kernel_dot_precision(compute_dtype),
                ) + b
                if li < num_sine:
                    h = _fast_sin(omega * acc).astype(compute_dtype)
                else:
                    h = acc
            out_ref[bi] = h[: out_ref.shape[1]].astype(out_ref.dtype)

    return kernel


def fused_sine_chain_t(
    prev: Optional[jnp.ndarray],  # (N, Cp, HW) channels-first, or None
    pos_t: jnp.ndarray,  # (2, HW)
    pose: jnp.ndarray,  # (N, pose_dim)
    layers: Sequence[Dict],
    final_linear: Optional[Dict] = None,
    omega: float = 30.0,
    out_dtype=None,
) -> jnp.ndarray:
    """-> (N, Cout, HW) channels-first."""
    n = pose.shape[0]
    hw = pos_t.shape[1]
    compute_dtype = pos_t.dtype
    cp = prev.shape[1] if prev is not None else 0
    out_co_ = (final_linear or layers[-1])["w"].shape[1]
    cmax = max([l["w"].shape[1] for l in layers] + [l["w"].shape[0] for l in layers] + [128])
    # bytes/pixel of VMEM: double-buffered in+out blocks (xn batch) + f32
    # intermediates of the widest layer.  Tiles are sized against a large
    # scoped budget (the raised _FWD_VMEM_LIMIT, well under the 128 MB core):
    # per-grid-step overhead is ~15 us on v5e, so at batch 1 the difference
    # between 128 steps (old 6 MB budget) and 16 steps is ~1.7 ms of a ~2 ms
    # level — tile size IS the latency knob for the real-time path.
    per_px = 4 * n * (cp + out_co_) + 12 * cmax
    budget_px = max(512, _FWD_SCOPED_BUDGET // per_px)
    tile = 512
    while tile * 2 <= min(budget_px, hw) and hw % (tile * 2) == 0:
        tile *= 2
    assert hw % tile == 0

    wbuf, bbuf, specs = pack_weights_t(layers, final_linear, compute_dtype)
    out_co = (final_linear or layers[-1])["w"].shape[1]
    out_dtype = out_dtype or compute_dtype
    kernel = _make_kernel(specs, len(layers), omega, prev is not None, n, tile, compute_dtype)

    in_specs = [
        pl.BlockSpec((pose.shape[1], n), lambda i: (0, 0)),  # poseT
        pl.BlockSpec((1, 2, tile), lambda i: (0, 0, i)),
    ]
    args = [pose.astype(jnp.float32).T, pos_t.reshape(1, 2, hw)]
    if prev is not None:
        in_specs.append(pl.BlockSpec((n, cp, tile), lambda i: (0, 0, i)))
        args.append(prev)
    in_specs.append(pl.BlockSpec(wbuf.shape, lambda i: (0, 0)))
    in_specs.append(pl.BlockSpec(bbuf.shape, lambda i: (0, 0)))
    args.extend([wbuf, bbuf])

    return pl.pallas_call(
        kernel,
        grid=(hw // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, out_co, tile), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((n, out_co, hw), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
    )(*args)


# ---------------------------------------------------------------------------
# differentiable wrapper: fused forward, exact jnp backward
# ---------------------------------------------------------------------------


def _jnp_chain_t(prev_t, pos_t, pose, layers, final_linear, omega):
    """Channels-first jnp reference: (N, Cp, HW) -> (N, Cout, HW)."""
    n = pose.shape[0]
    hw = pos_t.shape[1]
    pose_b = jnp.broadcast_to(pose[:, :, None], (n, pose.shape[1], hw)).astype(pos_t.dtype)
    parts = []
    if prev_t is not None:
        parts.append(prev_t)
    parts.append(jnp.broadcast_to(pos_t[None], (n, 2, hw)))
    parts.append(pose_b)
    h = jnp.concatenate(parts, axis=1)
    for layer in layers:
        wt = layer["w"].astype(h.dtype)
        # Same polynomial sine as the kernel and the NHWC path: every
        # production route computes identical maths (the torch golden tests
        # are the independent accuracy oracle).
        h = _fast_sin(
            omega * (jnp.einsum("io,nih->noh", wt, h) + layer["b"].astype(h.dtype)[None, :, None])
        ).astype(h.dtype)
    if final_linear is not None:
        wt = final_linear["w"].astype(h.dtype)
        h = jnp.einsum("io,nih->noh", wt, h) + final_linear["b"].astype(h.dtype)[None, :, None]
    return h


def _fused_ok(prev_t, pos_t, pose, layers, final_linear) -> bool:
    """Conservative guard: only run the fused kernel where its VMEM budget is
    comfortable; otherwise the channels-first XLA path (still ~1.5x faster
    than channels-last thanks to full lanes)."""
    if jax.default_backend() != "tpu" or pos_t.shape[1] % 512 != 0:
        return False
    n = pose.shape[0]
    cp = prev_t.shape[1] if prev_t is not None else 0
    out_co = (final_linear or layers[-1])["w"].shape[1]
    # The L1-style shape (wide hidden, wide output block x batch) OOMs VMEM;
    # keep the kernel to narrow-output levels and small batches.
    return n * (cp + out_co) <= 1024


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------


def _make_bwd_kernel(specs, num_sine, omega, has_prev, cp, pose_dim, n, tile, compute_dtype):
    """Recompute-then-reverse: forward pre-activations live in VMEM for the
    tile, the reverse chain accumulates dW/db across grid steps and batch."""

    def kernel(*refs):
        idx = 0
        poset_ref = refs[idx]; idx += 1  # (pose_dim, N)
        pos_ref = refs[idx]; idx += 1  # (1, 2, tile)
        prev_ref = None
        if has_prev:
            prev_ref = refs[idx]; idx += 1  # (n, Cp, tile)
        wref = refs[idx]; idx += 1  # (rows, maxCi)
        bref = refs[idx]; idx += 1  # (rows, 128)
        gout_ref = refs[idx]; idx += 1  # (n, Co_last, tile)
        dprev_ref = None
        if has_prev:
            dprev_ref = refs[idx]; idx += 1
        dw_ref = refs[idx]; idx += 1  # (rows, maxCi) f32
        db_ref = refs[idx]; idx += 1  # (rows, 128) f32
        dpose_ref = refs[idx]  # (pose_dim, N) f32

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)
            dpose_ref[:] = jnp.zeros_like(dpose_ref)

        pos = pos_ref[0].astype(compute_dtype)  # (2, tile)
        dn_t = (((1,), (1,)), ((), ()))  # contract the pixel dim of both
        dn_rows = (((0,), (0,)), ((), ()))  # contract the Co dim of both

        for bi in range(n):
            pose_col = poset_ref[:, bi : bi + 1]
            pose_b = jnp.broadcast_to(pose_col, (pose_dim, tile)).astype(compute_dtype)
            parts = []
            if prev_ref is not None:
                parts.append(prev_ref[bi])
            parts.extend([pos, pose_b])
            h = jnp.concatenate(parts, axis=0)

            # Forward recompute, stashing layer inputs + pre-activations.
            hs = [h]
            pre_acts = []
            for li, spec in enumerate(specs):
                w = wref[pl.ds(spec.row_off, _align8(spec.co)), : spec.ci]
                b = bref[pl.ds(spec.row_off, _align8(spec.co)), :1]
                a = jax.lax.dot_general(
                    w.astype(compute_dtype), hs[-1][: spec.ci].astype(compute_dtype),
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    precision=kernel_dot_precision(compute_dtype),
                ) + b
                if li < num_sine:
                    pre_acts.append(a)
                    hs.append(_fast_sin(omega * a).astype(compute_dtype))
                else:
                    pre_acts.append(None)
                    hs.append(a)

            # Reverse chain.
            g = gout_ref[bi].astype(jnp.float32)  # (co_last_pad?, tile) logical co
            for li in reversed(range(len(specs))):
                spec = specs[li]
                co_pad = _align8(spec.co)
                if li < num_sine:
                    a = pre_acts[li]
                    # Deliberate approximation: the forward computes the
                    # degree-11 sine POLYNOMIAL, whose exact derivative is the
                    # polynomial's own derivative, but we use _fast_cos (the
                    # same polynomial shifted by pi/2) instead.  The two agree
                    # to ~1e-6 relative — well inside the 1e-4 gradient-parity
                    # test floor, which must NOT be tightened past it — and
                    # saves materializing a second polynomial.
                    g_a = g[: spec.co] * (omega * _fast_cos(omega * a[: spec.co]))
                else:
                    g_a = g[: spec.co]
                h_in = hs[li][: spec.ci].astype(compute_dtype)
                # dW[co, ci] += sum_t g_a[co, t] * h_in[ci, t]
                dw = jax.lax.dot_general(
                    g_a.astype(compute_dtype), h_in, dn_t, preferred_element_type=jnp.float32,
                    precision=kernel_dot_precision(compute_dtype),
                )
                dw_ref[pl.ds(spec.row_off, co_pad), : spec.ci] += jnp.pad(
                    dw, ((0, co_pad - spec.co), (0, 0))
                )
                db_ref[pl.ds(spec.row_off, co_pad), :1] += jnp.pad(
                    jnp.sum(g_a, axis=1, keepdims=True), ((0, co_pad - spec.co), (0, 0))
                )
                # g_in[ci, t] = sum_co W[co, ci] * g_a[co, t]
                w = wref[pl.ds(spec.row_off, co_pad), : spec.ci]
                g = jax.lax.dot_general(
                    w[: spec.co].astype(compute_dtype), g_a.astype(compute_dtype),
                    dn_rows, preferred_element_type=jnp.float32,
                    precision=kernel_dot_precision(compute_dtype),
                )

            off = 0
            if dprev_ref is not None:
                dprev_ref[bi] = g[:cp].astype(dprev_ref.dtype)
                off = cp
            # position-grid gradient discarded (constant identity grid)
            dpose_ref[:, bi : bi + 1] += jnp.sum(
                g[off + 2 : off + 2 + pose_dim], axis=1, keepdims=True
            )

    return kernel


def _bwd_tile(hw: int, n: int, cp: int, specs, compute_dtype) -> int:
    """Pixel-tile size for the backward kernel under the scoped-VMEM budget.

    The batch loop in the kernel is a Python unroll, and Mosaic keeps every
    iteration's recompute stash (f32 pre-activations + compute-dtype layer
    inputs) live on the stack simultaneously — measured ~n * 6 bytes *
    sum(co_pad) per pixel on v5e (round-2 OOM: 17.71 MB at n=8, tile=512,
    sum(co_pad)=904).  Budget tiles so that estimate stays under
    _BWD_SCOPED_BUDGET, well below the raised _BWD_VMEM_LIMIT."""
    num_acts = sum(_align8(s.co) for s in specs)
    cmax = max([s.ci for s in specs] + [128])
    esz = 2 if compute_dtype == jnp.bfloat16 else 4
    per_px = n * (4 + esz) * num_acts + esz * n * (cp + cmax) + 8 * cmax
    budget_px = max(256, _BWD_SCOPED_BUDGET // max(per_px, 1))
    tile = 256
    while tile * 2 <= min(budget_px, hw) and hw % (tile * 2) == 0:
        tile *= 2
    return tile if hw % tile == 0 else 0


def fused_sine_chain_t_bwd(prev, pos_t, pose, layers, final_linear, omega, g):
    """Pallas backward: returns (dprev, dpose, dlayers, dfinal)."""
    n = pose.shape[0]
    hw = pos_t.shape[1]
    pose_dim = pose.shape[1]
    compute_dtype = pos_t.dtype
    cp = prev.shape[1] if prev is not None else 0
    wbuf, bbuf, specs = pack_weights_t(layers, final_linear, compute_dtype)
    num_sine = len(layers)
    tile = _bwd_tile(hw, n, cp, specs, compute_dtype)
    assert tile and hw % tile == 0

    kernel = _make_bwd_kernel(
        specs, num_sine, omega, prev is not None, cp, pose_dim, n, tile, compute_dtype
    )

    in_specs = [
        pl.BlockSpec((pose_dim, n), lambda i: (0, 0)),
        pl.BlockSpec((1, 2, tile), lambda i: (0, 0, i)),
    ]
    args = [pose.astype(jnp.float32).T, pos_t.reshape(1, 2, hw)]
    if prev is not None:
        in_specs.append(pl.BlockSpec((n, cp, tile), lambda i: (0, 0, i)))
        args.append(prev)
    in_specs.append(pl.BlockSpec(wbuf.shape, lambda i: (0, 0)))
    in_specs.append(pl.BlockSpec(bbuf.shape, lambda i: (0, 0)))
    co_last = specs[-1].co
    g3 = g.reshape(n, co_last, hw)
    in_specs.append(pl.BlockSpec((n, co_last, tile), lambda i: (0, 0, i)))
    args.extend([wbuf, bbuf, g3])

    out_specs = []
    out_shape = []
    if prev is not None:
        out_specs.append(pl.BlockSpec((n, cp, tile), lambda i: (0, 0, i)))
        out_shape.append(jax.ShapeDtypeStruct((n, cp, hw), prev.dtype))
    out_specs.append(pl.BlockSpec(wbuf.shape, lambda i: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct(wbuf.shape, jnp.float32))
    out_specs.append(pl.BlockSpec(bbuf.shape, lambda i: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct(bbuf.shape, jnp.float32))
    out_specs.append(pl.BlockSpec((pose_dim, n), lambda i: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((pose_dim, n), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(hw // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # dw/db/dpose accumulate across grid steps -> sequential grid.
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
    )(*args)

    idx = 0
    dprev = None
    if prev is not None:
        dprev = outs[idx]; idx += 1
    dwbuf = outs[idx]; idx += 1
    dbbuf = outs[idx]; idx += 1
    dposeT = outs[idx]

    mats = list(layers) + ([final_linear] if final_linear is not None else [])
    dmats = []
    for m, spec in zip(mats, specs):
        dw = dwbuf[spec.row_off : spec.row_off + spec.co, : spec.ci].T.astype(m["w"].dtype)
        db = dbbuf[spec.row_off : spec.row_off + spec.co, 0].astype(m["b"].dtype)
        dmats.append({"w": dw, "b": db})
    dlayers = dmats[: len(layers)]
    dfinal = dmats[len(layers)] if final_linear is not None else None
    dpose = dposeT.T.astype(pose.dtype)
    return dprev, dpose, dlayers, dfinal


def _fused_bwd_ok(prev_t, pos_t, pose, layers, final_linear) -> bool:
    if jax.default_backend() != "tpu":
        return False
    cp = prev_t.shape[1] if prev_t is not None else 0
    _, _, specs = pack_weights_t(layers, final_linear, pos_t.dtype)
    return _bwd_tile(pos_t.shape[1], pose.shape[0], cp, specs, pos_t.dtype) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sine_chain_t(prev_t, pos_t, pose, layers, final_linear, omega=30.0):
    """Differentiable fused sine chain, channels-first (N, C, HW)."""
    if _fused_ok(prev_t, pos_t, pose, layers, final_linear):
        return fused_sine_chain_t(prev_t, pos_t, pose, layers, final_linear, omega)
    return _jnp_chain_t(prev_t, pos_t, pose, layers, final_linear, omega)


def _sine_chain_t_fwd(prev_t, pos_t, pose, layers, final_linear, omega):
    out = sine_chain_t(prev_t, pos_t, pose, layers, final_linear, omega)
    return out, (prev_t, pos_t, pose, layers, final_linear)


def _sine_chain_t_bwd(omega, residual, g):
    prev_t, pos_t, pose, layers, final_linear = residual
    if _fused_bwd_ok(prev_t, pos_t, pose, layers, final_linear):
        dprev, dpose, dlayers, dfinal = fused_sine_chain_t_bwd(
            prev_t, pos_t, pose, layers, final_linear, omega, g
        )
        if prev_t is None:
            dprev = None
        return dprev, jnp.zeros_like(pos_t), dpose, dlayers, dfinal
    _, vjp = jax.vjp(
        lambda pr, po, la, fl: _jnp_chain_t(pr, pos_t, po, la, fl, omega), prev_t, pose, layers, final_linear
    )
    dprev, dpose, dlayers, dfinal = vjp(g)
    return dprev, jnp.zeros_like(pos_t), dpose, dlayers, dfinal


sine_chain_t.defvjp(_sine_chain_t_fwd, _sine_chain_t_bwd)
