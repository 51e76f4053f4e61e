"""Lane-packed conv3x3: full-lane NHWC execution for narrow-channel levels.

The teacher U-Nets' wide levels (512^2 x 32ch, 256^2 x 64ch — reference
mode_07.py:241-262 / :210-231) run with C on the TPU lane dimension; C < 128
means every tensor is physically padded to 128 lanes, so all bandwidth and
VPU work pays 128/C overhead (measured ~4x at C=32: an in-context ResBlock
costs ~7.8 ms vs ~2 ms of useful work).

The fix is a ZERO-COST relayout: NHWC row-major means
``(N, H, W, C) -> (N, H, W/f, f*C)`` is a pure reshape (contiguous
reinterpret).  Packed channel p = dxp*C + c holds original channel c of
sub-position dxp.  A stride-1 3x3 conv on the original tensor is EXACTLY a
stride-1 3x3 conv on the packed tensor with a block-structured kernel
(``pack_conv3_weights``): output packed channel (dxp', co) at packed column
xq reads original column x_in = f*(xq + kxq - 1) + dxp, i.e. original tap
dx = f*(kxq - 1) + dxp - dxp' + 1 when that lands in [0, 2].

FLOPs grow by f (the packed kernel is mostly zeros) but MXU utilization
grows by 128/C >= f, and every elementwise/norm op between convs runs on
full lanes — measured net win ~3-4x per ResBlock at 512^2 x 32.

Requires f >= 2 (so the packed kernel width stays 3) and W % f == 0.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def pack_factor(cin: int, cout: int, w: int) -> int:
    """Largest useful f: fills lanes for the narrower side, keeps W
    divisible; 1 means packing is pointless (channels already wide)."""
    cmin = min(cin, cout)
    if cmin >= 128:
        return 1
    f = 1
    while cmin * f < 128 and w % (f * 2) == 0 and f < 8:
        f *= 2
    return f if f >= 2 else 1


def pack_conv3_weights(w_hwio: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (3, 3, f*Ci, f*Co) packed kernel (see module doc)."""
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((3, 3, f * ci, f * co), w_hwio.dtype)
    for kxq in range(3):
        for dxp in range(f):
            for dxpp in range(f):
                dx = f * (kxq - 1) + dxp - dxpp + 1
                if 0 <= dx <= 2:
                    out = out.at[
                        :, kxq, dxp * ci : (dxp + 1) * ci, dxpp * co : (dxpp + 1) * co
                    ].set(w_hwio[:, dx])
    return out


def pack_conv1_weights(w_1x1: jnp.ndarray, f: int) -> jnp.ndarray:
    """(Ci, Co) 1x1 kernel -> (1, 1, f*Ci, f*Co) block-diagonal over dxp."""
    ci, co = w_1x1.shape
    out = jnp.zeros((1, 1, f * ci, f * co), w_1x1.dtype)
    for dxp in range(f):
        out = out.at[0, 0, dxp * ci : (dxp + 1) * ci, dxp * co : (dxp + 1) * co].set(w_1x1)
    return out


def pack_nhwc(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W/f, f*C); free (contiguous reinterpret)."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // f, f * c)


def unpack_nhwc(x: jnp.ndarray, f: int) -> jnp.ndarray:
    n, h, wq, fc = x.shape
    return x.reshape(n, h, wq * f, fc // f)


def tile_channel_vector(v: jnp.ndarray, f: int) -> jnp.ndarray:
    """Per-original-channel vector (..., C) -> per-packed-channel (..., f*C)
    (packed channel dxp*C + c carries original channel c)."""
    return jnp.concatenate([v] * f, axis=-1)


def repack(xp: jnp.ndarray, f_from: int, f_to: int) -> jnp.ndarray:
    """Change pack factor; free (two contiguous reinterprets)."""
    n, h, wq, fc = xp.shape
    c = fc // f_from
    w = wq * f_from
    return xp.reshape(n, h, w, c).reshape(n, h, w // f_to, f_to * c)


def avg_pool_2x_packed(xp: jnp.ndarray, f: int) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2) of the UNPACKED tensor computed in
    packed space: row pairs + adjacent dxp channel-group pairs (original
    columns f*Xq+2k and f*Xq+2k+1 live in neighbouring groups), giving a
    packed tensor of factor f/2 at width W/2 — all work on full lanes."""
    assert f % 2 == 0 and f >= 2
    n, h, wq, fc = xp.shape
    c = fc // f
    x = xp.reshape(n, h // 2, 2, wq, f // 2, 2, c)
    return x.mean(axis=(2, 5)).reshape(n, h // 2, wq, (f // 2) * c)


def upsample_nearest_2x_packed(xp: jnp.ndarray, f: int) -> jnp.ndarray:
    """Nearest 2x upsample (src = floor(dst/2)) in packed space: repeat rows
    and duplicate each dxp channel group (output groups 2*dxp and 2*dxp+1
    both read input group dxp) -> packed factor 2f at width 2W."""
    n, h, wq, fc = xp.shape
    c = fc // f
    x = jnp.repeat(xp, 2, axis=1)
    x = jnp.broadcast_to(x.reshape(n, 2 * h, wq, f, 1, c), (n, 2 * h, wq, f, 2, c))
    return x.reshape(n, 2 * h, wq, 2 * f * c)


# ---------------------------------------------------------------------------
# Multi-part packed tensors
# ---------------------------------------------------------------------------
#
# An up-path skip concat concat([h, skip], axis=-1) in UNPACKED space would
# force both tensors through a relayout.  Instead we lane-concatenate the two
# packed tensors directly: concat([pack(h, f), pack(skip, f)], -1).  That is
# NOT pack(concat(h, skip), f) — the channel groups are part-major — but
# convolution is linear in input channels, so a conv over the part-major
# layout is exactly the per-part packed kernels concatenated along the packed
# input-channel axis, and per-channel affines/stats decompose per part.


def pack_conv3_weights_parts(w_hwio: jnp.ndarray, f: int, splits) -> jnp.ndarray:
    """(3, 3, sum(splits), Co) kernel -> packed kernel for a PART-MAJOR
    packed input (lane-concat of per-part packs, all at factor ``f``)."""
    parts = []
    start = 0
    for c in splits:
        parts.append(pack_conv3_weights(w_hwio[:, :, start : start + c], f))
        start += c
    return jnp.concatenate(parts, axis=2)


def pack_conv1_weights_parts(w_1x1: jnp.ndarray, f: int, splits) -> jnp.ndarray:
    """(sum(splits), Co) 1x1 kernel -> packed kernel for a part-major input."""
    parts = []
    start = 0
    for c in splits:
        parts.append(pack_conv1_weights(w_1x1[start : start + c], f))
        start += c
    return jnp.concatenate(parts, axis=2)


def tile_channel_vector_parts(v: jnp.ndarray, f: int, splits) -> jnp.ndarray:
    """Per-original-channel vector (..., sum(splits)) -> per-packed-channel
    vector matching a part-major packed layout."""
    outs = []
    start = 0
    for c in splits:
        outs.append(tile_channel_vector(v[..., start : start + c], f))
        start += c
    return jnp.concatenate(outs, axis=-1)


def packed_channel_stats_parts(xp: jnp.ndarray, f: int, splits):
    """Per-original-channel (m1, m2) of a part-major packed tensor, in
    original (concatenated) channel order; each (N, sum(splits)) f32."""
    m1s, m2s = [], []
    start = 0
    for c in splits:
        m1, m2 = packed_channel_stats(xp[..., start * f : (start + c) * f], f)
        m1s.append(m1)
        m2s.append(m2)
        start += c
    return jnp.concatenate(m1s, axis=-1), jnp.concatenate(m2s, axis=-1)


def packed_channel_stats(xp: jnp.ndarray, f: int):
    """Per-ORIGINAL-channel mean / mean-of-squares over (H, Wq, dxp) of a
    packed tensor: exact spatial statistics of the unpacked tensor.
    Returns (m1, m2), each (N, C) f32.

    The casts are kept INSIDE each reduction expression (no shared f32
    temporary): XLA then fuses cast+square into the reduce loops instead of
    materializing a float32 copy of the whole activation — measured ~1 ms per
    stats call at 512^2 x 64 B8 from that copy alone."""
    n = xp.shape[0]
    fc = xp.shape[-1]
    c = fc // f
    m1 = jnp.mean(xp.astype(jnp.float32), axis=(1, 2)).reshape(n, f, c).mean(axis=1)
    m2 = jnp.mean(jnp.square(xp.astype(jnp.float32)), axis=(1, 2)).reshape(n, f, c).mean(axis=1)
    return m1, m2
