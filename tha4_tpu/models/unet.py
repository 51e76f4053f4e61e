"""ADM-style conditional U-Net (teacher body morpher / upscaler trunk).

Reference: src/tha4/nn/common/unet.py:100-658.  Key semantics preserved:
  * ResBlock with FiLM scale-shift conditioning applied twice — once with the
    (vestigial, t=0) time embedding, once with the pose embedding
    (reference :90-97, :158-166); conv1 zero-init.
  * Resampling *inside* ResBlocks (resample_with_res_block=True): nearest-2x
    up / avgpool-2x down on both the residual and skip paths (reference
    :33-62, :120-129).
  * Spatial self-attention with ``use_new_attention_order=True`` qkv layout
    (reference :192-202), zero-init output projection, over <=32x32 tokens at
    the deepest level only.
  * Down path stores every block output as a skip; each up level consumes
    num_res_blocks_per_level+1 skips in pop (LIFO) order (reference :584-607).

TPU notes: attention tokens are flattened NHWC -> (N, L, C) and run as
batched GEMMs on the MXU; GroupNorm stats in f32; all convs NHWC/HWIO.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops.resize import downsample_avg_2x, upsample_nearest_2x


@dataclass(frozen=True)
class AttentionConfig:
    num_heads: Optional[int] = 1
    num_head_channels: Optional[int] = None
    use_new_attention_order: bool = False

    def heads_for(self, channels: int) -> int:
        if self.num_head_channels is None:
            assert channels % self.num_heads == 0
            return self.num_heads
        assert channels % self.num_head_channels == 0
        return channels // self.num_head_channels


@dataclass(frozen=True)
class UnetConfig:
    in_channels: int = 3
    out_channels: int = 3
    model_channels: int = 64
    level_channel_multipliers: Tuple[int, ...] = (1, 2, 4, 8)
    level_use_attention: Tuple[bool, ...] = (False, False, False, False)
    num_res_blocks_per_level: int = 2
    num_middle_res_blocks: int = 2
    time_embedding_channels: Optional[int] = None
    cond_input_channels: int = 4
    cond_internal_channels: int = 512
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    dropout_prob: float = 0.1
    condition_bias: float = 1.0

    @property
    def num_levels(self) -> int:
        return len(self.level_channel_multipliers)

    @property
    def t_emb_channels(self) -> int:
        return self.time_embedding_channels or self.model_channels


# ---------------------------------------------------------------------------
# Sub-modules
# ---------------------------------------------------------------------------


def compute_timestep_embedding(t: jnp.ndarray, out_channels: int) -> jnp.ndarray:
    """Sinusoidal embedding; [cos || sin] order (reference unet.py:365-376)."""
    half = out_channels // 2
    scale = -math.log(10000.0) / (half - 1)
    log_times = scale * jnp.arange(0, half, dtype=t.dtype)
    times = jnp.exp(log_times)[None, :] * t  # (N, half); t is (N, 1)
    emb = jnp.concatenate([jnp.cos(times), jnp.sin(times)], axis=1)
    if out_channels % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (1, 1)))
    return emb


def _init_resblock(
    key, cin: int, cout: int, cond_channels: int, use_cond1: bool, dtype=jnp.float32
) -> Dict:
    k = jax.random.split(key, 5)
    p: Dict = {
        "norm0": tnn.init_norm_affine(cin, dtype),
        "conv0": tnn.init_conv(k[0], 3, 3, cin, cout, bias=True, method="none", dtype=dtype),
        "cond0": tnn.init_linear(k[1], cond_channels, 2 * cout, dtype=dtype),
        "norm1": tnn.init_norm_affine(cout, dtype),
        "conv1": tnn.init_conv(k[2], 3, 3, cout, cout, bias=True, method="zero", dtype=dtype),
    }
    # torch zero-inits both weight and bias of conv1 (reference unet.py:26-30)
    p["conv1"]["b"] = jnp.zeros_like(p["conv1"]["b"])
    if use_cond1:
        p["cond1"] = tnn.init_linear(k[3], cond_channels, 2 * cout, dtype=dtype)
    if cin != cout:
        p["skip"] = tnn.init_conv(k[4], 1, 1, cin, cout, bias=True, method="none", dtype=dtype)
    return p


def _apply_scaleshift(x: jnp.ndarray, scaleshift: jnp.ndarray, condition_bias: float) -> jnp.ndarray:
    """x (N,H,W,C), scaleshift (N,2C): x*(bias+scale)+shift (reference :90-97)."""
    scale, shift = jnp.split(scaleshift[:, None, None, :], 2, axis=-1)
    return x * (condition_bias + scale.astype(x.dtype)) + shift.astype(x.dtype)


def _fuse_resblock_ok(x: jnp.ndarray, cout: int, sampling: str = "same") -> bool:
    """Route narrow-channel levels (512^2 x 32, 256^2 x 64, ...) through the
    lane-packed formulation: with C < 128 on the lane dim every NHWC tensor
    is physically padded to 128 lanes, making the plain path ~128/C x
    bandwidth-bound (measured ~4x at C=32; see ops/packed_conv.py).  The
    down/up variants resample IN packed space (channel-group pair averaging /
    duplication), so the whole block stays on full lanes — the plain
    resampling blocks were the teacher's hot spots (6.7 / 9.9 ms vs 2.3 for
    the packed same-block at 512^2 x 32, measured B8 bf16 v5e)."""
    import os

    if os.environ.get("THA4_PACKED_RESBLOCK", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    from tha4_tpu.ops import packed_conv

    n, h, w, c = x.shape
    if sampling == "same":
        return packed_conv.pack_factor(c, cout, w) >= 2
    if sampling == "down":
        return h % 2 == 0 and packed_conv.pack_factor(c, c, w) >= 2
    return packed_conv.pack_factor(c, cout, 2 * w) >= 2  # up


def _fold_affine(m1, m2, num_groups, norm_params, films, condition_bias, eps=1e-5):
    """(scale, shift) per (N, C) implementing GN(+affine) then a chain of
    FiLM scale-shifts (reference unet.py:90-97), from per-channel spatial
    moments m1/m2 (N, C) f32."""
    n, c = m1.shape
    g = num_groups
    gm = m1.reshape(n, g, c // g).mean(axis=2)
    gm2 = m2.reshape(n, g, c // g).mean(axis=2)
    r = jax.lax.rsqrt(gm2 - gm * gm + eps)
    mean_c = jnp.repeat(gm, c // g, axis=1)
    r_c = jnp.repeat(r, c // g, axis=1)
    a = jnp.broadcast_to(norm_params["scale"][None].astype(jnp.float32), (n, c))
    b = jnp.broadcast_to(norm_params["bias"][None].astype(jnp.float32), (n, c))
    for f_scale, f_shift in films:
        m = condition_bias + f_scale.astype(jnp.float32)
        a = a * m
        b = b * m + f_shift.astype(jnp.float32)
    scale = a * r_c
    shift = b - mean_c * scale
    return scale, shift


def _fused_resblock(
    params: Dict,
    x: jnp.ndarray,
    cond0: jnp.ndarray,
    cond1: Optional[jnp.ndarray],
    condition_bias: float,
    sampling: str = "same",
) -> jnp.ndarray:
    """Lane-packed path: the whole block runs on (N, H, W/f, f*C) tensors
    (a free reinterpret of NHWC memory) with packed conv kernels, so every
    op uses full 128-wide lanes; GN/FiLM fold into per-channel affines.
    Down/up resampling happens in packed space (see
    packed_conv.avg_pool_2x_packed / upsample_nearest_2x_packed), then a free
    repack matches the conv-resolution pack factor."""
    from tha4_tpu.ops import packed_conv as PC

    n, hh, ww, cin = x.shape
    cout = params["conv0"]["w"].shape[3]
    dt = x.dtype
    if sampling == "same":
        f0 = f1 = PC.pack_factor(cin, cout, ww)
    elif sampling == "down":
        f0 = PC.pack_factor(cin, cin, ww)
        f1 = PC.pack_factor(cin, cout, ww // 2)
    else:  # up
        f0 = PC.pack_factor(cin, cin, ww)
        f1 = PC.pack_factor(cin, cout, ww * 2)

    xp = PC.pack_nhwc(x, f0)
    m1, m2 = PC.packed_channel_stats(xp, f0)
    s0, b0 = _fold_affine(m1, m2, min(32, cin), params["norm0"], (), condition_bias)
    act = jax.nn.silu(
        xp * PC.tile_channel_vector(s0, f0).astype(dt)[:, None, None, :]
        + PC.tile_channel_vector(b0, f0).astype(dt)[:, None, None, :]
    )
    if sampling == "down":
        act = PC.repack(PC.avg_pool_2x_packed(act, f0), f0 // 2, f1)
        xs = PC.repack(PC.avg_pool_2x_packed(xp, f0), f0 // 2, f1)
    elif sampling == "up":
        act = PC.repack(PC.upsample_nearest_2x_packed(act, f0), 2 * f0, f1)
        xs = PC.repack(PC.upsample_nearest_2x_packed(xp, f0), 2 * f0, f1)
    else:
        xs = xp
    h1 = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights(params["conv0"]["w"], f1),
            "b": PC.tile_channel_vector(params["conv0"]["b"], f1),
        },
        act,
    )

    films = [tuple(jnp.split(tnn.linear(params["cond0"], jax.nn.silu(cond0)), 2, axis=-1))]
    if "cond1" in params and cond1 is not None:
        films.append(tuple(jnp.split(tnn.linear(params["cond1"], jax.nn.silu(cond1)), 2, axis=-1)))
    m1, m2 = PC.packed_channel_stats(h1, f1)
    s1, b1 = _fold_affine(m1, m2, min(32, cout), params["norm1"], films, condition_bias)
    act1 = jax.nn.silu(
        h1 * PC.tile_channel_vector(s1, f1).astype(dt)[:, None, None, :]
        + PC.tile_channel_vector(b1, f1).astype(dt)[:, None, None, :]
    )
    out = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights(params["conv1"]["w"], f1),
            "b": PC.tile_channel_vector(params["conv1"]["b"], f1),
        },
        act1,
    )

    if "skip" in params:
        skip = tnn.conv2d(
            {
                "w": PC.pack_conv1_weights(params["skip"]["w"].reshape(cin, cout), f1),
                "b": PC.tile_channel_vector(params["skip"]["b"], f1),
            },
            xs,
            padding=0,
        )
    else:
        skip = xs
    return PC.unpack_nhwc(skip + out, f1)


def _fused_resblock_packed(
    params: Dict,
    xp: jnp.ndarray,
    f: int,
    splits: Tuple[int, ...],
    cond0: jnp.ndarray,
    cond1: Optional[jnp.ndarray],
    condition_bias: float,
    sampling: str = "same",
) -> Tuple[jnp.ndarray, int]:
    """ResBlock over an ALREADY-packed input, staying packed end-to-end.

    ``xp`` is (N, H, W/f, f*sum(splits)); ``splits`` is the part-major
    channel decomposition (len > 1 after an up-path lane-concat of h and a
    skip — see the multi-part notes in ops/packed_conv.py).  Multi-part
    inputs cannot be repacked for free, so the convs then run at the given
    ``f``; single-part inputs repack freely to the best conv factor.
    Returns (packed output, output factor) — single part, never unpacked.
    """
    from tha4_tpu.ops import packed_conv as PC

    n, hh, wq, fc = xp.shape
    cin = sum(splits)
    assert fc == f * cin
    ww = wq * f
    cout = params["conv0"]["w"].shape[3]
    dt = xp.dtype
    multipart = len(splits) > 1
    assert not (multipart and sampling != "same")

    if multipart:
        f0 = f1 = f
    elif sampling == "same":
        f0 = f1 = PC.pack_factor(cin, cout, ww)
    elif sampling == "down":
        f0 = PC.pack_factor(cin, cin, ww)
        f1 = PC.pack_factor(cin, cout, ww // 2)
    else:  # up
        f0 = PC.pack_factor(cin, cin, ww)
        f1 = PC.pack_factor(cin, cout, ww * 2)

    if not multipart and f0 != f:
        xp = PC.repack(xp, f, f0)

    m1, m2 = PC.packed_channel_stats_parts(xp, f0, splits)
    s0, b0 = _fold_affine(m1, m2, min(32, cin), params["norm0"], (), condition_bias)
    act = jax.nn.silu(
        xp * PC.tile_channel_vector_parts(s0, f0, splits).astype(dt)[:, None, None, :]
        + PC.tile_channel_vector_parts(b0, f0, splits).astype(dt)[:, None, None, :]
    )
    if sampling == "down":
        act = PC.repack(PC.avg_pool_2x_packed(act, f0), f0 // 2, f1)
        xs = PC.repack(PC.avg_pool_2x_packed(xp, f0), f0 // 2, f1)
    elif sampling == "up":
        act = PC.repack(PC.upsample_nearest_2x_packed(act, f0), 2 * f0, f1)
        xs = PC.repack(PC.upsample_nearest_2x_packed(xp, f0), 2 * f0, f1)
    else:
        xs = xp
    h1 = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights_parts(params["conv0"]["w"], f1, splits),
            "b": PC.tile_channel_vector(params["conv0"]["b"], f1),
        },
        act,
    )

    films = [tuple(jnp.split(tnn.linear(params["cond0"], jax.nn.silu(cond0)), 2, axis=-1))]
    if "cond1" in params and cond1 is not None:
        films.append(tuple(jnp.split(tnn.linear(params["cond1"], jax.nn.silu(cond1)), 2, axis=-1)))
    m1, m2 = PC.packed_channel_stats(h1, f1)
    s1, b1 = _fold_affine(m1, m2, min(32, cout), params["norm1"], films, condition_bias)
    act1 = jax.nn.silu(
        h1 * PC.tile_channel_vector(s1, f1).astype(dt)[:, None, None, :]
        + PC.tile_channel_vector(b1, f1).astype(dt)[:, None, None, :]
    )
    out = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights(params["conv1"]["w"], f1),
            "b": PC.tile_channel_vector(params["conv1"]["b"], f1),
        },
        act1,
    )

    if "skip" in params:
        skip = tnn.conv2d(
            {
                "w": PC.pack_conv1_weights_parts(params["skip"]["w"].reshape(cin, cout), f1, splits),
                "b": PC.tile_channel_vector(params["skip"]["b"], f1),
            },
            xs,
            padding=0,
        )
    else:
        # identity residual requires a single part (part-major lane layout
        # would not line up with the plain-packed conv output); U-Net up
        # blocks always have cin > cout, so multipart implies a skip conv.
        assert not multipart
        skip = xs
    return skip + out, f1


def _resblock(
    params: Dict,
    x: jnp.ndarray,
    cond0: Optional[jnp.ndarray],
    cond1: Optional[jnp.ndarray],
    sampling: str = "same",  # same|up|down
    condition_bias: float = 1.0,
) -> jnp.ndarray:
    """Reference ResBlock.forward (unet.py:154-166)."""
    if cond0 is not None and _fuse_resblock_ok(x, params["conv0"]["w"].shape[3], sampling):
        return _fused_resblock(params, x, cond0, cond1, condition_bias, sampling)
    resample = {"same": lambda a: a, "up": upsample_nearest_2x, "down": downsample_avg_2x}[sampling]
    h = jax.nn.silu(tnn.group_norm(params["norm0"], x, num_groups=min(32, x.shape[-1])))
    h = tnn.conv2d(params["conv0"], resample(h))
    if cond0 is not None:
        h = tnn.group_norm(params["norm1"], h, num_groups=min(32, h.shape[-1]))
        h = _apply_scaleshift(h, tnn.linear(params["cond0"], jax.nn.silu(cond0)), condition_bias)
        if "cond1" in params and cond1 is not None:
            h = _apply_scaleshift(h, tnn.linear(params["cond1"], jax.nn.silu(cond1)), condition_bias)
        h = tnn.conv2d(params["conv1"], jax.nn.silu(h))
    skip = resample(x)
    if "skip" in params:
        skip = tnn.conv2d(params["skip"], skip)
    return skip + h


def _init_attention(key, channels: int, dtype=jnp.float32) -> Dict:
    k0, k1 = jax.random.split(key)
    p = {
        "norm": tnn.init_norm_affine(channels, dtype),
        "qkv": tnn.init_conv(k0, 1, 1, channels, 3 * channels, bias=True, method="none", dtype=dtype),
        "proj": tnn.init_conv(k1, 1, 1, channels, channels, bias=True, method="zero", dtype=dtype),
    }
    p["proj"]["b"] = jnp.zeros_like(p["proj"]["b"])
    return p


def _attention(params: Dict, x: jnp.ndarray, attn_cfg: AttentionConfig) -> jnp.ndarray:
    """Spatial self-attention (reference AttentionBlock.forward unet.py:230-239)."""
    n, hh, ww, c = x.shape
    num_heads = attn_cfg.heads_for(c)
    ch = c // num_heads
    qkv = tnn.conv2d(params["qkv"], tnn.group_norm(params["norm"], x, num_groups=min(32, c)))
    qkv = qkv.reshape(n, hh * ww, 3 * c)

    if attn_cfg.use_new_attention_order:
        # chunk into q,k,v along channels, then split heads (reference :192-202)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (N, L, C)
        q = q.reshape(n, -1, num_heads, ch)
        k = k.reshape(n, -1, num_heads, ch)
        v = v.reshape(n, -1, num_heads, ch)
    else:
        # legacy: per-head (q,k,v) interleaved: layout (heads, 3, ch) (:178-189)
        qkv = qkv.reshape(n, -1, num_heads, 3, ch)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]

    scale = 1.0 / math.sqrt(math.sqrt(ch))
    weight = jnp.einsum("nthc,nshc->nhts", q * scale, k * scale)
    weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhts,nshc->nthc", weight, v).reshape(n, hh, ww, c)
    return x + tnn.conv2d(params["proj"], out)


# ---------------------------------------------------------------------------
# End-to-end packed flow
# ---------------------------------------------------------------------------


def _packed_flow_enabled() -> bool:
    """Keep activations lane-packed ACROSS blocks (not just inside each
    resblock): skips are stored packed, up-path concats are lane-concats of
    packed tensors (part-major, see ops/packed_conv.py), and pack/unpack
    reshapes — each of which forces an XLA relayout copy of a full
    activation against the conv layout — happen only at attention blocks
    and the final output.  THA4_PACKED_FLOW=0 disables (per-block fused
    path still applies), =force enables off-TPU (CPU parity tests)."""
    import os

    v = os.environ.get("THA4_PACKED_FLOW", "1")
    if v == "0":
        return False
    if v == "force":
        return True
    return jax.default_backend() == "tpu"


def _apply_packed_flow(
    cfg: UnetConfig,
    params: Dict,
    x: jnp.ndarray,
    t_emb: jnp.ndarray,
    cond_emb: jnp.ndarray,
    first_conv_addition: Optional[jnp.ndarray],
    probe: Optional[Dict] = None,
) -> jnp.ndarray:
    """The down/middle/up loops of ``apply`` with every tensor held packed;
    numerically identical to the plain path (same convs, same statistics).

    ``probe`` (tools/unet_glue_probe.py only): ``{"cut": K, "labels": []}``.
    Each block event appends its label; when ``len(labels) == cut`` the flow
    returns a scalar digest of the live activation instead of running on —
    prefix-ladder timings of these cuts localize in-context per-block cost
    (including the relayout/concat glue XLA schedules between blocks, which
    isolated-block timing cannot see).
    """
    from tha4_tpu.ops import packed_conv as PC

    cb = cfg.condition_bias
    width = x.shape[2]

    def _cut(label: str, h: jnp.ndarray) -> bool:
        if probe is None:
            return False
        probe["labels"].append(label)
        return probe.get("cut") == len(probe["labels"])

    def _digest(h: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(h.astype(jnp.float32))

    def flow_factor(c: int, w: int) -> int:
        return PC.pack_factor(c, c, w)

    c = cfg.model_channels
    f = flow_factor(c, width)
    h = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights(params["first_conv"]["w"], f),
            "b": PC.tile_channel_vector(params["first_conv"]["b"], f),
        },
        PC.pack_nhwc(x, f),
    )
    if first_conv_addition is not None:
        h = h + PC.pack_nhwc(first_conv_addition.astype(h.dtype), f)
    if _cut(f"first_conv {width}px c{c} f{f}", h):
        return _digest(h)

    def attend(attn_params, h, f, c, w):
        xq = PC.unpack_nhwc(h, f)
        xq = _attention(attn_params, xq, cfg.attention)
        fn = flow_factor(c, w)
        return PC.pack_nhwc(xq, fn), fn

    def resample(rb, h, f, c, w, sampling):
        """down/up resblock; falls back to the plain formulation when the
        level is too wide to pool/duplicate in packed space (f would be 1)."""
        if PC.pack_factor(c, c, w) >= 2:
            return _fused_resblock_packed(rb, h, f, (c,), t_emb, cond_emb, cb, sampling)
        xq = _resblock(rb, PC.unpack_nhwc(h, f), t_emb, cond_emb, sampling, cb)
        wn = w // 2 if sampling == "down" else w * 2
        fn = flow_factor(xq.shape[-1], wn)
        return PC.pack_nhwc(xq, fn), fn

    hs = [(h, f, c)]
    for i, blk in enumerate(params["down_blocks"]):
        for j, rb in enumerate(blk["res_blocks"]):
            h, f = _fused_resblock_packed(rb, h, f, (c,), t_emb, cond_emb, cb, "same")
            c = rb["conv0"]["w"].shape[3]
            if _cut(f"down{i} rb{j} {width}px c{c} f{f}", h):
                return _digest(h)
            if cfg.level_use_attention[i]:
                h, f = attend(blk["attention_blocks"][j], h, f, c, width)
                if _cut(f"down{i} attn{j} {width}px c{c} f{f}", h):
                    return _digest(h)
            hs.append((h, f, c))
        if "downsample" in blk:
            h, f = resample(blk["downsample"], h, f, c, width, "down")
            width //= 2
            if _cut(f"down{i} ds ->{width}px c{c} f{f}", h):
                return _digest(h)
            hs.append((h, f, c))

    for bi, blk in enumerate(params["middle_blocks"]):
        if "res" in blk:
            h, f = _fused_resblock_packed(blk["res"], h, f, (c,), t_emb, cond_emb, cb, "same")
            if _cut(f"mid{bi} res {width}px c{c} f{f}", h):
                return _digest(h)
        else:
            h, f = attend(blk["attn"], h, f, c, width)
            if _cut(f"mid{bi} attn {width}px c{c} f{f}", h):
                return _digest(h)

    for idx, blk in enumerate(params["up_blocks"]):
        i = cfg.num_levels - 1 - idx
        for j, rb in enumerate(blk["res_blocks"]):
            sk, fs, cs = hs.pop()
            ft = PC.pack_factor(c + cs, rb["conv0"]["w"].shape[3], width)
            hcat = jnp.concatenate(
                [h if f == ft else PC.repack(h, f, ft),
                 sk if fs == ft else PC.repack(sk, fs, ft)],
                axis=-1,
            )
            if _cut(f"up{idx} cat{j} {width}px c{c}+{cs} f{ft}", hcat):
                return _digest(hcat)
            h, f = _fused_resblock_packed(
                rb, hcat, ft, (c, cs), t_emb, cond_emb, cb, "same")
            c = rb["conv0"]["w"].shape[3]
            if _cut(f"up{idx} rb{j} {width}px c{c} f{f}", h):
                return _digest(h)
            if cfg.level_use_attention[i]:
                h, f = attend(blk["attention_blocks"][j], h, f, c, width)
                if _cut(f"up{idx} attn{j} {width}px c{c} f{f}", h):
                    return _digest(h)
        if "upsample" in blk:
            h, f = resample(blk["upsample"], h, f, c, width, "up")
            width *= 2
            if _cut(f"up{idx} us ->{width}px c{c} f{f}", h):
                return _digest(h)
    assert not hs

    m1, m2 = PC.packed_channel_stats(h, f)
    s, b = _fold_affine(m1, m2, min(32, c), params["last_norm"], (), 1.0)
    act = jax.nn.silu(
        h * PC.tile_channel_vector(s, f).astype(h.dtype)[:, None, None, :]
        + PC.tile_channel_vector(b, f).astype(h.dtype)[:, None, None, :]
    )
    out = tnn.conv2d(
        {
            "w": PC.pack_conv3_weights(params["last_conv"]["w"], f),
            "b": PC.tile_channel_vector(params["last_conv"]["b"], f),
        },
        act,
    )
    if _cut(f"last_conv {width}px f{f}", out):
        return _digest(out)
    return PC.unpack_nhwc(out, f)


# ---------------------------------------------------------------------------
# Full U-Net
# ---------------------------------------------------------------------------


def init(key, cfg: UnetConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 256))
    cond_ch = cfg.cond_internal_channels
    p: Dict = {
        "time_embed": [
            tnn.init_linear(next(keys), cfg.t_emb_channels, cond_ch, dtype=dtype),
            tnn.init_linear(next(keys), cond_ch, cond_ch, dtype=dtype),
        ],
        "cond_embed": [
            tnn.init_linear(next(keys), cfg.cond_input_channels, cond_ch, dtype=dtype),
            tnn.init_linear(next(keys), cond_ch, cond_ch, dtype=dtype),
        ],
        "first_conv": tnn.init_conv(next(keys), 3, 3, cfg.in_channels, cfg.model_channels, bias=True, method="none", dtype=dtype),
    }

    current = cfg.model_channels
    channels = [current]
    down = []
    for i in range(cfg.num_levels):
        out_ch = cfg.model_channels * cfg.level_channel_multipliers[i]
        blk: Dict = {"res_blocks": []}
        if cfg.level_use_attention[i]:
            blk["attention_blocks"] = []
        for j in range(cfg.num_res_blocks_per_level):
            cin = current if j == 0 else out_ch
            blk["res_blocks"].append(_init_resblock(next(keys), cin, out_ch, cond_ch, True, dtype))
            if cfg.level_use_attention[i]:
                blk["attention_blocks"].append(_init_attention(next(keys), out_ch, dtype))
            channels.append(out_ch)
        if i < cfg.num_levels - 1:
            blk["downsample"] = _init_resblock(next(keys), out_ch, out_ch, cond_ch, True, dtype)
            channels.append(out_ch)
        down.append(blk)
        current = out_ch
    p["down_blocks"] = down

    middle = []
    for _ in range(cfg.num_middle_res_blocks - 1):
        middle.append({"res": _init_resblock(next(keys), current, current, cond_ch, True, dtype)})
        middle.append({"attn": _init_attention(next(keys), current, dtype)})
    middle.append({"res": _init_resblock(next(keys), current, current, cond_ch, True, dtype)})
    p["middle_blocks"] = middle

    up = []
    for i in reversed(range(cfg.num_levels)):
        skip_channels = [channels.pop() for _ in range(cfg.num_res_blocks_per_level + 1)]
        out_ch = cfg.model_channels * cfg.level_channel_multipliers[i]
        blk = {"res_blocks": []}
        if cfg.level_use_attention[i]:
            blk["attention_blocks"] = []
        for j in range(cfg.num_res_blocks_per_level + 1):
            cin = (current if j == 0 else out_ch) + skip_channels[j]
            blk["res_blocks"].append(_init_resblock(next(keys), cin, out_ch, cond_ch, True, dtype))
            if cfg.level_use_attention[i]:
                blk["attention_blocks"].append(_init_attention(next(keys), out_ch, dtype))
        if i > 0:
            blk["upsample"] = _init_resblock(next(keys), out_ch, out_ch, cond_ch, True, dtype)
        up.append(blk)
        current = out_ch
    assert not channels
    p["up_blocks"] = up

    p["last_norm"] = tnn.init_norm_affine(current, dtype)
    last = tnn.init_conv(next(keys), 3, 3, current, cfg.out_channels, bias=True, method="zero", dtype=dtype)
    last["b"] = jnp.zeros_like(last["b"])
    p["last_conv"] = last
    return p


def apply(
    cfg: UnetConfig,
    params: Dict,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
    first_conv_addition: Optional[jnp.ndarray] = None,
    probe: Optional[Dict] = None,
) -> jnp.ndarray:
    """x (N,S,S,Cin), t (N,1), cond (N,cond_input_channels) -> (N,S,S,Cout).

    ``first_conv_addition`` implements UnetWithFirstConvAddition
    (reference unet.py:640-658).  ``probe`` cuts the packed flow after the
    Nth block event (see _apply_packed_flow; tools/unet_glue_probe.py).
    """
    te = params["time_embed"]
    t_emb = compute_timestep_embedding(t.astype(jnp.float32), cfg.t_emb_channels)
    t_emb = tnn.linear(te[1], jax.nn.silu(tnn.linear(te[0], t_emb)))
    ce = params["cond_embed"]
    cond_emb = tnn.linear(ce[1], jax.nn.silu(tnn.linear(ce[0], cond.astype(jnp.float32))))
    t_emb = t_emb.astype(x.dtype)
    cond_emb = cond_emb.astype(x.dtype)
    cb = cfg.condition_bias

    if _packed_flow_enabled():
        return _apply_packed_flow(cfg, params, x, t_emb, cond_emb, first_conv_addition, probe)

    h = tnn.conv2d(params["first_conv"], x)
    if first_conv_addition is not None:
        h = h + first_conv_addition
    hs = [h]
    for i, blk in enumerate(params["down_blocks"]):
        for j, rb in enumerate(blk["res_blocks"]):
            h = _resblock(rb, h, t_emb, cond_emb, "same", cb)
            if cfg.level_use_attention[i]:
                h = _attention(blk["attention_blocks"][j], h, cfg.attention)
            hs.append(h)
        if "downsample" in blk:
            h = _resblock(blk["downsample"], h, t_emb, cond_emb, "down", cb)
            hs.append(h)

    for blk in params["middle_blocks"]:
        if "res" in blk:
            h = _resblock(blk["res"], h, t_emb, cond_emb, "same", cb)
        else:
            h = _attention(blk["attn"], h, cfg.attention)

    for idx, blk in enumerate(params["up_blocks"]):
        i = cfg.num_levels - 1 - idx
        for j, rb in enumerate(blk["res_blocks"]):
            h = _resblock(rb, jnp.concatenate([h, hs.pop()], axis=-1), t_emb, cond_emb, "same", cb)
            if cfg.level_use_attention[i]:
                h = _attention(blk["attention_blocks"][j], h, cfg.attention)
        if "upsample" in blk:
            h = _resblock(blk["upsample"], h, t_emb, cond_emb, "up", cb)
    assert not hs

    h = jax.nn.silu(tnn.group_norm(params["last_norm"], h, num_groups=min(32, h.shape[-1])))
    return tnn.conv2d(params["last_conv"], h)
