"""Locate the upscaler U-Net's between-block glue (~32 ms) by prefix timing.

docs/perf.md round-5 conv-floor table: the 40 isolated blocks sum to 36 ms
but the in-context forward is 68 ms. This probe times PREFIXES of the packed
flow (first conv, then cumulatively each down level, the middle, each up
level, the last conv) in-context: the difference between consecutive
prefixes is the real in-context cost of that segment, directly comparable
to the same segment's isolated-block sum from `tools/upscaler_floor.py`.
Wherever in-context >> isolated, that segment owns the glue.

The flow loop is re-stated here with a stop counter (same block functions,
same params); a full-depth parity check against `unet.apply` guards drift.

Run (real chip): python tools/flow_prefix_probe.py [--batch 8] [--iters 20]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def prefix_flow(cfg, params, x, t_emb, cond_emb, fca, stop=None):
    """models/unet.py _apply_packed_flow with a stop-after-segment counter.

    Returns (h, hs) at the cut so every computed tensor stays live (skips
    included), as in the real program. ``stop`` counts SEGMENTS: 0 = first
    conv only, then one per down level, +1 middle, one per up level,
    +1 last conv (None = full).
    """
    from tha4_tpu.models import unet
    from tha4_tpu.ops import nn as tnn
    from tha4_tpu.ops import packed_conv as PC

    cb = cfg.condition_bias
    width = x.shape[2]
    seg = [0]

    def done():
        return stop is not None and seg[0] >= stop

    c = cfg.model_channels
    f = PC.pack_factor(c, c, width)
    h = tnn.conv2d(
        {"w": PC.pack_conv3_weights(params["first_conv"]["w"], f),
         "b": PC.tile_channel_vector(params["first_conv"]["b"], f)},
        PC.pack_nhwc(x, f),
    )
    if fca is not None:
        h = h + PC.pack_nhwc(fca.astype(h.dtype), f)
    seg[0] += 1
    if done():
        return h, []

    def attend(attn_params, h, f, c, w):
        xq = PC.unpack_nhwc(h, f)
        xq = unet._attention(attn_params, xq, cfg.attention)
        fn = PC.pack_factor(c, c, w)
        return PC.pack_nhwc(xq, fn), fn

    def resample(rb, h, f, c, w, sampling):
        if PC.pack_factor(c, c, w) >= 2:
            return unet._fused_resblock_packed(rb, h, f, (c,), t_emb, cond_emb, cb, sampling)
        xq = unet._resblock(rb, PC.unpack_nhwc(h, f), t_emb, cond_emb, sampling, cb)
        wn = w // 2 if sampling == "down" else w * 2
        fn = PC.pack_factor(xq.shape[-1], xq.shape[-1], wn)
        return PC.pack_nhwc(xq, fn), fn

    hs = [(h, f, c)]
    for i, blk in enumerate(params["down_blocks"]):
        for j, rb in enumerate(blk["res_blocks"]):
            h, f = unet._fused_resblock_packed(rb, h, f, (c,), t_emb, cond_emb, cb, "same")
            c = rb["conv0"]["w"].shape[3]
            if cfg.level_use_attention[i]:
                h, f = attend(blk["attention_blocks"][j], h, f, c, width)
            hs.append((h, f, c))
        if "downsample" in blk:
            h, f = resample(blk["downsample"], h, f, c, width, "down")
            width //= 2
            hs.append((h, f, c))
        seg[0] += 1
        if done():
            return h, [t for t, _, _ in hs]

    for blk in params["middle_blocks"]:
        if "res" in blk:
            h, f = unet._fused_resblock_packed(blk["res"], h, f, (c,), t_emb, cond_emb, cb, "same")
        else:
            h, f = attend(blk["attn"], h, f, c, width)
    seg[0] += 1
    if done():
        return h, [t for t, _, _ in hs]

    for idx, blk in enumerate(params["up_blocks"]):
        i = cfg.num_levels - 1 - idx
        for j, rb in enumerate(blk["res_blocks"]):
            sk, fs, cs = hs.pop()
            ft = PC.pack_factor(c + cs, rb["conv0"]["w"].shape[3], width)
            hcat = jnp.concatenate(
                [h if f == ft else PC.repack(h, f, ft),
                 sk if fs == ft else PC.repack(sk, fs, ft)], axis=-1)
            h, f = unet._fused_resblock_packed(
                rb, hcat, ft, (c, cs), t_emb, cond_emb, cb, "same")
            c = rb["conv0"]["w"].shape[3]
            if cfg.level_use_attention[i]:
                h, f = attend(blk["attention_blocks"][j], h, f, c, width)
        if "upsample" in blk:
            h, f = resample(blk["upsample"], h, f, c, width, "up")
            width *= 2
        seg[0] += 1
        if done():
            return h, [t for t, _, _ in hs]

    m1, m2 = PC.packed_channel_stats(h, f)
    s, b = unet._fold_affine(m1, m2, min(32, c), params["last_norm"], (), 1.0)
    act = jax.nn.silu(
        h * PC.tile_channel_vector(s, f).astype(h.dtype)[:, None, None, :]
        + PC.tile_channel_vector(b, f).astype(h.dtype)[:, None, None, :])
    out = tnn.conv2d(
        {"w": PC.pack_conv3_weights(params["last_conv"]["w"], f),
         "b": PC.tile_channel_vector(params["last_conv"]["b"], f)},
        act)
    return PC.unpack_nhwc(out, f), []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    from tha4_tpu.models import unet, upscaler
    from tha4_tpu.utils.profiling import device_timeit

    dt = jnp.bfloat16
    B, S = args.batch, args.size
    ucfg = upscaler.UpscalerConfig()
    cfg = ucfg.unet
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda a: a.astype(dt), unet.init(key, cfg))

    x = jax.random.normal(key, (B, S, S, cfg.in_channels), dt)
    t = jnp.zeros((B, 1), dt)
    cond = jax.random.normal(key, (B, cfg.cond_input_channels), dt)
    fca = jax.random.normal(key, (B, S, S, cfg.model_channels), dt)

    # t/cond embeddings exactly as unet.apply computes them, so the prefix
    # flow sees identical inputs (read apply() for the embedding chain).
    from tha4_tpu.ops import nn as tnn
    t_emb = unet.compute_timestep_embedding(t.astype(jnp.float32), cfg.t_emb_channels)
    t_emb = tnn.linear(params["time_embed"][1],
                       jax.nn.silu(tnn.linear(params["time_embed"][0], t_emb))).astype(dt)
    cond_emb = tnn.linear(
        params["cond_embed"][1],
        jax.nn.silu(tnn.linear(params["cond_embed"][0], cond.astype(jnp.float32))),
    ).astype(dt)

    # Parity guard: full-depth restatement == unet.apply.
    ref = unet.apply(cfg, params, x, t, cond, fca)
    got, _ = prefix_flow(cfg, params, x, t_emb, cond_emb, fca, stop=None)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"parity max|diff| vs unet.apply: {err:.3e}")
    assert err < 1e-2, "prefix restatement drifted from unet.apply"

    n_down = len(params["down_blocks"])
    n_up = len(params["up_blocks"])
    labels = (["first conv(+fca)"]
              + [f"down L{i}" for i in range(n_down)]
              + ["middle"]
              + [f"up L{n_down - 1 - i}" for i in range(n_up)]
              + ["last GN+conv"])
    prev = 0.0
    print(f"cumulative prefix times (B{B} bf16, {jax.default_backend()}):")
    for k, lab in enumerate(labels):
        stop = None if k == len(labels) - 1 else k + 1
        ms = device_timeit(
            lambda xx: prefix_flow(cfg, params, xx, t_emb, cond_emb, fca, stop=stop),
            x, iters=args.iters) * 1000
        print(f"  after {lab:18s} {ms:7.2f} ms   (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
