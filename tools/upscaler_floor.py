"""Upscaler isolation floor: how much of the 68 ms is irreducible conv work?

The upscaler U-Net is the teacher's cost center (docs/perf.md roofline:
67.96 ms of the 100.3 ms consumed forward at B8 bf16, 34% MFU / 45% HBM).
This probe answers whether meaningful headroom remains by decomposing it:

  1. RECORD — trace one forward (``jax.eval_shape`` with monkeypatched
     block fns) and capture every block the packed flow actually runs:
     fused packed resblocks (with factor/splits/sampling), plain-path
     resblocks (narrow deep levels where f would be 1), attention blocks,
     and the top-level first/coarse/last convs.
  2. TIME each recorded block in isolation (``device_timeit``: scan-
     amortized, perturbation-guarded, fetch-barriered) twice:
       * full  — the production formulation (GN/FiLM/SiLU/skip included)
       * floor — ONLY its convolutions / attention GEMMs, chained on the
         same shapes at the same pack factors (weights pre-packed, as the
         hoisted production dispatch sees them)
  3. REPORT per-width rollups, the sum of parts vs the in-context whole
     net (the difference is flow glue: repacks at up-path concats,
     skip-store traffic), and the headline: floor / full ratio.

If sum(floor) is close to the in-context time, the stage is done at this
dtype — remaining cost IS the conv work — and docs/perf.md can say so with
a table instead of a hunch. Reference semantics being preserved:
/root/reference/src/tha4/nn/common/unet.py:154-239.

Run (real chip): python tools/upscaler_floor.py [--batch 8] [--iters 30]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def record_blocks(cfg, params, x_struct, t_struct, cond_struct, fca_struct=None):
    """Trace ``unet.apply`` once, returning the block list in execution order.

    Monkeypatches the block entry points; params reach the patched fns as
    concrete closure constants while activations are tracers, so each record
    carries the real weight subtree plus the activation shape/factor.
    """
    from tha4_tpu.models import unet
    from tha4_tpu.ops import nn as tnn

    records = []
    in_block = [False]
    orig_rb_packed = unet._fused_resblock_packed
    orig_rb_plain = unet._resblock
    orig_attn = unet._attention
    orig_conv = tnn.conv2d

    def rec_rb_packed(p, xp, f, splits, c0, c1, cb, sampling="same"):
        records.append(dict(kind="res_packed", params=p, shape=tuple(xp.shape),
                            dtype=xp.dtype, f=f, splits=tuple(splits), sampling=sampling))
        in_block[0] = True
        try:
            return orig_rb_packed(p, xp, f, splits, c0, c1, cb, sampling)
        finally:
            in_block[0] = False

    def rec_rb_plain(p, x, c0, c1, sampling="same", condition_bias=1.0):
        records.append(dict(kind="res_plain", params=p, shape=tuple(x.shape),
                            dtype=x.dtype, sampling=sampling))
        in_block[0] = True
        try:
            return orig_rb_plain(p, x, c0, c1, sampling, condition_bias)
        finally:
            in_block[0] = False

    def rec_attn(p, x, attn_cfg):
        records.append(dict(kind="attn", params=p, shape=tuple(x.shape), dtype=x.dtype))
        in_block[0] = True
        try:
            return orig_attn(p, x, attn_cfg)
        finally:
            in_block[0] = False

    def rec_conv(p, x, **kw):
        if not in_block[0]:
            # p's weights may be trace-time tracers (the flow packs them
            # inline); record shapes only and synthesize values for timing.
            records.append(dict(kind="conv", w_shape=tuple(p["w"].shape),
                                b_shape=tuple(p["b"].shape) if "b" in p else None,
                                shape=tuple(x.shape), dtype=x.dtype, kw=dict(kw)))
        return orig_conv(p, x, **kw)

    unet._fused_resblock_packed = rec_rb_packed
    unet._resblock = rec_rb_plain
    unet._attention = rec_attn
    tnn.conv2d = rec_conv
    try:
        jax.eval_shape(
            lambda x, t, c, a: unet.apply(cfg, params, x, t, c, a),
            x_struct, t_struct, cond_struct, fca_struct,
        )
    finally:
        unet._fused_resblock_packed = orig_rb_packed
        unet._resblock = orig_rb_plain
        unet._attention = orig_attn
        tnn.conv2d = orig_conv
    return records


def res_factors(rec):
    """(f0, f1) the fused packed resblock uses internally (models/unet.py)."""
    from tha4_tpu.ops import packed_conv as PC

    n, hh, wq, fc = rec["shape"]
    f, splits, sampling = rec["f"], rec["splits"], rec["sampling"]
    cin = sum(splits)
    ww = wq * f
    cout = rec["params"]["conv0"]["w"].shape[3]
    if len(splits) > 1:
        return f, f
    if sampling == "same":
        f01 = PC.pack_factor(cin, cout, ww)
        return f01, f01
    if sampling == "down":
        return PC.pack_factor(cin, cin, ww), PC.pack_factor(cin, cout, ww // 2)
    return PC.pack_factor(cin, cin, ww), PC.pack_factor(cin, cout, ww * 2)


def make_timers(rec, cfg, key):
    """(label, full_fn, full_args, floor_fn, floor_args) for one record."""
    from tha4_tpu.models import unet
    from tha4_tpu.ops import nn as tnn
    from tha4_tpu.ops import packed_conv as PC

    dt = rec["dtype"]
    p = rec.get("params")
    cond_ch = cfg.cond_internal_channels
    kind = rec["kind"]

    if kind in ("res_packed", "res_plain"):
        n = rec["shape"][0]
        cond0 = jax.random.normal(key, (n, cond_ch), dt)
        cond1 = cond0 + 1.0
        x = jax.random.normal(key, rec["shape"], dt)
        sampling = rec["sampling"]
        cout = p["conv0"]["w"].shape[3]

        if kind == "res_plain":
            cin = rec["shape"][-1]
            label = f"res-plain/{sampling} {rec['shape'][1]}px {cin}->{cout}"

            def full_fn(xx):
                return unet._resblock(p, xx, cond0, cond1, sampling, cfg.condition_bias)

            hh = rec["shape"][1] // 2 if sampling == "down" else (
                rec["shape"][1] * 2 if sampling == "up" else rec["shape"][1])
            a0 = jax.random.normal(key, (n, hh, hh, cin), dt)
            w0 = {k: v.astype(dt) for k, v in p["conv0"].items()}
            w1 = {k: v.astype(dt) for k, v in p["conv1"].items()}
            ws = {k: v.astype(dt) for k, v in p["skip"].items()} if "skip" in p else None

            def floor_fn(a):
                h1 = tnn.conv2d(w0, a)
                out = tnn.conv2d(w1, h1)
                if ws is not None:
                    out = out + tnn.conv2d(ws, a if a.shape[-1] == ws["w"].shape[2] else h1)
                return out

            return label, full_fn, (x,), floor_fn, (a0,)

        f, splits = rec["f"], rec["splits"]
        cin = sum(splits)
        ww = rec["shape"][2] * f
        label = f"res-packed/{sampling} {rec['shape'][1]}px {cin}->{cout} f{f}" + (
            f" parts{splits}" if len(splits) > 1 else "")

        def full_fn(xx):
            out, _ = unet._fused_resblock_packed(
                p, xx, f, splits, cond0, cond1, cfg.condition_bias, sampling)
            return out

        f0, f1 = res_factors(rec)
        hh = rec["shape"][1]
        hh2, ww2 = (hh // 2, ww // 2) if sampling == "down" else (
            (hh * 2, ww * 2) if sampling == "up" else (hh, ww))
        # conv0 input: the post-resample activation at f1
        a0 = jax.random.normal(key, (n, hh2, ww2 // f1, f1 * cin), dt)
        if len(splits) > 1:
            w0p = PC.pack_conv3_weights_parts(p["conv0"]["w"], f1, splits).astype(dt)
        else:
            w0p = PC.pack_conv3_weights(p["conv0"]["w"], f1).astype(dt)
        b0p = PC.tile_channel_vector(p["conv0"]["b"], f1).astype(dt)
        w1p = PC.pack_conv3_weights(p["conv1"]["w"], f1).astype(dt)
        b1p = PC.tile_channel_vector(p["conv1"]["b"], f1).astype(dt)
        if "skip" in p:
            sk = p["skip"]["w"].reshape(cin, cout)
            if len(splits) > 1:
                wsp = PC.pack_conv1_weights_parts(sk, f1, splits).astype(dt)
            else:
                wsp = PC.pack_conv1_weights(sk, f1).astype(dt)
            bsp = PC.tile_channel_vector(p["skip"]["b"], f1).astype(dt)
        else:
            wsp = None

        def floor_fn(a):
            h1 = tnn.conv2d({"w": w0p, "b": b0p}, a)
            out = tnn.conv2d({"w": w1p, "b": b1p}, h1)
            if wsp is not None:
                out = out + tnn.conv2d({"w": wsp, "b": bsp}, a, padding=0)
            return out

        return label, full_fn, (x,), floor_fn, (a0,)

    if kind == "attn":
        n, hh, ww, c = rec["shape"]
        label = f"attn {hh}px C{c}"
        x = jax.random.normal(key, rec["shape"], dt)

        def full_fn(xx):
            return unet._attention(p, xx, cfg.attention)

        num_heads = cfg.attention.heads_for(c)
        ch = c // num_heads
        wq = {k: v.astype(dt) for k, v in p["qkv"].items()}
        wp = {k: v.astype(dt) for k, v in p["proj"].items()}

        def floor_fn(xx):
            qkv = tnn.conv2d(wq, xx).reshape(n, hh * ww, 3 * c)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(n, -1, num_heads, ch)
            k = k.reshape(n, -1, num_heads, ch)
            v = v.reshape(n, -1, num_heads, ch)
            weight = jnp.einsum("nthc,nshc->nhts", q, k)
            out = jnp.einsum("nhts,nshc->nthc", weight, v).reshape(n, hh, ww, c)
            return xx + tnn.conv2d(wp, out)

        return label, full_fn, (x,), floor_fn, (x,)

    assert kind == "conv"
    n, hh, ww, c = rec["shape"]
    cout = rec["w_shape"][3]
    label = f"conv {hh}px {rec['shape'][-1]}->{cout} (flow-level)"
    x = jax.random.normal(key, rec["shape"], dt)
    wp = {"w": jax.random.normal(key, rec["w_shape"], dt)}
    if rec["b_shape"] is not None:
        wp["b"] = jnp.zeros(rec["b_shape"], dt)

    def full_fn(xx):
        return tnn.conv2d(wp, xx, **rec["kw"])

    return label, full_fn, (x,), full_fn, (x,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=512,
                    help="input resolution (shrink for cheap off-chip validation)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from tha4_tpu.models import unet, upscaler
    from tha4_tpu.utils.profiling import device_timeit

    dt = jnp.bfloat16
    B = args.batch
    ucfg = upscaler.UpscalerConfig()
    cfg = ucfg.unet
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda a: a.astype(dt), unet.init(key, cfg))

    S = args.size
    s = lambda shape: jax.ShapeDtypeStruct(shape, dt)
    recs = record_blocks(
        cfg, params,
        s((B, S, S, cfg.in_channels)), s((B, 1)),
        s((B, cfg.cond_input_channels)), s((B, S, S, cfg.model_channels)),
    )
    print(f"{len(recs)} blocks recorded from the packed flow "
          f"(B{B} bf16, backend={jax.default_backend()})", flush=True)

    # Dedupe identical (kind, shapes, routing) blocks; time once, multiply.
    groups = {}
    order = []
    for r in recs:
        if r["kind"] == "conv":
            tail = r["w_shape"]
        elif "conv0" in r["params"]:
            tail = r["params"]["conv0"]["w"].shape
        else:
            tail = r["params"]["qkv"]["w"].shape
        sig = (r["kind"], r["shape"], r.get("f"), r.get("splits"), r.get("sampling"), tail)
        if sig not in groups:
            groups[sig] = {"rec": r, "count": 0}
            order.append(sig)
        groups[sig]["count"] += 1

    rows = []
    for sig in order:
        g = groups[sig]
        label, full_fn, full_args, floor_fn, floor_args = make_timers(g["rec"], cfg, key)
        ms_full = device_timeit(full_fn, *full_args, iters=args.iters) * 1000
        ms_floor = device_timeit(floor_fn, *floor_args, iters=args.iters) * 1000
        rows.append({"block": label, "count": g["count"],
                     "ms_full": ms_full, "ms_floor": ms_floor})
        print(f"  {label:44s} x{g['count']}  full {ms_full:6.2f} ms  "
              f"floor {ms_floor:6.2f} ms  (+{100*(ms_full/max(ms_floor,1e-9)-1):.0f}%)",
              flush=True)

    sum_full = sum(r["ms_full"] * r["count"] for r in rows)
    sum_floor = sum(r["ms_floor"] * r["count"] for r in rows)

    # Per-width rollup and sums first: they need no further measurement, so a
    # wall-clock timeout during the (long) in-context timings below cannot
    # take them down with it — that truncation happened twice on 2026-08-19.
    by_width = defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        w = r["block"].split("px")[0].split()[-1]
        by_width[w][0] += r["ms_full"] * r["count"]
        by_width[w][1] += r["ms_floor"] * r["count"]
    print("\nper-width rollup (ms, sum of isolated blocks):")
    for w in sorted(by_width, key=lambda v: -int(v)):
        fu, fl = by_width[w]
        print(f"  {w:>4}px  full {fu:6.2f}  conv-floor {fl:6.2f}  overhead {fu-fl:6.2f}")
    print(f"\nsum of isolated blocks: full {sum_full:.2f} ms, conv-floor {sum_floor:.2f} ms",
          flush=True)

    # In-context wholes.
    x = jax.random.normal(key, (B, S, S, cfg.in_channels), dt)
    t = jnp.zeros((B, 1), dt)
    cond = jax.random.normal(key, (B, cfg.cond_input_channels), dt)
    fca = jax.random.normal(key, (B, S, S, cfg.model_channels), dt)
    ms_net = device_timeit(
        lambda xx: unet.apply(cfg, params, xx, t, cond, fca), x, iters=args.iters) * 1000

    uparams = jax.tree.map(lambda a: a.astype(dt), upscaler.init(key, ucfg))
    rest = jax.random.normal(key, (B, S, S, 4), dt)
    coarse = jax.random.normal(key, (B, S, S, 4), dt)
    grid = jax.random.normal(key, (B, S, S, 2), dt) * 0.01
    pose6 = jax.random.normal(key, (B, 6), dt)
    ms_ups = device_timeit(
        lambda r: upscaler.apply(ucfg, uparams, r, coarse, grid, pose6), rest,
        iters=args.iters) * 1000

    glue = ms_net - sum_full
    print(f"in-context U-Net forward: {ms_net:.2f} ms  (flow glue vs sum-of-parts: "
          f"{glue:+.2f} ms)")
    print(f"full upscaler.apply (warp + coarse conv + U-Net): {ms_ups:.2f} ms")
    print(f"floor ratio: conv work is {100*sum_floor/ms_net:.0f}% of the in-context "
          f"forward -> headroom at this dtype <= {100*(1-sum_floor/ms_net):.0f}% "
          f"(GN/FiLM/SiLU/softmax/glue)")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "sum_full_ms": sum_full, "sum_floor_ms": sum_floor,
                       "net_ms": ms_net, "upscaler_ms": ms_ups, "batch": B}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
