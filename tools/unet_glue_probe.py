"""Locate the upscaler's in-context cost between the conv floor and 68 ms.

docs/perf.md's round-5 floor table showed the upscaler U-Net's blocks sum to
36.0 ms in isolation vs 68.0 ms for the in-context roofline row, and read the
~32 ms difference as "flow glue".  But the roofline row times the WHOLE
``upscaler.apply`` (reference semantics upscaler_02.py:59-98), which also
contains two 512^2 B8 warps (the coarse-grid prologue warp and the output
head's apply_grid_change), the 10-channel feature concat + coarse conv, and
the sigmoid/color-change head — none of which are U-Net blocks.  This probe
splits the row honestly, then prefix-ladders the U-Net itself:

  part 1: upscaler.apply whole | prologue | unet.apply | head, measured
          separately (they sum to the whole if scheduling adds nothing);
  part 2: cut the packed flow after block event K (models/unet.apply's
          ``probe`` hook) for K = 1..41 and report the per-event diff next
          to the event label — the in-context cost of each block INCLUDING
          whatever relayout/concat glue XLA schedules around it.

Run on the real chip (prints incrementally so a timeout can't eat the data):

  python tools/unet_glue_probe.py [--batch 8] [--iters 20] [--stride 1]
  python tools/unet_glue_probe.py --parts-only     # just the 4-way split
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stride", type=int, default=1, help="ladder every Nth event")
    ap.add_argument("--parts-only", action="store_true")
    ap.add_argument("--start", type=int, default=1, help="first ladder cut")
    args = ap.parse_args()

    from tha4_tpu.models import unet, upscaler
    from tha4_tpu.ops import nn as tnn
    from tha4_tpu.ops import warp
    from tha4_tpu.utils.profiling import device_timeit

    dt = jnp.bfloat16
    B = args.batch
    key = jax.random.PRNGKey(0)
    cfg = upscaler.UpscalerConfig()
    params = jax.tree.map(lambda a: a.astype(dt), upscaler.init(key, cfg))

    ks = jax.random.split(key, 4)
    rest = jax.random.normal(ks[0], (B, 512, 512, 4), dt)
    coarse = jax.random.normal(ks[1], (B, 512, 512, 4), dt)
    grid = (jax.random.normal(ks[2], (B, 512, 512, 2), dt) * 0.02)
    pose = jax.random.normal(ks[3], (B, 6), dt)
    t0 = jnp.zeros((B, 1), dt)

    def t(label, fn, *a):
        ms = device_timeit(fn, *a, iters=args.iters) * 1000
        print(f"  {label:44s} {ms:7.2f} ms", flush=True)
        return ms

    print(f"batch={B} bf16 device={jax.devices()[0]}", flush=True)

    # ---- part 1: the 4-way split of the roofline row ----------------------
    print("[parts]", flush=True)
    whole = t("upscaler.apply (roofline row)",
              lambda r, c, g, p, pp: upscaler.apply(cfg, pp, r, c, g, p),
              rest, coarse, grid, pose, params)

    def prologue(r, c, g, pp):
        warped = warp.apply_grid_change(g, r)
        feature = jnp.concatenate([c, warped, g], axis=-1)
        return tnn.conv2d(pp["coarse_image_conv"], feature)

    pro = t("prologue (warp+concat+coarse conv)", prologue, rest, coarse, grid, params)

    fca = prologue(rest, coarse, grid, params)
    body = t("unet.apply (blocks only)",
             lambda r, f, p, pp: unet.apply(cfg.unet, pp["body"], r, t0, p, f),
             rest, fca, pose, params)

    out7 = jax.random.normal(ks[1], (B, 512, 512, 7), dt)

    def head(o, r):
        c = 4
        direct = o[..., 0:c]
        gch = o[..., c:c + 2]
        alpha = jax.nn.sigmoid(o[..., c + 2:c + 3])
        warped = warp.apply_grid_change(gch, r)
        return warp.apply_color_change(alpha, direct, warped)

    hd = t("head (sigmoid+warp+color)", head, out7, rest)
    t("  (bare 512^2 B8 warp, for reference)",
      lambda g, r: warp.apply_grid_change(g, r), grid, rest)
    print(f"  parts sum = {pro + body + hd:.2f} ms vs whole {whole:.2f} ms "
          f"(U-Net share {body:.2f}; non-U-Net {pro + hd:.2f})", flush=True)

    if args.parts_only:
        return

    # ---- part 2: prefix ladder inside the U-Net ---------------------------
    probe0 = {"cut": None, "labels": []}
    jax.eval_shape(
        lambda r, f, p, pp: unet.apply(cfg.unet, pp["body"], r, t0, p, f, probe=probe0),
        rest, fca, pose, params)
    labels = list(probe0["labels"])
    print(f"[ladder] {len(labels)} block events; stride {args.stride}", flush=True)

    prev = 0.0
    prev_k = 0
    for k in range(args.start, len(labels) + 1, args.stride):
        def cutfn(r, f, p, pp, k=k):
            return unet.apply(cfg.unet, pp["body"], r, t0, p, f,
                              probe={"cut": k, "labels": []})
        ms = device_timeit(cutfn, rest, fca, pose, params, iters=args.iters) * 1000
        print(f"  cut {k:2d} {labels[k-1]:34s} cum {ms:7.2f} ms   "
              f"+{ms - prev:6.2f} over {k - prev_k} event(s)", flush=True)
        prev, prev_k = ms, k


if __name__ == "__main__":
    main()
