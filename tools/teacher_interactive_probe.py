"""Interactive teacher frame: what does the eyebrow-decomposer cache save?

The reference memoizes the eyebrow decomposer per rest image
(/root/reference/src/tha4/poser/modes/mode_07.py:56-67): interactive pose
changes on an unchanged image skip network 1.  mode_07.create_poser now
reproduces that as a GeneralPoser prologue cached by image identity.  This
probe measures the per-frame win on the real chip: N pose-only frames through

  cached   — the production poser (prologue runs once, then per-pose program)
  inline   — a poser whose program recomputes the decomposer every frame
             (the pre-round-5 behavior)

Frames are timed host-side with a fetch barrier (tunnel round trips are the
same for both variants, so the DELTA is the decomposer cost), reporting
median and mean over --frames after --warmup.

Run (real chip): python tools/teacher_interactive_probe.py [--frames 30]
Random teacher weights (the shipped .pt files are placeholders); the
decomposer's cost does not depend on weight values.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from tha4_tpu.core import imagecodec
    from tha4_tpu.poser.modes import mode_07
    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = mode_07.TeacherConfig()
    params = mode_07.init(jax.random.PRNGKey(0), cfg)
    image = imagecodec.load_image_hwc(
        "/root/reference/data/character_models/lambda_00/character.png")

    pp = get_pose_parameters()
    base = np.asarray(pp.get_default_pose(), np.float32)
    idx = {n: pp.get_parameter_index(n) for n in ("head_x", "mouth_aaa", "eyebrow_troubled_left")}

    cached = mode_07.create_poser(params=params, cfg=cfg, compute_dtype=dt)
    inline = mode_07.create_poser(params=params, cfg=cfg, compute_dtype=dt)
    inline._prologue = None  # force the decomposer back into the per-pose program

    def drive(poser, tag):
        times = []
        for i in range(args.warmup + args.frames):
            pose = base.copy()
            pose[idx["head_x"]] = 0.6 * np.sin(i / 4.0)
            pose[idx["mouth_aaa"]] = 0.5 + 0.5 * np.sin(i / 3.0)
            pose[idx["eyebrow_troubled_left"]] = 0.5 + 0.5 * np.sin(i / 5.0)
            t0 = time.perf_counter()
            out = poser.pose(image, pose)
            out.block_until_ready()
            _ = float(jnp.mean(out))  # fetch barrier (tunnel: block can return early)
            times.append(1000 * (time.perf_counter() - t0))
        t = np.asarray(times[args.warmup:])
        print(f"{tag}: median {np.median(t):.2f} ms  mean {t.mean():.2f} ms  "
              f"p90 {np.percentile(t, 90):.2f} ms  (n={len(t)})", flush=True)
        return {"median_ms": float(np.median(t)), "mean_ms": float(t.mean()),
                "p90_ms": float(np.percentile(t, 90))}

    r_inline = drive(inline, "inline (decomposer every frame)")
    r_cached = drive(cached, "cached (prologue memoized)   ")
    assert cached.prologue_cache_misses == 1, cached.prologue_cache_misses
    delta = r_inline["median_ms"] - r_cached["median_ms"]
    print(f"decomposer cache win: {delta:.2f} ms/frame "
          f"({100 * delta / r_inline['median_ms']:.1f}% of the interactive frame)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"inline": r_inline, "cached": r_cached,
                       "win_ms": delta, "dtype": args.dtype,
                       "frames": args.frames}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
