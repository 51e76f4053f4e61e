"""character_model_manual_poser — pose a distilled character model (students).

Headless CLI equivalent of the reference wx app
(reference: src/tha4/app/character_model_manual_poser.py): load a
character_model.yaml, set pose parameters by name, render student outputs.

Examples:
  tha4-char-pose --model data/character_models/lambda_00/character_model.yaml \
      --set eye_wink_left=1 --output out.png
  tha4-char-pose --model ... --sweep head_y --frames 8 --output-dir sweep/
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, help="character_model.yaml")
    parser.add_argument("--output", default="output.png")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--set", action="append", default=[], metavar="NAME=VALUE")
    parser.add_argument("--output-index", type=int, default=0, help="0..5 (mode_14 outputs)")
    parser.add_argument("--sweep", default=None, metavar="NAME")
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tha4_tpu.apps.full_manual_poser import build_pose
    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.core import imagecodec

    model = CharacterModel.load(args.model)
    poser = model.get_poser(compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    image = model.get_character_image()
    pose_parameters = poser.pose_parameters

    assignments = [(kv.split("=", 1)[0], float(kv.split("=", 1)[1])) for kv in args.set]

    def render(pose, path):
        t0 = time.perf_counter()
        out = poser.pose(image, pose, args.output_index)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) * 1000.0
        frame = np.asarray(out[0])
        if frame.shape[-1] != 4:
            frame = np.repeat(frame[..., :1], 4, axis=-1)
        imagecodec.save_image_hwc(frame, path)
        print(f"{path}: {dt:.1f} ms")

    if args.sweep:
        out_dir = args.output_dir or "sweep"
        os.makedirs(out_dir, exist_ok=True)
        group = next(
            g for g in pose_parameters.get_pose_parameter_groups() if args.sweep in g.get_parameter_names()
        )
        lo, hi = group.get_range()
        for i in range(args.frames):
            value = lo + (hi - lo) * i / max(args.frames - 1, 1)
            pose = build_pose(pose_parameters, assignments + [(args.sweep, value)])
            render(pose, f"{out_dir}/{args.sweep}_{i:03d}.png")
    else:
        pose = build_pose(pose_parameters, assignments)
        render(pose, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
