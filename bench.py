"""Benchmark: 512x512 student inference frames/sec/chip (batch=1 latency path).

This is the reference's headline real-time metric (BASELINE.md: student
real-time puppeteering, animation timer 10 ms ~ 100 fps ceiling on an RTX
2080-class GPU; driver target >60 fps/chip).  Prints ONE JSON line.

Run on whatever jax.devices() provides (the driver runs it on one real TPU
chip).  Uses the shipped lambda_00 student weights and character art.
"""

import json
import time

import numpy as np

BASELINE_FPS = 60.0  # driver target: >60 fps/chip (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    model = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml"
    )
    poser = model.get_poser(compute_dtype=jnp.bfloat16)
    image = jnp.asarray(model.get_character_image())[None]

    pp = get_pose_parameters()
    rng = np.random.default_rng(0)

    def pose_at(i):
        pose = pp.get_default_pose()
        pose[pp.get_parameter_index("head_y")] = float(np.sin(i / 10.0))
        pose[pp.get_parameter_index("mouth_aaa")] = float(0.5 + 0.5 * np.sin(i / 3.0))
        pose[pp.get_parameter_index("eye_wink_left")] = float(0.5 + 0.5 * np.sin(i / 7.0))
        return jnp.asarray(pose)[None]

    # Warm up (compile)
    out = poser._run(poser.params, image, pose_at(0))
    out[0].block_until_ready()

    # Steady-state batch=1 LATENCY path: each frame blocks until the output
    # frame is ready (what a real puppeteer loop observes per frame).
    n = 200
    t0 = time.perf_counter()
    for i in range(n):
        out = poser._run(poser.params, image, pose_at(i))
        out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "student_512x512_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
