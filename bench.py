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

    # Indices for the animated sweep — resolved from the schema by name so the
    # bench drives the same knobs the puppeteer does (blink, talk, head sway,
    # body sway, breathing) over their real value ranges, not an epsilon ramp.
    IDX = {
        name: pp.get_parameter_index(name)
        for name in (
            "head_x", "head_y", "neck_z", "body_z", "breathing",
            "mouth_aaa", "eye_wink_left", "eye_wink_right",
        )
    }

    # Methodology: on the axon tunnel, block_until_ready returns before the
    # device finishes and per-dispatch round trips cost ~ms, so the honest
    # number is device-side: scan N frames in ONE program and fetch a value
    # derived from every frame. This measures what a production host (no
    # tunnel) would see per frame.
    import jax
    from jax import lax

    from tha4_tpu.poser.modes import mode_14

    face_cfg, body_cfg = poser.face_cfg, poser.body_cfg
    n = 100
    p0 = jnp.asarray(pp.get_default_pose())[None]

    def pose_at(p0, i):
        """Animated sweep mirroring the synthetic puppeteer stream: blinking,
        talking, head/body sway, breathing — full schema value ranges."""
        pose = p0
        pose = pose.at[0, IDX["head_x"]].set(0.6 * jnp.sin(i / 4.0))
        pose = pose.at[0, IDX["head_y"]].set(jnp.sin(i / 10.0))
        pose = pose.at[0, IDX["neck_z"]].set(0.5 * jnp.sin(i / 6.0))
        pose = pose.at[0, IDX["body_z"]].set(0.4 * jnp.sin(i / 9.0))
        pose = pose.at[0, IDX["breathing"]].set(0.5 + 0.5 * jnp.sin(i / 5.0))
        pose = pose.at[0, IDX["mouth_aaa"]].set(0.5 + 0.5 * jnp.sin(i / 3.0))
        blink = jnp.clip(jnp.sin(i / 7.0) * 8.0 - 7.0, 0.0, 1.0)
        pose = pose.at[0, IDX["eye_wink_left"]].set(blink)
        pose = pose.at[0, IDX["eye_wink_right"]].set(blink)
        return pose

    @jax.jit
    def frames(params, image, p0):
        def body(c, i):
            pose = pose_at(p0, i).astype(jnp.bfloat16)
            outs = mode_14.compute_outputs(face_cfg, body_cfg, params, image.astype(jnp.bfloat16), pose)
            return c + outs[0].astype(jnp.float32).mean(), ()
        c, _ = lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
        return c

    float(frames(poser.params, image, p0))  # compile
    t0 = time.perf_counter()
    float(frames(poser.params, image, p0))
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
