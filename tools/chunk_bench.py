"""Distillation chunk step-time measurement on the real chip.

Times `make_{face,body}_distill_chunk` in the two configurations that matter
for the scaling story (docs/scaling.md):

  * B8 K1  — the single-chip baseline (total batch 8, plain stepping).
  * B1 K8  — one chip's share under 8-way data parallelism with teacher
             lookahead 8 (the per-chip step time that the v5e-8 wall-clock
             extrapolation multiplies out).

Timing protocol: each configuration is compiled and run once (warm-up), then
run again with fresh (donation-safe) buffers; the reported ms/step is the
wall time of the second call divided by n_steps, fetch-barriered by pulling
the final loss scalar to the host (on this environment `block_until_ready`
can return before the device finishes; a value fetch cannot).

Run:  python tools/chunk_bench.py [--steps-body 120] [--steps-face 500]
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


def time_chunk(build_state, chunk, extra_args, n_steps):
    """Run chunk twice (compile+warm, then timed) with fresh donated buffers."""
    params, opt = build_state()
    out = chunk(params, opt, *extra_args, n_steps=n_steps)
    float(jax.tree.leaves(out[2])[0])  # fetch barrier for the warm-up

    params, opt = build_state()
    t0 = time.perf_counter()
    out = chunk(params, opt, *extra_args, n_steps=n_steps)
    loss = float(out[2]["loss"])
    t1 = time.perf_counter()
    return (t1 - t0) * 1000.0 / n_steps, loss


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps-body", type=int, default=120)
    parser.add_argument("--steps-face", type=int, default=500)
    parser.add_argument("--teacher-int8", action="store_true",
                        help="calibrate + run the frozen teacher int8 (ops/quant.py)")
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller import recipes
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.models import siren
    from tha4_tpu.poser.modes import mode_07, mode_12

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image = jnp.asarray(cm.get_character_image())[None].astype(dt)

    tcfg = mode_07.TeacherConfig()
    tparams = jax.tree.map(lambda x: x.astype(dt), mode_07.init(key, tcfg))
    fcfg = mode_12.FaceTeacherConfig()
    ftparams = jax.tree.map(lambda x: x.astype(dt), mode_12.init(key, fcfg))

    scfg_b = siren.SirenMorpherConfig()
    scfg_f = siren.SirenFaceMorpherConfig()
    body0 = jax.tree.map(np.asarray, siren.siren_morpher_init(key, scfg_b))
    face0 = jax.tree.map(np.asarray, siren.siren_face_morpher_init(key, scfg_f))

    def body_state():
        p = jax.tree.map(lambda x: jnp.asarray(x).astype(dt), body0)
        return p, recipes.adam_init(p)

    def face_state():
        p = jax.tree.map(lambda x: jnp.asarray(x).astype(dt), face0)
        return p, recipes.adam_init(p)

    weights = jnp.asarray([1.0, 2.5, 5.0, 1.0], jnp.float32)
    mask = jnp.ones((128, 128, 4), dt)
    rows = []

    body_quant = face_quant = None
    if args.teacher_int8:
        from tha4_tpu.distiller.pose_dataset import sample_poses as _sp
        from tha4_tpu.ops import quant
        img8 = jnp.broadcast_to(image, (8,) + image.shape[1:])
        poses8 = _sp(key, 8).astype(dt)
        body_quant = quant.run_calibration(
            lambda tp, i, p: mode_07.compute_outputs(tcfg, tp, i, p), tparams, img8, poses8)
        face_quant = quant.run_calibration(
            lambda tp, i, p: mode_12.compute_outputs(fcfg, tp, i, p), ftparams, img8, poses8)
        print(f"int8 teacher: body {len(body_quant)} convs, face {len(face_quant)} convs", flush=True)

    print(f"device={jax.devices()[0]} dtype=bf16 teacher_int8={args.teacher_int8}", flush=True)

    for name, b, k, n in [
        ("body B8 K1 (single-chip baseline)", 8, 1, args.steps_body),
        ("body B1 K8 (per-chip DP share)", 1, 8, args.steps_body * 2),
    ]:
        chunk = recipes.make_body_distill_chunk(
            tcfg, scfg_b, sample_poses, batch_size=b, compute_dtype=dt, lookahead=k,
            teacher_quant=body_quant)
        ms, loss = time_chunk(
            body_state, chunk, (tparams, image, key, 1e-4, weights), n)
        rows.append({"config": name, "ms_per_step": round(ms, 2), "loss": round(loss, 4)})
        print(f"{name:38s} {ms:8.2f} ms/step  (loss {loss:.4f})", flush=True)

    for name, b, k, n in [
        ("face B8 K1 (single-chip baseline)", 8, 1, args.steps_face),
        ("face B1 K8 (per-chip DP share)", 1, 8, args.steps_face * 2),
    ]:
        chunk = recipes.make_face_distill_chunk(
            fcfg, scfg_f, sample_poses, batch_size=b, compute_dtype=dt, lookahead=k,
            teacher_quant=face_quant)
        ms, loss = time_chunk(
            face_state, chunk, (ftparams, image, mask, key, 1e-4), n)
        rows.append({"config": name, "ms_per_step": round(ms, 2), "loss": round(loss, 4)})
        print(f"{name:38s} {ms:8.2f} ms/step  (loss {loss:.4f})", flush=True)

    if args.json:
        with open(args.json, "wt") as f:
            json.dump(rows, f, indent=1)
        print(f"rows -> {args.json}")


if __name__ == "__main__":
    main()
