"""Locate the chunk-vs-straight-line step-time gap.

tools/perf_audit.py measures the straight-line body distill step at ~114 ms
while tools/chunk_bench.py measures the same step inside the fused
lax.scan chunk at ~168 ms — and the straight-line teacher (100 ms) plus
student fwd+bwd (66 ms) sum to the CHUNK number, not the step number.  This
probe times three compositions each way (straight-line via device_timeit vs
inside a no-donation lax.scan) to find where the difference lives:

  * full     — teacher targets + student grad + Adam (the real step)
  * teacher  — teacher targets + loss on targets only (no student grad)
  * student  — fixed precomputed targets + student grad + Adam (no teacher)

Run:  python tools/scan_probe.py [--batch 8] [--steps 40]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=40)
    args = parser.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller import recipes
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.models import siren
    from tha4_tpu.poser.modes import mode_07
    from tha4_tpu.utils.profiling import device_timeit

    B, N = args.batch, args.steps
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image = jnp.asarray(cm.get_character_image())[None].astype(dt)

    tcfg = mode_07.TeacherConfig()
    tparams = jax.tree.map(lambda x: x.astype(dt), mode_07.init(key, tcfg))
    scfg = siren.SirenMorpherConfig()
    sparams = jax.tree.map(lambda x: x.astype(dt), siren.siren_morpher_init(key, scfg))
    opt = recipes.adam_init(sparams)
    weights = jnp.asarray([1.0, 2.5, 5.0, 1.0], jnp.float32)
    posesB = sample_poses(key, B).astype(dt)

    def teacher_targets(tp, img, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(img, (n,) + img.shape[1:])
        t = mode_07.compute_outputs(tcfg, tp, image_b, poses)
        return tuple(jax.lax.stop_gradient(t[i])
                     for i in (0, 2, 3, mode_07.INDEX_FACE_MORPHED_FULL))

    def student_loss(params, targets, poses, wts):
        gt_posed, gt_warped, gt_grid, student_input = [x.astype(jnp.float32) for x in targets[:3]] + [targets[3]]
        outs = siren.siren_morpher_apply_nhwc(scfg, params, student_input, poses)
        pb = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
        pw = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
        pg = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
        pc = outs[siren.SIREN_MORPHER_INDEX_COLOR_CHANGE].astype(jnp.float32)
        return (wts[0] * jnp.mean(jnp.abs(gt_posed - pb))
                + wts[1] * jnp.mean(jnp.abs(gt_warped - pw))
                + wts[2] * jnp.mean(jnp.abs(gt_grid - pg))
                + wts[3] * jnp.mean(jnp.abs(gt_posed - pc)))

    def full_step(params, o, tp, img, poses, wts):
        targets = teacher_targets(tp, img, poses)
        loss, grads = jax.value_and_grad(student_loss)(params, targets, poses, wts)
        params, o = recipes.adam_update(grads, o, params, 1e-4)
        return params, o, loss

    def teacher_step(params, o, tp, img, poses, wts):
        targets = teacher_targets(tp, img, poses)
        loss = sum(jnp.mean(jnp.abs(t.astype(jnp.float32))) for t in targets)
        return params, o, loss

    fixed_targets = jax.jit(teacher_targets)(tparams, image, posesB)
    fixed_targets = jax.tree.map(lambda x: x + 0, fixed_targets)  # materialize

    def student_step(params, o, targets, _img, poses, wts):
        loss, grads = jax.value_and_grad(student_loss)(params, targets, poses, wts)
        params, o = recipes.adam_update(grads, o, params, 1e-4)
        return params, o, loss

    print(f"device={jax.devices()[0]} B={B} steps={N}", flush=True)
    for name, step_fn, first in [
        ("full step", full_step, tparams),
        ("teacher only", teacher_step, tparams),
        ("student only (fixed targets)", student_step, fixed_targets),
    ]:
        # straight-line: one step per dispatch, fetch-barriered mean.
        # Returns the updated params/opt too — returning only the loss lets
        # XLA DCE the whole backward+Adam (this probe is how that hazard was
        # found; keep both variants' outputs equivalent).
        def straight(poses, p, o, f, img, wts):
            p2, o2, loss = step_fn(p, o, f, img, poses, wts)
            return loss, p2, o2
        sec = device_timeit(straight, posesB, sparams, opt, first, image, weights, iters=15)
        ms_straight = sec * 1000.0

        # scanned: N steps in one dispatch, poses re-sampled per step like the chunk
        @jax.jit
        def scanned(p, o, f, img, k, wts):
            def body(carry, i):
                p, o = carry
                poses = sample_poses(jax.random.fold_in(k, i), B).astype(dt)
                p, o, loss = step_fn(p, o, f, img, poses, wts)
                return (p, o), loss
            (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(N))
            return ls[-1]
        float(scanned(sparams, opt, first, image, key, weights))  # compile+warm
        t0 = time.perf_counter()
        float(scanned(sparams, opt, first, image, key, weights))
        ms_scan = (time.perf_counter() - t0) * 1000.0 / N
        print(f"{name:30s} straight {ms_straight:8.2f} ms   scanned {ms_scan:8.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
