"""A/B: does the bf16 compute-dtype training default change the OUTCOME?

The distiller trains in bf16 by default (`DistillationJobs.compute_dtype`,
distiller/pipeline.py) while the reference trained f32 end to end
(/root/reference/src/tha4/shion/core/training/distrib/distributed_trainer.py
has no AMP anywhere).  This probe answers whether that default costs model
quality: two body-student trainings from the SAME init and the SAME pose
stream — one with compute_dtype=bfloat16 (production default), one with
compute_dtype=float32 (reference semantics) — then both students are
evaluated against the *float32* teacher's labels on a held-out pose suite
(utils/fidelity.random_pose_suite), reporting per-term L1 and blended-frame
PSNR.

Run:  python tools/dtype_ab.py [--examples 50000] [--batch 8]
      [--lookahead 8] [--chunk-steps 256] [--eval-poses 64] [--json out.json]

Uses the randomly-initialized shipped-architecture teacher (the pretrained
.pt files are placeholders in this bundle); both arms see identical f32
teacher weights, f32 student master weights, and f32 image — exactly as the
production pipeline keeps them — and differ ONLY in the chunk's
compute_dtype (activation dtype).  Fixed lr=1e-4 for both arms — the A/B
isolates the dtype, not the schedule.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lookahead", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=256)
    ap.add_argument("--eval-poses", type=int, default=64)
    ap.add_argument("--json", default=None)
    ap.add_argument("--arms", default="bf16,f32,bf16t+f32s",
                    help="comma-separated arm subset; --json merges into existing results")
    args = ap.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller import recipes
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.models import siren
    from tha4_tpu.poser.modes import mode_07
    from tha4_tpu.utils import fidelity

    key = jax.random.PRNGKey(0)
    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image32 = jnp.asarray(cm.get_character_image())[None].astype(jnp.float32)

    tcfg = mode_07.TeacherConfig()
    tparams32 = mode_07.init(key, tcfg)

    scfg = siren.SirenMorpherConfig()
    student0 = jax.tree.map(np.asarray, siren.siren_morpher_init(key, scfg))
    weights = jnp.asarray([1.0, 2.5, 5.0, 1.0], jnp.float32)

    n_steps = (args.examples + args.batch - 1) // args.batch
    # Round up to a whole number of fixed-size chunk dispatches so both arms
    # compile exactly one program each.
    cs = args.chunk_steps
    if cs % args.lookahead:
        cs += args.lookahead - cs % args.lookahead
    n_chunks = (n_steps + cs - 1) // cs
    n_steps = n_chunks * cs
    print(f"{n_steps} steps x B{args.batch} = {n_steps * args.batch} examples, "
          f"{n_chunks} chunks of {cs} steps, lookahead {args.lookahead}", flush=True)

    # ---- f32 oracle eval: held-out pose suite vs the f32 teacher ----------
    eval_poses = fidelity.random_pose_suite(args.eval_poses, seed=0xE7A1)

    def make_eval(compute_dtype=jnp.float32):
        # Both arms are evaluated at f32 inference (master weights are f32 in
        # both): the A/B isolates what bf16 TRAINING did to the learned
        # weights, not what bf16 inference does (tools/precision_sweep.py
        # covers the latter).
        # Teacher params and the image are ARGUMENTS, not closure constants:
        # closed-over arrays embed as literals in the serialized HLO, which
        # overflows the remote-compile request on the axon tunnel (HTTP 413).
        @jax.jit
        def eval_losses(sparams, poses, tparams32, image32):
            n = poses.shape[0]
            image_b = jnp.broadcast_to(image32, (n,) + image32.shape[1:])
            t = mode_07.compute_outputs(tcfg, tparams32, image_b, poses)
            gt_posed = t[0].astype(jnp.float32)
            gt_warped = t[2].astype(jnp.float32)
            gt_grid = t[3].astype(jnp.float32)
            student_in = t[mode_07.INDEX_FACE_MORPHED_FULL].astype(compute_dtype)
            outs = siren.siren_morpher_apply_nhwc(
                scfg, sparams, student_in, poses.astype(compute_dtype))
            pred_blended = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
            pred_warped = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
            pred_grid = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
            l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
            mse = jnp.mean((gt_posed - pred_blended) ** 2)
            return (l1(gt_posed, pred_blended), l1(gt_warped, pred_warped),
                    l1(gt_grid, pred_grid), mse)

        def evaluate(sparams):
            acc = np.zeros(4, np.float64)
            nb = args.eval_poses // args.batch
            for i in range(nb):
                poses = jnp.asarray(eval_poses[i * args.batch:(i + 1) * args.batch])
                acc += np.asarray(jax.tree.map(
                    float, eval_losses(sparams, poses, tparams32, image32)))
            acc /= nb
            psnr = 10 * np.log10(4.0 / max(acc[3], 1e-12))  # [-1,1] images
            return {"blended_l1": float(acc[0]), "warped_l1": float(acc[1]),
                    "grid_l1": float(acc[2]), "psnr_vs_f32": float(psnr)}

        return evaluate

    results = {}
    if args.json and os.path.isfile(args.json):
        with open(args.json) as f:
            results = json.load(f).get("results", {})
        print(f"merging into existing arms: {sorted(results)}", flush=True)
    wanted = set(args.arms.split(","))
    arms = [a for a in (
        ("bf16", jnp.bfloat16, None, False),
        ("f32", jnp.float32, None, False),
        # Split: bf16 teacher LABELS (cheap, like --teacher-int8's rationale)
        # + f32 student gradients — isolates which side the bf16 quality
        # cost above comes from.
        ("bf16t+f32s", jnp.float32, jnp.bfloat16, False),
        # Selective-f32 student: bf16 activations/operands, f32 accumulation
        # + sines + head (models/siren.py mixed=True), bf16 teacher labels —
        # the candidate production default if it matches f32 quality at
        # near-bf16 cost.
        ("mixed", jnp.bfloat16, None, True),
    ) if a[0] in wanted]
    for tag, dt, tdt, mixed in arms:
        # Production semantics (distiller/pipeline.py): teacher params, the
        # character image, and the student's master weights all STAY f32;
        # compute_dtype only controls the activation dtype inside the chunk
        # (the apply fns cast weights to the activation dtype per-use).
        tparams = tparams32
        image = image32
        chunk = recipes.make_body_distill_chunk(
            tcfg, scfg, sample_poses, batch_size=args.batch, compute_dtype=dt,
            lookahead=args.lookahead, teacher_dtype=tdt, student_mixed=mixed)
        params = jax.tree.map(jnp.asarray, student0)
        opt = recipes.adam_init(params)
        t0 = time.perf_counter()
        train_loss = float("nan")
        for c in range(n_chunks):
            ckey = jax.random.fold_in(jax.random.PRNGKey(7), c)  # same stream both arms
            params, opt, named = chunk(params, opt, tparams, image, ckey,
                                       jnp.float32(1e-4), weights, n_steps=cs)
            train_loss = float(named["loss"])
            if c == 0 or (c + 1) % 8 == 0 or c == n_chunks - 1:
                el = time.perf_counter() - t0
                print(f"  [{tag}] chunk {c + 1}/{n_chunks}  loss {train_loss:.4f}  "
                      f"{1000 * el / ((c + 1) * cs):.1f} ms/step", flush=True)
        wall = time.perf_counter() - t0
        ev = make_eval()(params)
        results[tag] = {"train_loss": train_loss, "wall_s": wall,
                        "ms_per_step": 1000 * wall / n_steps, **ev}
        print(f"{tag}: {n_steps} steps in {wall:.1f}s ({1000 * wall / n_steps:.1f} ms/step)  "
              f"final-train-loss {train_loss:.4f}", flush=True)
        print("  eval vs f32 teacher: " + "  ".join(f"{k}={v:.5f}" for k, v in ev.items()),
              flush=True)

    d = {}
    if "bf16" in results and "f32" in results:
        d = {k: results["bf16"][k] - results["f32"][k]
             for k in ("blended_l1", "warped_l1", "grid_l1", "psnr_vs_f32")}
        print("delta bf16-f32: " + "  ".join(f"{k}={v:+.5f}" for k, v in d.items()),
              flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"results": results, "delta": d,
                       "examples": n_steps * args.batch, "batch": args.batch,
                       "lookahead": args.lookahead, "lr": 1e-4}, f, indent=2)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
