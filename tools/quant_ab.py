"""A/B: does the int8 frozen teacher change the distillation OUTCOME?

Two body-student trainings from the same init and the same pose stream —
one against the bf16 teacher (production default), one against the int8
teacher (ops/quant.py) — then both students are evaluated against the
*float32* teacher's labels on a held-out pose set.  If the eval losses
match, the int8 labels' extra quantization noise does not change what the
student learns (at this horizon); if the int8 arm is worse, the noise is
biasing training, not just averaging out.

Run:  python tools/quant_ab.py [--steps 1500] [--batch 8] [--eval-batches 8]

Uses the randomly-initialized shipped-architecture teacher (the pretrained
.pt files are placeholders in this bundle) — which is the HARDER case for
PTQ: random U-Nets have no learned structure for the quantizer to ride.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-batches", type=int, default=8)
    args = ap.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller import recipes
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.models import siren
    from tha4_tpu.ops import quant
    from tha4_tpu.poser.modes import mode_07

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image = jnp.asarray(cm.get_character_image())[None].astype(dt)

    tcfg = mode_07.TeacherConfig()
    tparams32 = mode_07.init(key, tcfg)
    tparams = jax.tree.map(lambda x: x.astype(dt), tparams32)

    scfg = siren.SirenMorpherConfig()
    student0 = jax.tree.map(np.asarray, siren.siren_morpher_init(key, scfg))
    weights = jnp.asarray([1.0, 2.5, 5.0, 1.0], jnp.float32)

    img8 = jnp.broadcast_to(image, (args.batch,) + image.shape[1:])
    scales = quant.run_calibration(
        lambda tp, i, p: mode_07.compute_outputs(tcfg, tp, i, p),
        tparams, img8, sample_poses(key, args.batch).astype(dt))
    print(f"calibrated {len(scales)} convs", flush=True)

    # ---- f32 oracle eval: student loss terms against the f32 teacher ------
    image32 = image.astype(jnp.float32)

    @jax.jit
    def eval_losses(sparams, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image32, (n,) + image32.shape[1:])
        t = mode_07.compute_outputs(tcfg, tparams32, image_b, poses.astype(jnp.float32))
        gt_posed = t[0].astype(jnp.float32)
        gt_warped = t[2].astype(jnp.float32)
        gt_grid = t[3].astype(jnp.float32)
        student_in = t[mode_07.INDEX_FACE_MORPHED_FULL].astype(dt)
        outs = siren.siren_morpher_apply_nhwc(scfg, sparams, student_in, poses.astype(dt))
        pred_blended = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
        pred_warped = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
        pred_grid = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
        l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
        mse = jnp.mean((gt_posed - pred_blended) ** 2)
        return l1(gt_posed, pred_blended), l1(gt_warped, pred_warped), l1(gt_grid, pred_grid), mse

    def evaluate(sparams):
        ekey = jax.random.PRNGKey(0xE7A1)
        acc = np.zeros(4, np.float64)
        for i in range(args.eval_batches):
            poses = sample_poses(jax.random.fold_in(ekey, i), args.batch)
            acc += np.asarray(jax.tree.map(float, eval_losses(sparams, poses)))
        acc /= args.eval_batches
        psnr = 10 * np.log10(4.0 / max(acc[3], 1e-12))  # [-1,1] images: range 2
        return {"blended_l1": acc[0], "warped_l1": acc[1], "grid_l1": acc[2], "psnr_vs_f32": psnr}

    # ---- train both arms on the SAME pose stream --------------------------
    results = {}
    for tag, tq in (("bf16", None), ("int8", scales)):
        chunk = recipes.make_body_distill_chunk(
            tcfg, scfg, sample_poses, batch_size=args.batch, compute_dtype=dt,
            lookahead=1, teacher_quant=tq)
        params = jax.tree.map(lambda x: jnp.asarray(x).astype(dt), student0)
        opt = recipes.adam_init(params)
        ckey = jax.random.PRNGKey(7)  # identical stream for both arms
        t0 = time.perf_counter()
        params, opt, named = chunk(params, opt, tparams, image, ckey, jnp.float32(1e-4),
                                   weights, n_steps=args.steps)
        train_loss = float(named["loss"])
        wall = time.perf_counter() - t0
        ev = evaluate(params)
        results[tag] = ev
        print(f"{tag}: {args.steps} steps in {wall:.1f}s ({1000*wall/args.steps:.1f} ms/step)  "
              f"final-train-loss {train_loss:.4f}", flush=True)
        print(f"  eval vs f32 teacher: " + "  ".join(f"{k}={v:.5f}" for k, v in ev.items()), flush=True)

    d = {k: results["int8"][k] - results["bf16"][k] for k in results["bf16"]}
    print("delta int8-bf16: " + "  ".join(f"{k}={v:+.5f}" for k, v in d.items()), flush=True)


if __name__ == "__main__":
    main()
