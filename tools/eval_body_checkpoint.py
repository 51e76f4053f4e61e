"""Evaluate a trained body-student checkpoint against its (random) teacher.

The bounded-volume companion to `tools/dtype_ab.py`'s oracle eval: loads
checkpoint N of a distillation run prefix (any index, not just the final
one), rebuilds the SAME random-weight shipped-architecture teacher the run
trained against (`tha4-distill --random-teacher` = `mode_07.init(PRNGKey(0))`),
and reports the held-out-pose-suite metrics in the exact units of the
training-dtype A/B table in docs/perf.md (blended/warped/grid L1 + blended
PSNR vs the f32 teacher), so a volume run's end quality is directly
comparable to the 50k-example A/B arms.

Optionally exports the checkpoint to the reference character-model format
(--export DIR: character_model.yaml + body_morpher.pt + character.png),
reusing the byte-compatible converter the DAG's export task uses
(reference distiller task `export_body_morpher`, distiller_config.py:250-310).

Run (real chip): python tools/eval_body_checkpoint.py _runs/body_full_r5 \
    [--index 12] [--eval-poses 64] [--batch 8] [--json out.json] [--export DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix")
    ap.add_argument("--index", type=int, default=None,
                    help="checkpoint index (default: newest complete one)")
    ap.add_argument("--eval-poses", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--export", default=None, metavar="DIR",
                    help="also export this checkpoint as a character model")
    ap.add_argument(
        "--model",
        default="/root/reference/data/character_models/lambda_00/character_model.yaml",
        help="character model supplying the rest-pose character image")
    args = ap.parse_args()

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.models import siren
    from tha4_tpu.poser.modes import mode_07
    from tha4_tpu.training import checkpoint as ckpt
    from tha4_tpu.utils import fidelity

    config = DistillerConfig.load(os.path.join(args.prefix, "config.yaml"))
    body_prefix = config.body_morpher_prefix()

    scfg = siren.SirenMorpherConfig()
    template = siren.siren_morpher_init(jax.random.PRNGKey(0), scfg)

    index = args.index
    if index is None:
        index = 0
        while os.path.isfile(os.path.join(
                ckpt.checkpoint_dir(body_prefix, index + 1), "module_module.npz")):
            index += 1
        if index == 0:
            sys.exit(f"no complete checkpoints under {body_prefix}")
    path = os.path.join(ckpt.checkpoint_dir(body_prefix, index), "module_module.npz")
    sparams = ckpt.unflatten_into(template, ckpt._load_npz(path))
    print(f"checkpoint {index:04d} ({index * 100_000:,} examples): {path}", flush=True)

    # The SAME teacher the run trained against (--random-teacher semantics).
    tcfg = mode_07.TeacherConfig()
    tparams32 = mode_07.init(jax.random.PRNGKey(0), tcfg)

    from tha4_tpu.charmodel import CharacterModel

    cm = CharacterModel.load(args.model)
    image32 = jnp.asarray(cm.get_character_image())[None].astype(jnp.float32)

    eval_poses = fidelity.random_pose_suite(args.eval_poses, seed=0xE7A1)

    @jax.jit
    def eval_losses(sparams, poses, tparams32, image32):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image32, (n,) + image32.shape[1:])
        t = mode_07.compute_outputs(tcfg, tparams32, image_b, poses)
        gt_posed = t[0].astype(jnp.float32)
        gt_warped = t[2].astype(jnp.float32)
        gt_grid = t[3].astype(jnp.float32)
        student_in = t[mode_07.INDEX_FACE_MORPHED_FULL].astype(jnp.float32)
        outs = siren.siren_morpher_apply_nhwc(scfg, sparams, student_in, poses)
        pred_blended = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
        pred_warped = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
        pred_grid = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
        l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
        mse = jnp.mean((gt_posed - pred_blended) ** 2)
        return (l1(gt_posed, pred_blended), l1(gt_warped, pred_warped),
                l1(gt_grid, pred_grid), mse)

    acc = np.zeros(4, np.float64)
    nb = args.eval_poses // args.batch
    for i in range(nb):
        poses = jnp.asarray(eval_poses[i * args.batch:(i + 1) * args.batch])
        acc += np.asarray(jax.tree.map(
            float, eval_losses(sparams, poses, tparams32, image32)))
    acc /= nb
    psnr = 10 * np.log10(4.0 / max(acc[3], 1e-12))
    result = {"checkpoint": index, "examples": index * 100_000,
              "blended_l1": float(acc[0]), "warped_l1": float(acc[1]),
              "grid_l1": float(acc[2]), "psnr_vs_f32": float(psnr)}
    print("  ".join(f"{k}={v:.5f}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in result.items()), flush=True)

    if args.export:
        from tha4_tpu.convert import export_torch

        os.makedirs(args.export, exist_ok=True)
        export_torch.save_body_morpher_pt(
            sparams, os.path.join(args.export, "body_morpher.pt"))
        print(f"exported body_morpher.pt (checkpoint {index:04d}) to {args.export}",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
