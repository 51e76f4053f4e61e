"""Roofline / MFU audit of every hot stage on the real TPU chip.

Prints a markdown table: per stage — measured ms (device_timeit, fetch-
barriered and loop-hoisting-proof), XLA-reported FLOPs and HBM bytes
(compiled cost_analysis), achieved TFLOP/s and GB/s, percent of the v5e
peaks, and which roof binds.  This feeds docs/perf.md (VERDICT round-2
item 3: publish an MFU/roofline account).

Run:  python tools/perf_audit.py [--batch 8] [--iters 30]

Peaks used (TPU v5e / v5 lite, per chip): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  A stage near the HBM roof cannot be made faster by better
kernels at the same dtype/layout — only by fusing away memory traffic.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS_BF16 = 197.0
PEAK_TFLOPS_F32 = 49.0  # v5e MXU f32 ~ 1/4 of bf16
PEAK_GBS = 819.0


def analyze(fn, *args):
    """(compiled_fn, flops, bytes) via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    in_bytes = float(ca.get("bytes accessed", 0.0))
    return compiled, flops, in_bytes


def run_stage(name, fn, *args, iters=30, dtype=jnp.bfloat16, rows=None):
    from tha4_tpu.utils.profiling import device_timeit

    compiled, flops, nbytes = analyze(fn, *args)
    sec = device_timeit(fn, *args, iters=iters)
    ms = sec * 1000.0
    tflops = flops / sec / 1e12
    gbs = nbytes / sec / 1e9
    peak = PEAK_TFLOPS_BF16 if dtype == jnp.bfloat16 else PEAK_TFLOPS_F32
    mfu = 100.0 * tflops / peak
    hbm = 100.0 * gbs / PEAK_GBS
    bound = "MXU" if mfu >= hbm else ("HBM" if hbm > 15.0 else "latency/VPU")
    row = {
        "stage": name, "ms": round(ms, 2), "gflops": round(flops / 1e9, 1),
        "mb": round(nbytes / 1e6, 1), "tflops": round(tflops, 2),
        "gbs": round(gbs, 1), "mfu_pct": round(mfu, 1),
        "hbm_pct": round(hbm, 1), "bound": bound,
    }
    print(f"{name:34s} {ms:8.2f} ms  {flops/1e9:9.1f} GF  {nbytes/1e6:8.1f} MB  "
          f"{tflops:6.2f} TF/s ({mfu:4.1f}%)  {gbs:6.1f} GB/s ({hbm:4.1f}%)  {bound}",
          flush=True)
    if rows is not None:
        rows.append(row)
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--json", default=None, help="also dump rows to this JSON file")
    args = parser.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller import recipes
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.models import body_morpher, eyebrow, face_morpher, siren, upscaler
    from tha4_tpu.poser.modes import mode_07, mode_14

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image1 = jnp.asarray(cm.get_character_image())[None].astype(dt)
    imageB = jnp.broadcast_to(image1, (B,) + image1.shape[1:])
    posesB = sample_poses(key, B).astype(dt)
    pose1 = posesB[:1]

    tcfg = mode_07.TeacherConfig()
    tparams = jax.tree.map(lambda x: x.astype(dt), mode_07.init(key, tcfg))

    print(f"batch={B} dtype=bf16 device={jax.devices()[0]}", flush=True)
    header = (f"{'stage':34s} {'ms':>8s}      {'GFLOP':>9s}  {'MB':>8s}  "
              "achieved TF/s (MFU)   GB/s (HBM%)  bound")
    print(header, flush=True)
    rows = []

    # Every big array/pytree is passed as a function ARGUMENT (closure
    # capture would bake it into the HLO as a constant and overflow the axon
    # remote-compile payload limit); the perturbable activation goes FIRST
    # (device_timeit perturbs the first float leaf to defeat loop hoisting).

    # ---- teacher sub-stages (B8, the distillation configuration) ----------
    def eyebrow_stage(image, pose, tp):
        dec = mode_07.compute_decomposer_outputs(tcfg, tp, image)
        comb = eyebrow.eyebrow_combiner_apply(
            tcfg.eyebrow_combiner, tp[mode_07.KEY_EYEBROW_MORPHING_COMBINER],
            dec[eyebrow.DECOMPOSER_BACKGROUND_LAYER_INDEX],
            dec[eyebrow.DECOMPOSER_EYEBROW_LAYER_INDEX],
            pose[:, :mode_07.NUM_EYEBROW_PARAMS])
        return comb[tcfg.eyebrow_morphed_image_index]

    run_stage("teacher eyebrow dec+comb (128px)", eyebrow_stage,
              imageB, posesB, tparams, iters=args.iters, rows=rows)

    face_in = imageB[:, 32:224, 160:352, :]
    run_stage("teacher face morpher (192px)",
              lambda x, p, tp: face_morpher.apply(
                  tcfg.face_morpher, tp[mode_07.KEY_FACE_MORPHER], x,
                  p[:, mode_07.NUM_EYEBROW_PARAMS:mode_07.NUM_EYEBROW_PARAMS + mode_07.NUM_FACE_PARAMS]),
              face_in, posesB, tparams, iters=args.iters, rows=rows)

    img256 = jax.image.resize(imageB, (B, 256, 256, 4), "linear").astype(dt)
    pose6 = posesB[:, -6:]
    run_stage("teacher body morpher U-Net (256px)",
              lambda x, p, tp: body_morpher.apply(
                  tcfg.body_morpher, tp[mode_07.KEY_BODY_MORPHER], x, p),
              img256, pose6, tparams, iters=args.iters, rows=rows)

    coarse = imageB
    grid = jnp.zeros((B, 512, 512, 2), dt)
    run_stage("teacher upscaler U-Net (512px)",
              lambda r, c, g, p, tp: upscaler.apply(
                  tcfg.upscaler, tp[mode_07.KEY_UPSCALER], r, c, g, p),
              imageB, coarse, grid, pose6, tparams, iters=args.iters, rows=rows)

    def teacher_consumed(image, poses, tp):
        t = mode_07.compute_outputs(tcfg, tp, image, poses)
        return [t[0], t[1], t[2], t[3], t[mode_07.INDEX_FACE_MORPHED_FULL]]

    run_stage("teacher full fwd (loss-consumed)", teacher_consumed,
              imageB, posesB, tparams, iters=args.iters, rows=rows)

    # ---- students ---------------------------------------------------------
    scfg_b = siren.SirenMorpherConfig()
    sparams_b = jax.tree.map(lambda x: x.astype(dt), siren.siren_morpher_init(key, scfg_b))
    run_stage("student body fwd NHWC (train, B)",
              lambda x, p, sp: siren.siren_morpher_apply_nhwc(scfg_b, sp, x, p),
              imageB, posesB, sparams_b, iters=args.iters, rows=rows)

    def body_fwd_bwd(x, p, sp):
        def loss(params):
            outs = siren.siren_morpher_apply_nhwc(scfg_b, params, x, p)
            return jnp.mean(jnp.abs(outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)))
        return jax.grad(loss)(sp)

    run_stage("student body fwd+bwd (train, B)", body_fwd_bwd,
              imageB, posesB, sparams_b, iters=args.iters, rows=rows)

    # Channels-first fused-Pallas alternative (ops/pallas_siren custom_vjp):
    # measured against the NHWC-autodiff row above to pick the train path.
    run_stage("student body fwd CF pallas (B)",
              lambda x, p, sp: siren.siren_morpher_apply(scfg_b, sp, x, p),
              imageB, posesB, sparams_b, iters=args.iters, rows=rows)

    def body_fwd_bwd_cf(x, p, sp):
        def loss(params):
            outs = siren.siren_morpher_apply(scfg_b, params, x, p)
            return jnp.mean(jnp.abs(outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)))
        return jax.grad(loss)(sp)

    run_stage("student body fwd+bwd CF pallas (B)", body_fwd_bwd_cf,
              imageB, posesB, sparams_b, iters=args.iters, rows=rows)

    # ---- full distill steps ----------------------------------------------
    step = recipes.make_body_distill_step(tcfg, scfg_b, compute_dtype=dt)
    opt = recipes.adam_init(sparams_b)
    weights = jnp.asarray([1.0, 2.5, 5.0, 1.0], jnp.float32)

    def body_step_nodonate(image, poses, sp, o_, tp, wts):
        p = jax.tree.map(jnp.copy, sp)
        o = jax.tree.map(jnp.copy, o_)
        p2, o2, m = step(p, o, tp, image[:1], poses, 1e-4, wts)
        # Return the UPDATED params/opt state too: returning only the loss
        # lets XLA dead-code-eliminate the whole backward+Adam (the loss value
        # depends on the forward alone) — measured 114 "ms/step" vs the real
        # 168 before this was caught (tools/scan_probe.py).
        return m["loss"], p2, o2

    run_stage("body distill step (teacher+stu)", body_step_nodonate,
              imageB, posesB, sparams_b, opt, tparams, weights,
              iters=max(10, args.iters // 3), rows=rows)

    # ---- inference path (the headline fps) --------------------------------
    poser = cm.get_poser(compute_dtype=dt)

    def student_frame(image, pose, sp):
        outs = mode_14.compute_outputs(
            poser.face_cfg, poser.body_cfg, sp, image, pose)
        return outs[0]

    run_stage("mode_14 student frame (B=1 infer)", student_frame,
              image1, pose1.astype(dt), poser.params,
              iters=args.iters * 3, dtype=dt, rows=rows)

    if args.json:
        with open(args.json, "wt") as f:
            json.dump(rows, f, indent=1)
        print(f"rows -> {args.json}")


if __name__ == "__main__":
    main()
