"""int8 frozen-teacher probe on the real chip.

Three sub-probes (pick with --mode):
  shapes  — raw conv dtype race at packed-flow shapes (bf16 vs int8 vs
            int8+on-the-fly-quantize); the decision-maker for building
            ops/quant.py at all.
  perf    — full-size teacher loss-consumed forward at B8: bf16 vs int8
            (calibrated), the production distillation configuration.
  fidelity— PSNR of the bf16 and int8(+bf16) teacher outputs vs the f32
            teacher at B2, so the int8 labels can be judged against the
            already-locked bf16 production labels.

Results feed docs/perf.md; see ops/quant.py for the design rationale.
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.utils.profiling import device_timeit


def probe_shapes():
    SHAPES = [
        ("512px f4 32ch", 8, 512, 128, 128, 128),
        ("256px f2 64ch", 8, 256, 128, 128, 128),
        ("128px 128ch", 8, 128, 128, 128, 128),
        ("64px 256ch", 8, 64, 64, 256, 256),
        ("32px 512ch", 8, 32, 32, 512, 512),
    ]

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def qdq_static(x, w8, sw):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 32.0), -127, 127).astype(jnp.int8)
        return conv_i8(xq, w8).astype(jnp.float32) * ((1 / 32.0) * sw)

    def qdq_dyn(x, w8, sw):
        sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        return conv_i8(xq, w8).astype(jnp.float32) * (sx * sw)

    rng = np.random.default_rng(0)
    print(f"{'shape':16s} {'bf16':>8s} {'int8':>8s} {'static':>8s} {'dyn':>8s}")
    for name, n, h, wq, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, wq, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.bfloat16)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 32.0), -127, 127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 32.0), -127, 127).astype(jnp.int8)
        sw = jnp.full((co,), 1 / 32.0, jnp.float32)
        t0 = device_timeit(jax.jit(conv_bf16), x, w, iters=300) * 1e3
        t1 = device_timeit(jax.jit(conv_i8), xq, w8, iters=300) * 1e3
        t2 = device_timeit(jax.jit(qdq_static), x, w8, sw, iters=300) * 1e3
        t3 = device_timeit(jax.jit(qdq_dyn), x, w8, sw, iters=300) * 1e3
        print(f"{name:16s} {t0:8.3f} {t1:8.3f} {t2:8.3f} {t3:8.3f}", flush=True)


def _teacher_setup(batch, dtype):
    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.distiller.pose_dataset import sample_poses
    from tha4_tpu.poser.modes import mode_07

    key = jax.random.PRNGKey(0)
    cm = CharacterModel.load(
        "/root/reference/data/character_models/lambda_00/character_model.yaml")
    image1 = jnp.asarray(cm.get_character_image())[None].astype(dtype)
    image = jnp.broadcast_to(image1, (batch,) + image1.shape[1:])
    poses = sample_poses(key, batch).astype(dtype)
    tcfg = mode_07.TeacherConfig()
    tparams = jax.tree.map(lambda x: x.astype(dtype), mode_07.init(key, tcfg))
    return tcfg, tparams, image, poses


def probe_perf(batch=8, iters=30):
    from tha4_tpu.ops import quant
    from tha4_tpu.poser.modes import mode_07

    dt = jnp.bfloat16
    tcfg, tparams, image, poses = _teacher_setup(batch, dt)

    def consumed(image, poses, tp):
        t = mode_07.compute_outputs(tcfg, tp, image, poses)
        return [t[0], t[1], t[2], t[3], t[mode_07.INDEX_FACE_MORPHED_FULL]]

    def consumed_q(scales):
        def fn(image, poses, tp):
            with quant.apply_scales(scales):
                return consumed(image, poses, tp)
        return fn

    print("calibrating...", flush=True)
    scales = quant.run_calibration(consumed, image, poses, tparams)
    print(f"eligible convs: {len(scales)}", flush=True)

    t_bf = device_timeit(consumed, image, poses, tparams, iters=iters) * 1e3
    print(f"teacher consumed bf16 : {t_bf:8.2f} ms", flush=True)
    t_q = device_timeit(consumed_q(scales), image, poses, tparams, iters=iters) * 1e3
    print(f"teacher consumed int8 : {t_q:8.2f} ms  ({t_bf / t_q:.2f}x)", flush=True)
    return scales


def probe_fidelity(batch=2):
    from tha4_tpu.ops import quant
    from tha4_tpu.poser.modes import mode_07

    tcfg, tparams32, image32, poses32 = _teacher_setup(batch, jnp.float32)
    tparams16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tparams32)
    image16, poses16 = image32.astype(jnp.bfloat16), poses32.astype(jnp.bfloat16)

    def consumed(cfgp, image, poses):
        t = mode_07.compute_outputs(tcfg, cfgp, image, poses)
        return [t[0], t[1], t[2], t[3], t[mode_07.INDEX_FACE_MORPHED_FULL]]

    ref = jax.jit(consumed)(tparams32, image32, poses32)
    ref = [np.asarray(r, np.float32) for r in ref]

    out16 = jax.jit(consumed)(tparams16, image16, poses16)
    scales = quant.run_calibration(consumed, tparams16, image16, poses16)

    def consumed_q(cfgp, image, poses):
        with quant.apply_scales(scales):
            return consumed(cfgp, image, poses)

    outq = jax.jit(consumed_q)(tparams16, image16, poses16)

    names = ["posed(0)", "crop_warped(2)", "grid(3)", "alpha(?)", "face_full(5)"]
    print(f"{'output':16s} {'bf16 dB':>9s} {'int8 dB':>9s}")
    for i, name in enumerate(names):
        a = ref[i]
        for tag, o in (("bf16", out16), ("int8", outq)):
            b = np.asarray(o[i], np.float32)
            rng_ = max(float(a.max() - a.min()), 1e-6)
            mse = max(float(np.mean((a - b) ** 2)), 1e-20)
            psnr = 10 * np.log10(rng_ ** 2 / mse)
            if tag == "bf16":
                p16 = psnr
            else:
                pq = psnr
        print(f"{name:16s} {p16:9.1f} {pq:9.1f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["shapes", "perf", "fidelity"], default="perf")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    if a.mode == "shapes":
        probe_shapes()
    elif a.mode == "perf":
        probe_perf(a.batch, a.iters)
    else:
        probe_fidelity(a.batch)
