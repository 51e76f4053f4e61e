"""Selective-precision sweep for the mode_14 student inference path.

The production bf16 path measures ~32 dB PSNR vs f32 (README perf table;
tests/test_mode_14_parity.py::test_bfloat16_production_path_golden).  This
probe decomposes WHERE the bf16 error comes from by emulating the fused
kernel's exact rounding semantics (ops/pallas_siren._make_kernel: bf16 GEMM
inputs, f32 accumulate, f32 sine, cast activations to storage dtype between
layers) in plain f32 jnp with explicit quantization casts, then selectively
upgrading one source at a time:

  bf16-all        everything quantized (emulates today's production path)
  +pos-f32        f32 position grid (today pos is cast to bf16: at 512^2 the
                  bf16 grid spacing near |x|=1 is 1-2 PIXELS, so edge pixels
                  alias -- the suspected dominant error)
  +head-f32       + f32 head weights/output + f32 warp/blend tail
  +first-w-f32    + f32 first-sine-layer weights (each net)
  +weights-f32    + ALL weights f32, storage still bf16 (emulates the MXU
                  'high' 3-pass tier, which multiplies at ~f32 precision
                  while activations stay bf16 between layers)
  f32             full f32 (sanity: = golden)

The whole emulation runs under jax.default_matmul_precision("highest") so
the explicit _q() casts are the ONLY quantization anywhere — without this,
on TPU the plain f32 `@` runs as a 1-pass bf16 MXU multiply and every
variant silently collapses to ~32 dB (the first run of this tool did
exactly that; the f32-all sanity row now guards against it).

Run:  python tools/precision_sweep.py [--poses 8]

Output: PSNR / windowed-SSIM per variant vs the f32 golden render on
output 0 (the blended 512x512 frame), shipped lambda_00 weights.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _q(x, dt):
    """Quantize to dtype dt, return f32 (emulate 'stored/multiplied at dt')."""
    return x.astype(dt).astype(jnp.float32)


def _sine_chain(parts, layers, final, omega, sd, w_dt_first, w_dt, w_dt_final):
    """parts: list of (array f32 (..., C)).  Kernel semantics: concat inputs,
    per-layer GEMM with quantized weights/inputs, f32 accumulate, f32 sine,
    storage-quantize activations between layers."""
    from tha4_tpu.ops.pallas_siren import _fast_sin

    h = jnp.concatenate(parts, axis=-1)
    for li, layer in enumerate(layers):
        wdt = w_dt_first if li == 0 else w_dt
        pre = _q(h, sd) @ _q(layer["w"], wdt) + layer["b"].astype(jnp.float32)
        h = _q(_fast_sin(omega * pre), sd)
    if final is not None:
        h = _q(h, sd) @ _q(final["w"], w_dt_final) + final["b"].astype(jnp.float32)
    return h


def render_variant(face_cfg, body_cfg, params, image, pose, v):
    """Variant-aware mode_14.compute_outputs: returns the blended frame f32."""
    from tha4_tpu.models import siren
    from tha4_tpu.ops import warp
    from tha4_tpu.ops.resize import resize_bilinear
    from tha4_tpu.poser.modes import mode_14

    f32 = jnp.float32
    sd = v["storage"] if not v.get("storage_f32") else f32
    pos_dt = f32 if v["pos_f32"] else v["storage"]
    w_dt = f32 if v["weights_f32"] else v["storage"]
    w_dt_first = f32 if (v["first_w_f32"] or v["weights_f32"]) else v["storage"]
    w_dt_final = f32 if (v["head_f32"] or v["weights_f32"]) else v["storage"]
    out_dt = f32 if v["head_f32"] else v["storage"]

    image = _q(image, f32 if v.get("image_f32") else v["storage"])
    pose_q = _q(pose, f32 if v.get("pose_f32") else v["storage"])

    def grid(s):
        return _q(warp.identity_grid(s, s), pos_dt)

    # -- face student (siren_face_morpher_apply semantics) ------------------
    fp = params[mode_14.KEY_FACE_MORPHER]["siren"]
    n = pose.shape[0]
    s = face_cfg.image_size
    pos = jnp.broadcast_to(grid(s)[None], (n, s, s, 2))
    pb = jnp.broadcast_to(pose_q[:, None, None, : face_cfg.pose_size], (n, s, s, face_cfg.pose_size))
    face_out = _sine_chain(
        [pos, pb], fp["sine_layers"], fp["last_linear"], face_cfg.siren.omega0,
        sd, w_dt_first, w_dt, w_dt_final,
    )
    face_out = _q(face_out, out_dt)

    y0 = mode_14.FACE_CENTER_Y - mode_14.FACE_HALF
    x0 = mode_14.FACE_CENTER_X - mode_14.FACE_HALF
    body_input = jax.lax.dynamic_update_slice(image, _q(face_out, sd), (0, y0, x0, 0))

    # -- body student (siren_morpher_apply semantics) -----------------------
    bp = params[mode_14.KEY_BODY_MORPHER]
    x = None
    for i, lv in enumerate(body_cfg.levels):
        s = lv.image_size
        pos = jnp.broadcast_to(grid(s)[None], (n, s, s, 2))
        pb = jnp.broadcast_to(pose_q[:, None, None, :], (n, s, s, body_cfg.pose_size))
        parts = [pos, pb]
        if i > 0:
            parts.insert(0, _q(resize_bilinear(x, (s, s)), sd))
        final = bp["last_linear"] if i == len(body_cfg.levels) - 1 else None
        x = _sine_chain(parts, bp["levels"][i], final, 30.0, sd, w_dt_first, w_dt, w_dt_final)

    out = _q(x, out_dt)
    grid_change = out[..., 0:2]
    alpha = out[..., 2:3]
    color_change = out[..., 3:]
    warped = _q(warp.apply_grid_change(grid_change, body_input, fast="never"), out_dt)
    blended = (1.0 - alpha) * warped + alpha * color_change
    return _q(blended, out_dt)


_ALL_OFF = dict(pos_f32=False, head_f32=False, first_w_f32=False, weights_f32=False,
                storage_f32=False, image_f32=False, pose_f32=False)
_ALL_ON = dict(pos_f32=True, head_f32=True, first_w_f32=True, weights_f32=True,
               storage_f32=True, image_f32=True, pose_f32=True)


def _on(**kw):
    return {**_ALL_OFF, **kw}


def _only(**kw):
    """Everything f32 EXCEPT the named sources (isolation ablation)."""
    return {**_ALL_ON, **{k: False for k in kw if kw[k]}}


VARIANTS = [
    ("f32-all", _ALL_ON),  # sanity: must be ~lossless vs golden
    ("bf16-all", _ALL_OFF),
    ("+pos-f32", _on(pos_f32=True)),
    ("+head-f32", _on(pos_f32=True, head_f32=True)),
    ("+first-w-f32", _on(pos_f32=True, head_f32=True, first_w_f32=True)),
    ("+storage-f32", _on(pos_f32=True, head_f32=True, storage_f32=True)),
    ("only-storage", _only(storage_f32=True)),
    ("only-weights", _only(weights_f32=True, first_w_f32=True, head_f32=True)),
    ("only-first-w", _only(first_w_f32=True)),
    ("only-pose", _only(pose_f32=True)),
    ("only-image", _only(image_f32=True)),
    ("only-pos", _only(pos_f32=True)),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--poses", type=int, default=6)
    parser.add_argument(
        "--model",
        default="/root/reference/data/character_models/lambda_00/character_model.yaml",
    )
    parser.add_argument(
        "--fps-only",
        action="store_true",
        help="skip the selective-f32 VARIANTS quality loop (its PSNR/SSIM "
        "numbers are dtype-math only and do not drift with kernel perf "
        "changes); re-measure just the production (storage dtype, MXU tier) "
        "ladder — PSNR + fps.",
    )
    args = parser.parse_args()

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.poser.modes import mode_14
    from tha4_tpu.utils import fidelity

    cm = CharacterModel.load(args.model)
    poser = cm.get_poser()  # f32
    face_cfg, body_cfg = poser.face_cfg, poser.body_cfg
    params = poser.params
    image = jnp.asarray(cm.get_character_image())[None]
    poses = fidelity.random_pose_suite(args.poses, seed=7)

    golden = []
    for p in poses:
        golden.append(np.asarray(poser.pose(image, p[None]))[0])

    rows = []
    for name, flags in ([] if args.fps_only else VARIANTS):
        v = dict(storage=jnp.bfloat16, **flags)

        # One compiled program per variant (flags are trace-time constants).
        # The "highest" context INSIDE the traced fn makes the explicit _q()
        # casts the only quantization anywhere — without it, on TPU the
        # plain f32 `@` runs as a 1-pass bf16 MXU multiply and every variant
        # collapses to ~32 dB (the first run of this tool did exactly that).
        @jax.jit
        def render(params, image, pose, _v=v):
            with jax.default_matmul_precision("highest"):
                return render_variant(face_cfg, body_cfg, params, image, pose, _v)

        ps, ss = [], []
        for k, p in enumerate(poses):
            frame = np.asarray(render(params, image, jnp.asarray(p)[None]))[0]
            ps.append(fidelity.psnr(golden[k], frame))
            ss.append(fidelity.ssim(golden[k], frame))
        rows.append((name, min(ps), float(np.mean(ps)), min(ss)))
        print(f"{name:14s} PSNR min {min(ps):6.2f} dB  mean {np.mean(ps):6.2f} dB  SSIM min {min(ss):.4f}",
              flush=True)

    # ---- ACTUAL candidate production paths: (storage dtype, MXU tier) -----
    # PSNR/SSIM vs the f32 golden + measured fps on this chip (scan-amortized
    # animated pose sweep, same harness as bench.py).
    import time

    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    pp = get_pose_parameters()
    idx = {g.get_group_name(): g.get_parameter_index() for g in pp.get_pose_parameter_groups()}
    print()
    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for prec in ("default", "high", "highest"):
            poser = cm.get_poser(compute_dtype=dt, matmul_precision=prec)
            ps, ss = [], []
            for k, p in enumerate(poses):
                frame = np.asarray(poser.pose(image, jnp.asarray(p)[None]))[0]
                ps.append(fidelity.psnr(golden[k], frame))
                ss.append(fidelity.ssim(golden[k], frame))

            fcfg2, bcfg2 = poser.face_cfg, poser.body_cfg
            n = 200

            @jax.jit
            def frames(params, image_a, p0, _dt=dt, _prec=prec, _f=fcfg2, _b=bcfg2):
                from tha4_tpu.poser.modes import mode_14 as m14

                def body(c, i):
                    pose = p0.at[0, idx["head_y"]].set(jnp.sin(i / 10.0)).astype(_dt)
                    with jax.default_matmul_precision(_prec):
                        outs = m14.compute_outputs(_f, _b, params, image_a.astype(_dt), pose)
                    return c + outs[0].astype(jnp.float32).mean(), ()

                c, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
                return c

            p0 = jnp.asarray(poses[0])[None]
            float(frames(poser.params, image, p0))  # compile
            t0 = time.perf_counter()
            float(frames(poser.params, image, p0))
            fps = n / (time.perf_counter() - t0)
            tag = f"{dt_name}/{prec}"
            sanity = "  (=golden)" if dt == jnp.float32 and prec == "highest" else ""
            print(f"{tag:14s} PSNR min {min(ps):6.2f} dB  mean {np.mean(ps):6.2f} dB  "
                  f"SSIM min {min(ss):.4f}  {fps:7.1f} fps{sanity}", flush=True)


if __name__ == "__main__":
    main()
