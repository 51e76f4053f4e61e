"""Decompose the body student's fwd+bwd cost (the worst roofline row).

docs/perf.md: student fwd+bwd at training shapes (B8, NHWC, bf16) measures
~65 ms at 9% MFU / 45% HBM — neither roof binds, so *something else* does.
This probe splits the cost three ways to find it:

  1. per-level fwd+bwd — which coarse-to-fine level dominates
     (128px/360ch vs 256px/180ch vs 512px/90ch);
  2. dX-only vs dW-only per level — whether the huge-K skinny dW matmuls
     ((C, N*H*W) @ (N*H*W, C) with C=90..360) are the sink;
  3. remat variants — jax.checkpoint over each level (recompute activations
     in the backward instead of storing them) and a channel-padded variant
     (widths rounded up to 128 lanes with structural zeros).

Run:  python tools/student_bwd_probe.py [--batch 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    from tha4_tpu.models import siren
    from tha4_tpu.ops.resize import resize_bilinear
    from tha4_tpu.utils.profiling import device_timeit

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cfg = siren.SirenMorpherConfig()
    params = jax.tree.map(lambda x: x.astype(dt), siren.siren_morpher_init(key, cfg))
    image = jax.random.uniform(key, (B, 512, 512, 4), dt, -1, 1)
    pose = jax.random.uniform(key, (B, 45), dt, 0, 1)

    def t(name, fn, *fargs, iters=args.iters):
        sec = device_timeit(fn, *fargs, iters=iters)
        print(f"{name:48s} {sec * 1e3:8.2f} ms", flush=True)
        return sec * 1e3

    # --- baseline: full fwd / full fwd+bwd --------------------------------
    def full_fwd(pose, params, image):
        outs = siren.siren_morpher_apply_nhwc(cfg, params, image, pose)
        return outs[0]

    def full_loss(params, pose, image):
        outs = siren.siren_morpher_apply_nhwc(cfg, params, image, pose)
        return sum(jnp.mean(jnp.abs(o.astype(jnp.float32))) for o in outs[:5])

    def full_grad(pose, params, image):
        l, g = jax.value_and_grad(full_loss)(params, pose, image)
        return l, g

    t("full fwd", full_fwd, pose, params, image)
    base = t("full fwd+bwd", full_grad, pose, params, image)

    # --- per-level fwd+bwd -------------------------------------------------
    # Level i in isolation: feed it a constant input of the right shape and
    # grad w.r.t. that level's params only.
    def level_io_shapes():
        shapes = []
        for i, lv in enumerate(cfg.levels):
            cin = (cfg.levels[i - 1].intermediate_channels if i else 0)
            shapes.append((lv.image_size, cin))
            # output channels of level i's last layer:
        return shapes

    for i, lv in enumerate(cfg.levels):
        s = lv.image_size
        if i == 0:
            xin = None
        else:
            prev_c = cfg.levels[i].intermediate_channels  # after first layer concat path uses prev level out = this level's C
            # level i's input x is the *previous level's output*, which has
            # cfg.levels[i].intermediate_channels channels (init: last layer of
            # level i-1 maps to C_i).
            xin = jax.random.uniform(key, (B, s // 2, s // 2, prev_c), dt, -1, 1)

        def level_loss(lp, pose, xin, i=i, lv=lv):
            pp = siren._position_and_pose(pose, lv.image_size)
            if i == 0:
                x = pp
            else:
                x = resize_bilinear(xin, (lv.image_size, lv.image_size))
                x = jnp.concatenate([x, pp], axis=-1)
            for layer in lp:
                x = siren._sine_linear(layer, x, 30.0)
            return jnp.mean(jnp.abs(x.astype(jnp.float32)))

        def level_grad(pose, lp, xin, i=i, lv=lv):
            return jax.value_and_grad(level_loss)(lp, pose, xin)

        lp = params["levels"][i]
        t(f"level {i} ({s}px/{lv.intermediate_channels}ch) fwd+bwd", level_grad, pose, lp, xin)

        # dX-only: grads w.r.t. the level INPUT (weights constant)
        if i > 0:
            def level_grad_x(pose, xin, lp, i=i, lv=lv):
                return jax.value_and_grad(lambda xi: level_loss(lp, pose, xi))(xin)
            t(f"level {i} dX-only", level_grad_x, pose, xin, lp)

    # --- remat over levels ---------------------------------------------
    def full_loss_remat(params, pose, image):
        x = None
        for i, lv in enumerate(cfg.levels):
            def run_level(lp, x, pose, i=i, lv=lv):
                pp = siren._position_and_pose(pose, lv.image_size)
                if i == 0:
                    y = pp
                else:
                    y = resize_bilinear(x, (lv.image_size, lv.image_size))
                    y = jnp.concatenate([y, pp], axis=-1)
                for layer in lp:
                    y = siren._sine_linear(layer, y, 30.0)
                return y
            x = jax.checkpoint(run_level)(params["levels"][i], x, pose)
        outs = siren._morpher_head(siren._linear(params["last_linear"], x), image)
        return sum(jnp.mean(jnp.abs(o.astype(jnp.float32))) for o in outs[:5])

    def full_grad_remat(pose, params, image):
        return jax.value_and_grad(full_loss_remat)(params, pose, image)

    t("full fwd+bwd, remat each level", full_grad_remat, pose, params, image)

    # --- channel-padded variant -----------------------------------------
    # Round every intermediate width up to a lane multiple (128) with zero
    # weights; zero-padded outputs receive zero gradients so numerics of the
    # unpadded slice are preserved (not asserted here — this is a *timing*
    # probe; if it wins, productionize with parity tests).
    def pad_to(v, m=128):
        return (v + m - 1) // m * m

    pcfg = siren.SirenMorpherConfig(levels=tuple(
        siren.SirenMorpherLevelConfig(lv.image_size, pad_to(lv.intermediate_channels), lv.num_sine_layers)
        for lv in cfg.levels))
    pparams = jax.tree.map(lambda x: x.astype(dt), siren.siren_morpher_init(key, pcfg))

    def padded_loss(params, pose, image):
        outs = siren.siren_morpher_apply_nhwc(pcfg, params, image, pose)
        return sum(jnp.mean(jnp.abs(o.astype(jnp.float32))) for o in outs[:5])

    def padded_grad(pose, params, image):
        return jax.value_and_grad(padded_loss)(params, pose, image)

    t("full fwd+bwd, widths padded to 128", padded_grad, pose, pparams, image)


if __name__ == "__main__":
    main()
