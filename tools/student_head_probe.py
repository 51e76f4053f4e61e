"""Probe 2: the student step's non-SIREN tail.

tools/student_bwd_probe.py shows the three SIREN levels sum to ~28 ms
fwd+bwd while the full student fwd+bwd is ~65 ms.  The difference lives in
the tail: the last He linear head, the 512x512 grid-change warp (and its
gather-gradient), the alpha blend, the inter-level bilinear resizes (whose
transpose is a scatter), and the four L1 loss terms.  Time each in
isolation at training shapes (B8, bf16).

Run:  PYTHONPATH=/root/.axon_site:. python tools/student_head_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    from tha4_tpu.models import siren
    from tha4_tpu.ops import warp
    from tha4_tpu.ops.resize import resize_bilinear
    from tha4_tpu.utils.profiling import device_timeit

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cfg = siren.SirenMorpherConfig()
    params = jax.tree.map(lambda x: x.astype(dt), siren.siren_morpher_init(key, cfg))
    image = jax.random.uniform(key, (B, 512, 512, 4), dt, -1, 1)
    feat = jax.random.uniform(key, (B, 512, 512, 90), dt, -1, 1)
    head_out = jax.random.uniform(key, (B, 512, 512, 7), dt, -1, 1) * 0.1
    grid = jax.random.uniform(key, (B, 512, 512, 2), dt, -0.05, 0.05)
    feat256 = jax.random.uniform(key, (B, 256, 256, 90), dt, -1, 1)

    def t(name, fn, *fargs, iters=args.iters):
        sec = device_timeit(fn, *fargs, iters=iters)
        print(f"{name:52s} {sec * 1e3:8.2f} ms", flush=True)
        return sec * 1e3

    # head linear fwd+bwd (90 -> 7 at 512^2)
    def head_loss(lp, feat):
        return jnp.mean(jnp.abs(siren._linear(lp, feat).astype(jnp.float32)))

    def head_grad(feat, lp):
        return jax.value_and_grad(head_loss, argnums=(0, 1))(lp, feat)

    t("head linear 90->7 @512^2 fwd+bwd", head_grad, feat, params["last_linear"])

    # warp fwd / fwd+bwd w.r.t. grid
    def warp_fwd(grid, image):
        return warp.apply_grid_change(grid, image)

    def warp_loss(grid, image):
        return jnp.mean(jnp.abs(warp.apply_grid_change(grid, image).astype(jnp.float32)))

    def warp_grad(grid, image):
        return jax.value_and_grad(warp_loss)(grid, image)

    t("warp 512^2x4 fwd", warp_fwd, grid, image)
    t("warp 512^2x4 fwd+bwd(grid)", warp_grad, grid, image)

    # full morpher head (warp + blend) fwd+bwd w.r.t. head_out
    def mh_loss(head_out, image):
        outs = siren._morpher_head(head_out, image)
        return sum(jnp.mean(jnp.abs(o.astype(jnp.float32))) for o in outs[:5])

    def mh_grad(head_out, image):
        return jax.value_and_grad(mh_loss)(head_out, image)

    t("morpher head (warp+blend+losses) fwd+bwd", mh_grad, head_out, image)

    # inter-level resize fwd+bwd (256->512, 90ch)
    def rs_loss(x):
        return jnp.mean(jnp.abs(resize_bilinear(x, (512, 512)).astype(jnp.float32)))

    def rs_grad(x):
        return jax.value_and_grad(rs_loss)(x)

    t("resize 256->512 90ch fwd+bwd", rs_grad, feat256)

    # position/pose concat at 512 (materializes a (B,512,512,137) tensor)
    def pp_loss(x):
        ppi = siren._position_and_pose(jnp.ones((B, 45), dt), 512)
        y = jnp.concatenate([resize_bilinear(x, (512, 512)), ppi], axis=-1)
        return jnp.mean(jnp.abs(y.astype(jnp.float32)))

    def pp_grad(x):
        return jax.value_and_grad(pp_loss)(x)

    t("resize+concat pos/pose @512 fwd+bwd", pp_grad, feat256)


if __name__ == "__main__":
    main()
