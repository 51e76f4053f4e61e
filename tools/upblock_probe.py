"""Decompose the up-path packed resblock's cost (the floor table's worst block).

docs/perf.md's conv-floor table (round 5) shows `res-packed/up 256px 64->64
f2` at 7.67 ms full vs a 3.09 ms conv floor — the single largest block gap in
the upscaler U-Net (reference semantics: unet.py resblock with up-sampling,
/root/reference/src/tha4/nn/common/unet.py:154-239). This probe times the
block's sub-ops in isolation to locate the non-conv milliseconds:

  stats        packed_channel_stats over the input (one full read)
  affine+silu  silu(x*s+b) with precomputed tiled affines (read + write)
  upsample     upsample_nearest_2x_packed (write of the 4x tensor)
  repack       repack(2*f0 -> f1) after the upsample (is it really free?)
  up+repack    the two composed (what the block actually runs, twice:
               once for the activation, once for the identity skip)
  conv0/conv1  the two 3x3 packed convs at the output resolution

and then the whole block for cross-checking. Run on the real chip:

  python tools/upblock_probe.py [--batch 8] [--iters 30]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=256, help="input resolution")
    ap.add_argument("--channels", type=int, default=64)
    args = ap.parse_args()

    from tha4_tpu.models import unet
    from tha4_tpu.ops import nn as tnn
    from tha4_tpu.ops import packed_conv as PC
    from tha4_tpu.utils.profiling import device_timeit

    dt = jnp.bfloat16
    B, S, C = args.batch, args.size, args.channels
    key = jax.random.PRNGKey(0)

    # The block's geometry as _fused_resblock_packed computes it.
    f0 = PC.pack_factor(C, C, S)
    f1 = PC.pack_factor(C, C, 2 * S)
    xp = jax.random.normal(key, (B, S, S // f0, f0 * C), dt)
    print(f"res-packed/up {S}px {C}->{C}  f0={f0} f1={f1}  input {xp.shape} "
          f"({xp.size * 2 / 1e6:.0f} MB bf16)  backend={jax.default_backend()}")

    def t(label, fn, *a):
        ms = device_timeit(fn, *a, iters=args.iters) * 1000
        print(f"  {label:34s} {ms:7.2f} ms")
        return ms

    # --- sub-ops ---------------------------------------------------------
    t("stats (full read)", lambda x: PC.packed_channel_stats(x, f0), xp)

    s = jax.random.normal(key, (B, C), jnp.float32)
    b = s + 1.0
    sv = PC.tile_channel_vector(s, f0).astype(dt)[:, None, None, :]
    bv = PC.tile_channel_vector(b, f0).astype(dt)[:, None, None, :]
    t("affine+silu (read+write)", lambda x: jax.nn.silu(x * sv + bv), xp)

    up = lambda x: PC.upsample_nearest_2x_packed(x, f0)
    t("upsample 2x (write 4x)", up, xp)
    big = up(xp)
    t("repack 2*f0->f1 of the 4x tensor", lambda x: PC.repack(x, 2 * f0, f1), big)
    t("upsample+repack (as the block runs)",
      lambda x: PC.repack(up(x), 2 * f0, f1), xp)

    # --- the convs at output resolution ----------------------------------
    wp = {"w": PC.pack_conv3_weights(
              jax.random.normal(key, (3, 3, C, C), dt) * 0.05, f1),
          "b": PC.tile_channel_vector(jnp.zeros((C,), dt), f1)}
    act_big = PC.repack(up(xp), 2 * f0, f1)
    t("conv0 3x3 (output res)", lambda a: tnn.conv2d(wp, a), act_big)
    h1 = tnn.conv2d(wp, act_big)
    t("stats (output res)", lambda x: PC.packed_channel_stats(x, f1), h1)
    sv1 = PC.tile_channel_vector(s, f1).astype(dt)[:, None, None, :]
    bv1 = PC.tile_channel_vector(b, f1).astype(dt)[:, None, None, :]
    t("affine+silu (output res)", lambda x: jax.nn.silu(x * sv1 + bv1), h1)
    t("conv1 3x3 (output res)", lambda a: tnn.conv2d(wp, a), h1)
    # h1 passed as an argument: closing over it would bake a 4x-res constant
    # into the program and blow the remote-compile request limit.
    t("skip add (output res)", lambda a, hh: a + hh, act_big, h1)
    t("up+repack+add into big (skip path)",
      lambda x, hh: PC.repack(up(x), 2 * f0, f1) + hh, xp, h1)

    # --- the whole block, cross-check ------------------------------------
    p = unet._init_resblock(key, C, C, cond_channels=512, use_cond1=False)
    p = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, p)
    cond = jax.random.normal(key, (B, 512), dt)
    t("WHOLE block (_fused_resblock_packed)",
      lambda x: unet._fused_resblock_packed(p, x, f0, (C,), cond, None, 1.0, "up")[0],
      xp)


if __name__ == "__main__":
    main()
