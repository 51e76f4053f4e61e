"""Probe: forward warp kernel variants at the inference shape (B=1, 512^2 x4).

The fwd kernel's vertical pick+lerp is one f32 folded-one-hot matmul per
channel (ops/pallas_warp._fwd_kernel).  The bwd kernel already uses pure 0/1
one-hots — exact in bf16 — with the lerp on the VPU.  This probe measures
whether the same trick (2 bf16 matmuls + f32 VPU lerp) beats the f32 matmul
in the forward, and whether the halved VMEM footprint lets taller row tiles
(fewer tiles -> less per-tile overhead, which dominates at B=1: th=64/kh=192
measured 1.23 ms vs th=16/kh=128 at 1.37 ms despite 50% more FLOPs).

Run:  python tools/warp_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tha4_tpu.ops import pallas_warp as pw
from tha4_tpu.ops.warp import grid_sample_bilinear_border
from tha4_tpu.utils.profiling import device_timeit


def _fwd_kernel_bf16(gx_ref, gy_ref, img_ref, out_ref, *, h, w, w_mem, kh, kw, th, tw, c):
    _, _, tx, ty, by, bx, ly0, ly1, lx0, lx1 = pw._coords(gx_ref, gy_ref, h, w, w_mem, kh, kw)
    krow = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kh), 2)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (th, tw, kw), 2)
    wdt = jnp.bfloat16 if img_ref.dtype == jnp.bfloat16 else jnp.float32
    oh0 = (krow == ly0[..., None]).astype(wdt).reshape(th * tw, kh)
    oh1 = (krow == ly1[..., None]).astype(wdt).reshape(th * tw, kh)
    ohh = jnp.where(kcol == lx0[..., None], (1.0 - tx)[..., None], 0.0) + jnp.where(
        kcol == lx1[..., None], tx[..., None], 0.0
    )
    dn = (((1,), (0,)), ((), ()))
    for ch in range(c):
        win = img_ref[0, ch, pl.ds(by, kh), pl.ds(bx, kw)].astype(wdt)
        r0 = jax.lax.dot_general(oh0, win, dn, preferred_element_type=jnp.float32).reshape(th, tw, kw)
        r1 = jax.lax.dot_general(oh1, win, dn, preferred_element_type=jnp.float32).reshape(th, tw, kw)
        v = r0 + (r1 - r0) * ty[..., None]
        out_ref[0, ch] = jnp.sum(v * ohh, axis=-1).astype(out_ref.dtype)


def variant_forward(image_nchw, gx, gy, true_w, th, kh, kernel_fn):
    n, c, h, w = image_nchw.shape
    ho, wo = gx.shape[1], gx.shape[2]
    tw = pw._tile_w(wo)
    kw = pw._window(h, w, tw, th)[1]
    kernel = functools.partial(kernel_fn, h=h, w=true_w, w_mem=w, kh=kh, kw=kw, th=th, tw=tw, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n, ho // th, wo // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, th, tw), lambda nn, i, j: (nn, i, j)),
            pl.BlockSpec((1, c, h, w), lambda nn, i, j: (nn, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, th, tw), lambda nn, i, j: (nn, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((n, c, ho, wo), image_nchw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=pw._VMEM_LIMIT,
        ),
    )(gx, gy, image_nchw)


def main():
    key = jax.random.PRNGKey(0)
    n, h, w, c = 1, 512, 512, 4
    image = jax.random.uniform(key, (n, h, w, c), jnp.float32).astype(jnp.bfloat16)
    # Smooth flow field within budget (~30 px).
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w), indexing="ij")
    base = jnp.stack([xx, yy], -1)[None]
    disp = 0.08 * jnp.stack([jnp.sin(3 * yy) * jnp.cos(2 * xx), jnp.cos(3 * xx)], -1)[None]
    grid = (base + disp).astype(jnp.bfloat16)

    ref = grid_sample_bilinear_border(image.astype(jnp.float32), grid.astype(jnp.float32))

    image_nchw = jnp.transpose(image, (0, 3, 1, 2))
    gx = grid[..., 0]
    gy = grid[..., 1]

    # Baseline: production kernel end-to-end.
    t = device_timeit(pw.grid_sample_fast, image, grid, iters=50)
    out = pw.grid_sample_fast(image, grid)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"baseline grid_sample_fast        {t*1e3:7.3f} ms   max|err| {err:.2e}", flush=True)

    for name, th, kh, kern in [
        ("bf16 2-matmul  th=64  kh=192", 64, 192, _fwd_kernel_bf16),
        ("bf16 2-matmul  th=128 kh=256", 128, 256, _fwd_kernel_bf16),
        ("f32 folded     th=128 kh=256", 128, 256, pw._fwd_kernel),
    ]:
        try:
            fn = functools.partial(variant_forward, true_w=w, th=th, kh=kh, kernel_fn=kern)
            t = device_timeit(lambda im, a, b: fn(im, a, b), image_nchw, gx, gy, iters=50)
            out = jnp.transpose(fn(image_nchw, gx, gy), (0, 2, 3, 1))
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            print(f"{name}    {t*1e3:7.3f} ms   max|err| {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001 - probe keeps going past Mosaic limits
            print(f"{name}    FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
