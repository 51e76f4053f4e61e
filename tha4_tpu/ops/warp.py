"""Appearance-flow warping: bilinear grid sampling and grid-change application.

Semantics are bit-careful matches of the reference's torch usage
(reference: src/tha4/nn/image_processing_util.py:13-54):

  * ``affine_grid(identity, align_corners=False)`` base grid: pixel centers at
    ``(2*j + 1)/W - 1`` in normalized [-1, 1] coordinates.
  * ``grid_sample(mode='bilinear', padding_mode='border',
    align_corners=False)``: unnormalize with ``((g + 1) * size - 1) / 2``,
    clamp the *coordinate* to [0, size-1] (border padding), then bilinear.
  * grid_change layout: the reference carries (N, 2, H, W) with channel 0 = x
    offset; NHWC here means (N, H, W, 2) with last dim (x, y), which is
    already the grid layout — the reference's view/transpose dance
    (image_processing_util.py:16) disappears.

Everything is pure jnp: XLA fuses the coordinate math into the gathers, and
the 4-corner gathers lower to efficient dynamic-gathers on TPU.  Compute is
done in f32 regardless of image dtype (offsets are tiny; bf16 coordinate math
visibly distorts the warp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _identity_grid_np(h: int, w: int):
    import numpy as np

    x = (2.0 * np.arange(w, dtype=np.float32) + 1.0) / w - 1.0
    y = (2.0 * np.arange(h, dtype=np.float32) + 1.0) / h - 1.0
    gx, gy = np.meshgrid(x, y)  # (H, W)
    return np.stack([gx, gy], axis=-1)  # (H, W, 2)


def identity_grid(h: int, w: int) -> jnp.ndarray:
    """Normalized identity sampling grid, shape (H, W, 2), last dim (x, y).

    Equals torch ``affine_grid(eye, [n, c, h, w], align_corners=False)``
    (reference: src/tha4/nn/image_processing_util.py:17-22).
    """
    return jnp.asarray(_identity_grid_np(h, w))


def grid_sample_bilinear_border(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``image`` (N,H,W,C) at ``grid`` (N,Ho,Wo,2) in [-1,1].

    Matches torch ``grid_sample(..., mode='bilinear', padding_mode='border',
    align_corners=False)`` exactly in f32.
    """
    n, h, w, c = image.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # Unnormalize (align_corners=False), then clamp coordinate (border mode).
    ix = jnp.clip(((gx + 1.0) * w - 1.0) * 0.5, 0.0, w - 1.0)
    iy = jnp.clip(((gy + 1.0) * h - 1.0) * 0.5, 0.0, h - 1.0)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0)[..., None]
    ty = (iy - iy0)[..., None]

    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)

    flat = image.reshape(n, h * w, c)

    def gather(iy_idx, ix_idx):
        idx = (iy_idx * w + ix_idx).reshape(n, -1)  # (N, Ho*Wo)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(
            n, grid.shape[1], grid.shape[2], c
        )

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)

    top = v00 + (v01 - v00) * tx
    bottom = v10 + (v11 - v10) * tx
    out = top + (bottom - top) * ty
    return out.astype(image.dtype)


def apply_grid_change(grid_change: jnp.ndarray, image: jnp.ndarray, fast: str = None) -> jnp.ndarray:
    """Warp ``image`` by a grid offset field (both NHWC).

    ``grid_change`` is (N, H, W, 2) with last dim (x, y) normalized offsets;
    equivalent to the reference's apply_grid_change / GridChangeApplier.apply
    (reference: src/tha4/nn/image_processing_util.py:13-54) on the NCHW
    (N, 2, H, W) convention.

    ``fast`` modes (default from $THA4_WARP_MODE, else 'auto'):
      * 'auto'   — Pallas MXU kernel on TPU (~5x faster). Two contracts
        differ from the jnp path: the image is a CONSTANT for autodiff
        (grid-only gradients; see ops.pallas_warp), and displacements beyond
        the kernel's VMEM-window budget (pallas_warp.displacement_budget_px;
        far beyond trained THA4 flows) clamp to the window.
      * 'strict' — like 'auto' but guards the budget at runtime: a
        lax.cond picks the exact jnp path whenever any displacement exceeds
        the window budget, so pathological grids can never clamp silently.
      * 'never'  — pure-jnp reference path (exact semantics, image grads).
    """
    if fast is None:
        import os

        fast = os.environ.get("THA4_WARP_MODE", "auto")
    n, h, w, _ = image.shape
    grid = identity_grid(h, w)[None, ...] + grid_change.astype(jnp.float32)
    if fast != "never":
        from tha4_tpu.ops import pallas_warp

        if pallas_warp.supported(image.shape, grid.shape):
            grid_b = jnp.broadcast_to(grid, (n, h, w, 2))
            if fast == "strict":
                ok = pallas_warp.within_budget(grid_change, image.shape, grid.shape)
                return jax.lax.cond(
                    ok,
                    lambda img, g: pallas_warp.grid_sample_fast(img, g),
                    lambda img, g: grid_sample_bilinear_border(jax.lax.stop_gradient(img), g),
                    image,
                    grid_b,
                )
            return pallas_warp.grid_sample_fast(image, grid_b)
    return grid_sample_bilinear_border(image, grid)


def apply_color_change(alpha, color_change, image):
    """``color_change * alpha + image * (1 - alpha)``
    (reference: src/tha4/nn/image_processing_util.py:57)."""
    return color_change * alpha + image * (1.0 - alpha)


def apply_rgb_change(alpha, color_change, image):
    """Alpha-lerp RGB only, pass through the image's alpha channel
    (reference: src/tha4/nn/image_processing_util.py:6-10). NHWC layout."""
    out_rgb = color_change[..., 0:3] * alpha + image[..., 0:3] * (1.0 - alpha)
    return jnp.concatenate([out_rgb, image[..., 3:4]], axis=-1)
