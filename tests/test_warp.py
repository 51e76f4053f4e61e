"""grid_sample / apply_grid_change parity with torch (the hot warp path)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tha4_tpu.ops import warp


def test_identity_grid_matches_affine_grid():
    n, c, h, w = 1, 4, 37, 53
    identity = torch.tensor([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).unsqueeze(0)
    base = F.affine_grid(identity, [n, c, h, w], align_corners=False).numpy()[0]
    ours = np.asarray(warp.identity_grid(h, w))
    np.testing.assert_allclose(ours, base, atol=1e-6)


def test_grid_sample_bilinear_border(rng):
    n, h, w, c = 2, 24, 17, 4
    image = rng.standard_normal((n, h, w, c)).astype(np.float32)
    # Grid that goes well out of bounds to exercise border clamping.
    grid = rng.uniform(-1.7, 1.7, size=(n, 20, 31, 2)).astype(np.float32)

    ours = np.asarray(warp.grid_sample_bilinear_border(jnp.asarray(image), jnp.asarray(grid)))

    t_img = torch.from_numpy(image).permute(0, 3, 1, 2)
    t_out = F.grid_sample(
        t_img, torch.from_numpy(grid), mode="bilinear", padding_mode="border", align_corners=False
    )
    theirs = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_apply_grid_change_matches_reference_formula(rng):
    """Against torch composed exactly as reference apply_grid_change
    (reference: src/tha4/nn/image_processing_util.py:13-24)."""
    n, h, w, c = 2, 16, 16, 4
    image = rng.standard_normal((n, h, w, c)).astype(np.float32)
    grid_change_nchw = (0.15 * rng.standard_normal((n, 2, h, w))).astype(np.float32)

    # Ours: NHWC with (x, y) last dim == transpose of the (N,2,H,W) layout.
    gc_nhwc = np.transpose(grid_change_nchw, (0, 2, 3, 1))
    ours = np.asarray(warp.apply_grid_change(jnp.asarray(gc_nhwc), jnp.asarray(image)))

    t_img = torch.from_numpy(image).permute(0, 3, 1, 2)
    gc = torch.from_numpy(grid_change_nchw)
    gc = torch.transpose(gc.view(n, 2, h * w), 1, 2).view(n, h, w, 2)
    identity = torch.tensor([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).unsqueeze(0).repeat(n, 1, 1)
    base_grid = F.affine_grid(identity, [n, c, h, w], align_corners=False)
    t_out = F.grid_sample(t_img, base_grid + gc, mode="bilinear", padding_mode="border", align_corners=False)
    theirs = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_color_and_rgb_change(rng):
    n, h, w = 1, 8, 8
    alpha = rng.uniform(0, 1, (n, h, w, 1)).astype(np.float32)
    color = rng.standard_normal((n, h, w, 4)).astype(np.float32)
    image = rng.standard_normal((n, h, w, 4)).astype(np.float32)

    cc = np.asarray(warp.apply_color_change(alpha, color, image))
    np.testing.assert_allclose(cc, color * alpha + image * (1 - alpha), atol=1e-6)

    rc = np.asarray(warp.apply_rgb_change(alpha, color, image))
    np.testing.assert_allclose(rc[..., 0:3], color[..., 0:3] * alpha + image[..., 0:3] * (1 - alpha), atol=1e-6)
    np.testing.assert_allclose(rc[..., 3:4], image[..., 3:4], atol=1e-6)
