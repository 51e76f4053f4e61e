"""Resize parity with torch interpolate (bilinear, no antialias; legacy nearest)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tha4_tpu.ops import resize


def _torch_resize_bilinear(image_nhwc, size):
    t = torch.from_numpy(image_nhwc).permute(0, 3, 1, 2)
    out = F.interpolate(t, size=size, mode="bilinear", align_corners=False)
    return out.permute(0, 2, 3, 1).numpy()


def test_downsample_512_256(rng):
    image = rng.standard_normal((1, 64, 64, 4)).astype(np.float32)
    ours = np.asarray(resize.resize_bilinear(jnp.asarray(image), (32, 32)))
    theirs = _torch_resize_bilinear(image, (32, 32))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_2x(rng):
    image = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    ours = np.asarray(resize.resize_bilinear(jnp.asarray(image), (32, 48)))
    theirs = _torch_resize_bilinear(image, (32, 48))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_non_integer_ratio(rng):
    image = rng.standard_normal((1, 17, 13, 2)).astype(np.float32)
    ours = np.asarray(resize.resize_bilinear(jnp.asarray(image), (23, 29)))
    theirs = _torch_resize_bilinear(image, (23, 29))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_nearest_2x(rng):
    image = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(resize.upsample_nearest_2x(jnp.asarray(image)))
    t = torch.from_numpy(image).permute(0, 3, 1, 2)
    theirs = F.interpolate(t, scale_factor=2, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_avgpool_2x(rng):
    image = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(resize.downsample_avg_2x(jnp.asarray(image)))
    t = torch.from_numpy(image).permute(0, 3, 1, 2)
    theirs = F.avg_pool2d(t, 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
