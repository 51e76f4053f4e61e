"""Image codec parity with the reference formulas (torch oracle)."""

import numpy as np
import torch

from tha4_tpu.core import imagecodec as ic


def torch_srgb_to_linear(x):
    x = torch.clip(x, 0.0, 1.0)
    return torch.where(torch.le(x, 0.04045), x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def torch_linear_to_srgb(x):
    x = torch.clip(x, 0.0, 1.0)
    return torch.where(torch.le(x, 0.003130804953560372), x * 12.92, 1.055 * (x ** (1.0 / 2.4)) - 0.055)


def test_srgb_roundtrip(rng):
    x = rng.uniform(-0.2, 1.2, size=(64, 64)).astype(np.float32)
    lin = ic.srgb_to_linear(x)
    ref = torch_srgb_to_linear(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(lin, ref, atol=1e-7)

    back = ic.linear_to_srgb(lin)
    ref2 = torch_linear_to_srgb(torch.from_numpy(ref)).numpy()
    np.testing.assert_allclose(back, ref2, atol=1e-7)
    np.testing.assert_allclose(back, np.clip(x, 0, 1), atol=1e-5)


def test_load_save_roundtrip(tmp_path, rng):
    import PIL.Image

    rgba = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    rgba[..., 3] = np.maximum(rgba[..., 3], 8)  # avoid fully transparent pixels
    src = tmp_path / "src.png"
    PIL.Image.fromarray(rgba, mode="RGBA").save(src)

    img = ic.load_image_hwc(str(src))
    assert img.shape == (32, 32, 4)
    assert img.min() >= -1.0 and img.max() <= 1.0

    dst = tmp_path / "dst.png"
    ic.save_image_hwc(img, str(dst))
    rgba2 = np.asarray(PIL.Image.open(dst))
    # Premultiply + srgb round trips lose at most ~1 ulp of u8 per channel
    # except where alpha is tiny (quantization of premultiplied values).
    a = rgba[..., 3:4].astype(np.int32)
    mask = np.repeat(a > 32, 4, axis=2)
    diff = np.abs(rgba2.astype(np.int32) - rgba.astype(np.int32))
    assert diff[mask].max() <= 6


def test_premultiply_matches_reference_pipeline(tmp_path, rng):
    """Full load path vs reference extract_pytorch_image_from_PIL_image."""
    import sys

    from tests.conftest import add_reference_to_path, reference_available

    if not reference_available():
        return
    add_reference_to_path()
    import PIL.Image
    from tha4.shion.base.image_util import extract_pytorch_image_from_PIL_image

    rgba = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    rgba[0, 0, 3] = 0
    pil = PIL.Image.fromarray(rgba, mode="RGBA")

    ours = ic.load_image_hwc(pil)  # HWC
    theirs = extract_pytorch_image_from_PIL_image(pil).numpy()  # CHW
    np.testing.assert_allclose(ours, ic.chw_to_hwc(theirs), atol=1e-6)


def test_encode_display_u8_matches_save_image_hwc(tmp_path, rng):
    """The on-device display encode used by the puppeteer's pipelined path
    must produce the same PNG bytes as the host-side save_image_hwc."""
    import jax.numpy as jnp
    import PIL.Image

    img = (rng.random((24, 24, 4)).astype(np.float32) * 2.0 - 1.0)
    img[0, 0, 3] = -1.0  # fully transparent pixel exercises unpremultiply eps

    ref = tmp_path / "ref.png"
    ic.save_image_hwc(img, str(ref))
    via_u8 = np.asarray(ic.encode_display_u8(jnp.asarray(img)))
    np.testing.assert_array_equal(via_u8, np.asarray(PIL.Image.open(ref)))
