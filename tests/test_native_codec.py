"""Native C++ codec: parity with the numpy path and graceful fallback."""

import numpy as np
import pytest

from tha4_tpu.core import imagecodec as ic
from tha4_tpu.native import loader


def test_build_and_load():
    lib = loader.get_codec_library()
    if lib is None:
        pytest.skip("no compiler available; numpy fallback covers this env")


def test_decode_parity(rng):
    if loader.get_codec_library() is None:
        pytest.skip("native codec unavailable")
    rgba = rng.integers(0, 256, size=(64, 64, 4), dtype=np.uint8)

    native = loader.decode_rgba(rgba, 2.0, -1.0, True)

    ref = rgba.astype(np.float32) / 255.0
    ref[:, :, 0:3] = ic.srgb_to_linear(ref[:, :, 0:3])
    ref[:, :, 0:3] *= ref[:, :, 3:4]
    ref = ref * 2.0 - 1.0
    np.testing.assert_allclose(native, ref, atol=2e-6)


def test_encode_parity(rng):
    if loader.get_codec_library() is None:
        pytest.skip("native codec unavailable")
    img = rng.uniform(-1, 1, size=(32, 32, 4)).astype(np.float32)
    img[..., 3] = rng.uniform(0.2, 1.0, size=(32, 32))  # healthy alpha

    native = loader.encode_rgba(img, 2.0, -1.0, True)

    x = (img + 1.0) / 2.0
    a = np.clip(x[..., 3:4], 0, 1)
    rgb = ic.unpremultiply_alpha(x[..., 0:3], a)
    rgb = ic.linear_to_srgb(rgb)
    ref = np.concatenate([rgb, a], axis=-1)
    ref_u8 = np.rint(ref * 255.0)
    # lround vs rint can differ by 1 at exact .5 boundaries
    assert np.abs(native.astype(np.int32) - ref_u8.astype(np.int32)).max() <= 1


def test_load_image_uses_native_and_matches(tmp_path, rng):
    import PIL.Image

    rgba = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    rgba[..., 3] = np.maximum(rgba[..., 3], 1)
    path = str(tmp_path / "x.png")
    PIL.Image.fromarray(rgba, "RGBA").save(path)

    via_api = ic.load_image_hwc(path)

    ref = rgba.astype(np.float32) / 255.0
    ref[:, :, 0:3] = ic.srgb_to_linear(ref[:, :, 0:3])
    ref[:, :, 0:3] *= ref[:, :, 3:4]
    ref = ref * 2.0 - 1.0
    np.testing.assert_allclose(via_api, ref, atol=2e-6)
