"""Image codec: sRGB <-> linear, premultiplied alpha, [0,1] <-> [-1,1].

Numerics match the reference implementation exactly
(reference: src/tha4/shion/base/image_util.py:10-33, :127-149, :201-236):

  * sRGB -> linear: piecewise ``x/12.92`` below 0.04045, else
    ``((x+0.055)/1.055)**2.4``, with clipping to [0,1] first.
  * linear -> sRGB: piecewise ``x*12.92`` below 0.003130804953560372, else
    ``1.055*x**(1/2.4) - 0.055``.
  * Device tensors hold *premultiplied-alpha, linear-light* RGBA scaled to
    [-1, 1] (``image * 2 - 1``).

Layout: this package is NHWC end to end (TPU lane dim = channels).  Numpy
images at the host boundary are HWC float32 in [0,1]-ish units; device arrays
are (N, H, W, C).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

_SRGB_LINEAR_THRESHOLD = 0.04045
_LINEAR_SRGB_THRESHOLD = 0.003130804953560372


def srgb_to_linear(x):
    """Piecewise sRGB EOTF. Works on numpy or jnp arrays."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, 0.0, 1.0)
    return xp.where(x <= _SRGB_LINEAR_THRESHOLD, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, 0.0, 1.0)
    return xp.where(x <= _LINEAR_SRGB_THRESHOLD, x * 12.92, 1.055 * (x ** (1.0 / 2.4)) - 0.055)


def unpremultiply_alpha(rgb, alpha, epsilon: float = 1e-5):
    """Straight alpha from premultiplied (reference numpy_alpha_devide)."""
    xp = jnp if isinstance(rgb, jnp.ndarray) else np
    denom = xp.where(xp.abs(alpha) < epsilon, 1.0, alpha)
    return xp.where(xp.abs(alpha) < epsilon, 0.0, rgb / denom)


def load_image_hwc(
    path_or_pil,
    scale: float = 2.0,
    offset: float = -1.0,
    premultiply_alpha: bool = True,
    srgb_to_linear_conversion: bool = True,
) -> np.ndarray:
    """PNG file -> HWC float32 array in model units.

    Mirrors extract_numpy_image_from_PIL_image
    (reference: src/tha4/shion/base/image_util.py:170-186): uint8 -> [0,1],
    sRGB->linear on RGB channels, premultiply by alpha, then
    ``image * scale + offset``.
    """
    import PIL.Image

    pil_image = path_or_pil if hasattr(path_or_pil, "mode") else PIL.Image.open(path_or_pil)
    has_alpha = _pil_has_transparency(pil_image)
    target_mode = "RGBA" if has_alpha else "RGB"
    if pil_image.mode != target_mode:
        pil_image = pil_image.convert(target_mode)

    if has_alpha and srgb_to_linear_conversion:
        # Single-pass native decode (LUT sRGB, premultiply, scale) when the
        # C++ codec is available; exact for u8 inputs.
        from tha4_tpu.native import loader as native

        decoded = native.decode_rgba(
            np.asarray(pil_image, dtype=np.uint8), scale, offset, premultiply_alpha
        )
        if decoded is not None:
            return decoded

    image = np.asarray(pil_image, dtype=np.float32) / 255.0
    if srgb_to_linear_conversion:
        image[:, :, 0:3] = srgb_to_linear(image[:, :, 0:3])
    if has_alpha and premultiply_alpha:
        image[:, :, 0:3] = image[:, :, 0:3] * image[:, :, 3:4]
    return image * scale + offset


def save_image_hwc(
    image: np.ndarray,
    file_name: str,
    scale: float = 2.0,
    offset: float = -1.0,
    straight_alpha: bool = True,
    linear_to_srgb_conversion: bool = True,
) -> None:
    """HWC model-unit array -> PNG (reference image_util.py:201-236)."""
    import PIL.Image

    image = (np.asarray(image, dtype=np.float32) - offset) / scale
    if image.shape[2] == 4:
        rgb = image[:, :, 0:3]
        a = np.clip(image[:, :, 3:4], 0.0, 1.0)
        if straight_alpha:
            rgb = unpremultiply_alpha(rgb, a)
        rgb = linear_to_srgb(rgb) if linear_to_srgb_conversion else np.clip(rgb, 0.0, 1.0)
        out = np.concatenate([rgb, a], axis=2)
        pil = PIL.Image.fromarray(np.uint8(np.rint(out * 255.0)), mode="RGBA")
    else:
        rgb = linear_to_srgb(image) if linear_to_srgb_conversion else np.clip(image, 0.0, 1.0)
        pil = PIL.Image.fromarray(np.uint8(np.rint(rgb * 255.0)), mode="RGB")
    dir_name = os.path.dirname(file_name)
    if dir_name:
        os.makedirs(dir_name, exist_ok=True)
    pil.save(file_name)


def encode_display_u8(image_hwc, scale: float = 2.0, offset: float = -1.0):
    """Model-unit RGBA -> display-ready uint8 RGBA, on device.

    Bit-matches ``save_image_hwc``'s PNG pixel math (straight alpha,
    linear->sRGB, round-to-nearest uint8), but as a pure jnp function so the
    whole postprocess runs on device and the host fetches 1 byte/channel
    instead of 4 — the interactive path is fetch-bandwidth-bound over a
    tunnel-attached chip.  The reference does the same on GPU before `.cpu()`
    (src/tha4/app/character_model_ifacialmocap_puppeteer.py:325-349).
    """
    image = (image_hwc.astype(jnp.float32) - offset) / scale
    rgb = image[..., 0:3]
    a = jnp.clip(image[..., 3:4], 0.0, 1.0)
    rgb = linear_to_srgb(unpremultiply_alpha(rgb, a))
    out = jnp.concatenate([rgb, a], axis=-1)
    return jnp.rint(out * 255.0).astype(jnp.uint8)


def save_image_u8_hwc(image_u8: np.ndarray, file_name: str) -> None:
    """uint8 HWC RGBA/RGB (already display-encoded) -> PNG."""
    import PIL.Image

    image_u8 = np.asarray(image_u8)
    mode = "RGBA" if image_u8.shape[-1] == 4 else "RGB"
    dir_name = os.path.dirname(file_name)
    if dir_name:
        os.makedirs(dir_name, exist_ok=True)
    PIL.Image.fromarray(image_u8, mode=mode).save(file_name)


def to_display_rgba(image_hwc, scale: float = 2.0, offset: float = -1.0):
    """Model units -> displayable [0,1] RGBA (linear->sRGB, keep premultiplied).

    Matches the puppeteer on-device postprocess
    (reference: src/tha4/app/character_model_ifacialmocap_puppeteer.py:325-345).
    """
    xp = jnp if isinstance(image_hwc, jnp.ndarray) else np
    image = (image_hwc - offset) / scale
    rgb = linear_to_srgb(image[..., 0:3])
    a = xp.clip(image[..., 3:4], 0.0, 1.0)
    return xp.concatenate([rgb, a], axis=-1)


def composite_greenscreen(image_hwc, scale: float = 2.0, offset: float = -1.0):
    """Model-unit premultiplied RGBA -> RGB over a green background in sRGB.

    Matches pytorch_rgba_to_numpy_image_greenscreen
    (reference: src/tha4/shion/base/image_util.py:72-90): linear->sRGB of the
    (premultiplied-as-straight) RGB, multiply by alpha, add (1-a) to green.
    """
    xp = jnp if isinstance(image_hwc, jnp.ndarray) else np
    image = (image_hwc - offset) / scale
    rgb = linear_to_srgb(image[..., 0:3])
    a = image[..., 3:4]
    rgb = rgb * a
    green = xp.concatenate([xp.zeros_like(a), 1.0 - a, xp.zeros_like(a)], axis=-1)
    return rgb + green


def _pil_has_transparency(pil_image) -> bool:
    if pil_image.info.get("transparency", None) is not None:
        return True
    if pil_image.mode == "P":
        transparent = pil_image.info.get("transparency", -1)
        for _, index in pil_image.getcolors():
            if index == transparent:
                return True
    elif pil_image.mode == "RGBA":
        extrema = pil_image.getextrema()
        if extrema[3][0] < 255:
            return True
    return False


def hwc_to_nhwc(image: np.ndarray) -> np.ndarray:
    return image[None, ...]


def chw_to_hwc(image: np.ndarray) -> np.ndarray:
    """Torch-layout (C,H,W) -> (H,W,C), for interop at test/convert edges."""
    return np.transpose(image, (1, 2, 0))


def hwc_to_chw(image: np.ndarray) -> np.ndarray:
    return np.transpose(image, (2, 0, 1))


def center_crop_resize(pil_image, size: Tuple[int, int] = (256, 256)):
    """Square center-crop then Lanczos resize (reference image_util.py:239-243)."""
    import PIL.Image

    w, h = pil_image.size
    d = min(w, h)
    r = ((w - d) // 2, (h - d) // 2, (w + d) // 2, (h + d) // 2)
    return pil_image.resize(size, resample=PIL.Image.LANCZOS, box=r)
