"""Build-on-first-use loader for the native codec (ctypes C ABI).

No pybind11 in the target image, so the extension is a plain shared object
compiled with g++ -O3 and called through ctypes.  Missing compiler or failed
build -> returns None and callers use their numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(src: str, out: str, extra=()) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", *extra, "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # -march=native can fail on exotic hosts; retry generic.
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", *extra, "-o", out, src],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def get_codec_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        here = os.path.dirname(__file__)
        src = os.path.join(here, "codec.cpp")
        out = os.path.join(here, "_codec.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.tha4_decode_rgba.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.tha4_encode_rgba.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ]
        _lib = lib
        return _lib


_mocap_lib: Optional[ctypes.CDLL] = None
_mocap_tried = False


def get_mocap_library() -> Optional[ctypes.CDLL]:
    """The native UDP drain-thread receiver (mocap_receiver.cpp), or None."""
    global _mocap_lib, _mocap_tried
    with _lock:
        if _mocap_lib is not None or _mocap_tried:
            return _mocap_lib
        _mocap_tried = True
        here = os.path.dirname(__file__)
        src = os.path.join(here, "mocap_receiver.cpp")
        out = os.path.join(here, "_mocap_receiver.so")
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            if not _build(src, out, extra=("-pthread",)):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.tha4_mocap_rx_start.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int
        ]
        lib.tha4_mocap_rx_start.restype = ctypes.c_void_p
        lib.tha4_mocap_rx_read.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_ulonglong),
        ]
        lib.tha4_mocap_rx_read.restype = ctypes.c_longlong
        lib.tha4_mocap_rx_stop.argtypes = [ctypes.c_void_p]
        _mocap_lib = lib
        return _mocap_lib


def decode_rgba(rgba_u8, scale: float, offset: float, premultiply: bool):
    """(H, W, 4) u8 -> (H, W, 4) f32 model units, or None if unavailable."""
    import numpy as np

    lib = get_codec_library()
    if lib is None:
        return None
    src = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    dst = np.empty(src.shape, np.float32)
    lib.tha4_decode_rgba(
        src.ctypes.data, dst.ctypes.data, src.shape[0] * src.shape[1],
        ctypes.c_float(scale), ctypes.c_float(offset), int(premultiply),
    )
    return dst


def encode_rgba(image_f32, scale: float, offset: float, unpremultiply: bool, epsilon: float = 1e-5):
    """(H, W, 4) f32 model units -> (H, W, 4) u8 sRGB, or None."""
    import numpy as np

    lib = get_codec_library()
    if lib is None:
        return None
    src = np.ascontiguousarray(image_f32, dtype=np.float32)
    dst = np.empty(src.shape, np.uint8)
    lib.tha4_encode_rgba(
        src.ctypes.data, dst.ctypes.data, src.shape[0] * src.shape[1],
        ctypes.c_float(scale), ctypes.c_float(offset), int(unpremultiply),
        ctypes.c_float(epsilon),
    )
    return dst
