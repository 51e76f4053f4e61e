"""Native (C++) components, loaded via ctypes with Python fallbacks.

Build: ``python -m tha4_tpu.native.build`` (or automatically on first use if
a compiler is present).  Everything here is optional — every caller has a
numpy fallback — so the framework runs in pure-Python environments.
"""

from tha4_tpu.native.loader import get_codec_library

__all__ = ["get_codec_library"]
