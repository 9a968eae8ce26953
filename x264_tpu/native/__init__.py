"""Native (C) runtime components.

The compute path is JAX/XLA on TPU; the inherently-serial byte-emission
tails (CABAC's carry-propagating arithmetic coder) run as small C
extensions on the host, compiled on first use with the system compiler
(the role common/cabac.c's compiled code plays in the reference). A
pure-Python fallback keeps everything functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_lib = None
_tried = False


def load():
    """Compile (once, cached by mtime) and load the native library.
    Returns the ctypes CDLL or None if no toolchain is available."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_SRC_DIR, "cabac.c")
    cache = os.environ.get("X264_TPU_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "x264_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libx264tpu_cabac.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            for cc in ("cc", "gcc", "clang"):
                r = subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", src, "-o", so + ".tmp"],
                    capture_output=True)
                if r.returncode == 0:
                    os.replace(so + ".tmp", so)
                    break
            else:
                return None
        lib = ctypes.CDLL(so)
        lib.cabac_encode.restype = ctypes.c_long
        lib.cabac_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_char_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
