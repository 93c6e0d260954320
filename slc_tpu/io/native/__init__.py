"""ctypes loader for the native I/O library, building it on demand.

``lib()`` returns the loaded CDLL or None (no compiler / build failure),
in which case callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "slc_io.cpp")
_SO = os.path.join(_DIR, "libslc_io.so")

_lock = threading.Lock()
_lib: "ctypes.CDLL | None" = None
_tried = False


def _build() -> bool:
    # The library is built on (and only ever runs on) this host, so
    # -march=native is safe; retry portably if the flag is rejected.
    for flags in (["-O3", "-march=native"], ["-O3"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        l.slc_bmp_probe.argtypes = [ctypes.c_char_p, i32p, i32p, i32p]
        l.slc_bmp_probe.restype = ctypes.c_int
        l.slc_bmp_read_gray.argtypes = [ctypes.c_char_p, u8p,
                                        ctypes.c_int, ctypes.c_int]
        l.slc_bmp_read_gray.restype = ctypes.c_int
        l.slc_bmp_write_gray.argtypes = [ctypes.c_char_p, u8p,
                                         ctypes.c_int, ctypes.c_int]
        l.slc_bmp_write_gray.restype = ctypes.c_int
        l.slc_write_xyz.argtypes = [ctypes.c_char_p, f32p, f32p, f32p,
                                    ctypes.c_long]
        l.slc_write_xyz.restype = ctypes.c_long
        _lib = l
        return _lib
