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
    for flags in (["-O3", "-march=native", "-pthread"],
                  ["-O3", "-pthread"]):
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
        l.slc_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        l.slc_loader_create.restype = ctypes.c_void_p
        l.slc_loader_next.argtypes = [ctypes.c_void_p, u8p]
        l.slc_loader_next.restype = ctypes.c_int
        l.slc_loader_destroy.argtypes = [ctypes.c_void_p]
        l.slc_loader_destroy.restype = None
        _lib = l
        return _lib


class NativeFrameLoader:
    """Ordered iterator over grayscale BMP ``paths`` backed by the
    native thread-pool decoder (slc_io.cpp, SlcLoader): ``slots`` frames
    of read-ahead, ``threads`` parallel decoders, frames delivered
    strictly in list order. Raises RuntimeError if the native library is
    unavailable (callers should fall back to the Python reader) and
    IOError for a frame that fails to decode (the stream continues on
    the next ``__next__``).
    """

    def __init__(self, paths, h: int, w: int, slots: int = 8,
                 threads: int = 4):
        import numpy as np
        self._np = np
        l = lib()
        if l is None:
            raise RuntimeError("native I/O library unavailable")
        self._lib = l
        self._paths = [os.fsencode(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h, self._w = h, w
        self._handle = l.slc_loader_create(arr, len(self._paths), h, w,
                                           slots, threads)
        if not self._handle:
            raise RuntimeError("slc_loader_create failed")
        self._idx = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is None:
            raise StopIteration
        out = self._np.empty((self._h, self._w), self._np.uint8)
        rc = self._lib.slc_loader_next(
            self._handle,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        i = self._idx
        self._idx += 1
        if rc == 0:
            return out
        if rc == 1:
            self.close()
            raise StopIteration
        raise IOError(
            f"native BMP decode failed (rc={rc}) for "
            f"{os.fsdecode(self._paths[i])}")

    def close(self):
        if self._handle is not None:
            self._lib.slc_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass
