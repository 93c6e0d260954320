"""Debug visualization and image archival.

The reference's `CVisualization::Show` (DynaFrame/CVisualization.cpp:
22-115) normalizes any dtype to 8-bit and imshows/saves it, gated by the
VISUAL_DEBUG compile-time flag (StaticParameters.cpp:22); `CStorage::
Store` (DynaFrame/CStorage.cpp:41-55) batch-writes image stacks with an
auto-mkdir fallback. Headless TPU hosts have no HighGUI, so "show" means
"write a BMP/odd-frame dump you can scp" — the same debug affordance
without a display server. Gating is a runtime flag here, not a rebuild.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from slc_tpu.io.bmp import write_bmp

#: Runtime debug gate (the VISUAL_DEBUG analog, StaticParameters.cpp:22).
VISUAL_DEBUG = bool(int(os.environ.get("SLC_VISUAL_DEBUG", "0")))


def to_display(img, normalize: bool = True) -> np.ndarray:
    """Any 2D array -> uint8 for display, min-max normalized per call
    (CVisualization.cpp:29-96 behavior, minus the reference normalizers'
    static-cache bug)."""
    a = np.asarray(img)
    if a.dtype == np.uint8 and not normalize:
        return a
    a = a.astype(np.float64)
    lo, hi = float(a.min()), float(a.max())
    if hi - lo < 1e-20:
        return np.zeros(a.shape, np.uint8)
    return ((a - lo) / (hi - lo) * 255.0).astype(np.uint8)


def show(name: str, img, out_dir: str = "debug_vis",
         normalize: bool = True, force: bool = False) -> Optional[str]:
    """Debug dump: write ``<out_dir>/<name>.bmp`` when VISUAL_DEBUG (or
    ``force``); returns the path written or None. The call-site pattern
    mirrors the reference's gated Show calls (CDecodeGray.cpp:207-227)."""
    if not (VISUAL_DEBUG or force):
        return None
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.bmp")
    write_bmp(path, to_display(img, normalize))
    return path


def store_images(images: Sequence, directory: str, name: str,
                 start_idx: int = 0, suffix: str = ".bmp") -> int:
    """Batch image archival: ``<dir>/<name><idx><suffix>`` with
    auto-mkdir (CStorage::Store, CStorage.cpp:41-55 — minus its
    ``system("mkdir")`` shell-out). Returns the number written."""
    os.makedirs(directory, exist_ok=True)
    if suffix.lower() not in (".bmp",):
        raise ValueError(f"unsupported suffix {suffix} (BMP codec only)")
    n = 0
    for i, img in enumerate(images):
        a = np.asarray(img)
        if a.dtype != np.uint8:
            a = to_display(a)
        write_bmp(os.path.join(directory,
                               f"{name}{start_idx + i}{suffix}"), a)
        n += 1
    return n
