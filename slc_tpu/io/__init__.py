"""Host I/O: calibration files, image codecs, dataset replay, results.

The native (C++) fast paths live in ``slc_tpu/io/native``; every entry
point here has a pure-Python fallback so the framework runs without the
compiled extension.
"""

from slc_tpu.io.opencv_yaml import (load_opencv_yaml, save_opencv_yaml,
                                    load_calibration, save_calibration)
from slc_tpu.io.bmp import read_bmp, write_bmp
from slc_tpu.io.dataset import ReplayDataset, write_replay_dataset

__all__ = [
    "load_opencv_yaml", "save_opencv_yaml",
    "load_calibration", "save_calibration",
    "read_bmp", "write_bmp",
    "ReplayDataset", "write_replay_dataset",
]
