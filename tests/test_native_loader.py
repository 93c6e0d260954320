"""Native threaded prefetch loader (slc_io.cpp SlcLoader): ordered
delivery, parity with the Python reader, decode-error surfacing, and the
ReplayDataset.frames() integration. Skips when the native library can't
be built (no compiler)."""

import os

import numpy as np
import pytest

from slc_tpu.io import native as native_io
from slc_tpu.io.bmp import write_bmp
from slc_tpu.io.dataset import ReplayDataset, write_replay_dataset

pytestmark = pytest.mark.skipif(native_io.lib() is None,
                                reason="native I/O library unavailable")


@pytest.fixture
def bmp_dir(tmp_path, rng):
    h, w = 24, 40
    imgs = [rng.integers(0, 256, (h, w), dtype=np.uint8)
            for _ in range(17)]
    paths = []
    for i, img in enumerate(imgs):
        p = str(tmp_path / f"frame{i}.bmp")
        write_bmp(p, img)
        paths.append(p)
    return paths, imgs, h, w


def test_loader_ordered_parity(bmp_dir):
    paths, imgs, h, w = bmp_dir
    # More frames than ring slots, more threads than one: exercises
    # slot reuse and cross-thread ordering.
    loader = native_io.NativeFrameLoader(paths, h, w, slots=4, threads=3)
    got = list(loader)
    assert len(got) == len(imgs)
    for g, want in zip(got, imgs):
        np.testing.assert_array_equal(g, want)


def test_loader_error_then_continue(bmp_dir, tmp_path):
    paths, imgs, h, w = bmp_dir
    bad = str(tmp_path / "bad.bmp")
    with open(bad, "wb") as f:
        f.write(b"not a bmp at all")
    seq = [paths[0], bad, paths[2]]
    loader = native_io.NativeFrameLoader(seq, h, w, slots=2, threads=2)
    np.testing.assert_array_equal(next(loader), imgs[0])
    with pytest.raises(IOError):
        next(loader)
    # The stream continues after a per-frame failure.
    np.testing.assert_array_equal(next(loader), imgs[2])
    with pytest.raises(StopIteration):
        next(loader)


def test_loader_shape_mismatch(bmp_dir):
    paths, imgs, h, w = bmp_dir
    loader = native_io.NativeFrameLoader(paths[:1], h + 1, w)
    with pytest.raises(IOError):
        next(loader)


def test_loader_early_close(bmp_dir):
    paths, imgs, h, w = bmp_dir
    loader = native_io.NativeFrameLoader(paths, h, w, slots=2, threads=2)
    next(loader)
    loader.close()  # must join workers without deadlock
    loader.close()  # idempotent


def test_dataset_frames_native_path(tmp_path, rng):
    h, w = 16, 32
    gray = rng.integers(0, 256, (4, h, w), dtype=np.uint8)
    phase = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
    frames = rng.integers(0, 256, (9, h, w), dtype=np.uint8)
    root = str(tmp_path / "ds")
    write_replay_dataset(root, gray, phase, frames=frames)
    ds = ReplayDataset(root)
    got_native = np.stack(list(ds.frames(native=True)))
    got_python = np.stack(list(ds.frames(native=False)))
    np.testing.assert_array_equal(got_native, frames)
    np.testing.assert_array_equal(got_python, frames)
    # start offset goes through the native path too.
    got_tail = np.stack(list(ds.frames(start=5)))
    np.testing.assert_array_equal(got_tail, frames[5:])


def test_dataset_frames_skip_bad_frame(tmp_path, rng):
    """frames() skips an undecodable frame and continues — identical
    semantics on the native and Python paths (ADVICE r2: the native
    path used to die via ``yield from``, the Python path silently
    truncated)."""
    h, w = 16, 32
    gray = rng.integers(0, 256, (4, h, w), dtype=np.uint8)
    phase = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
    frames = rng.integers(0, 256, (5, h, w), dtype=np.uint8)
    root = str(tmp_path / "ds")
    write_replay_dataset(root, gray, phase, frames=frames)
    with open(os.path.join(root, "cFrame", "dynaCam2.bmp"), "wb") as f:
        f.write(b"corrupt, not a bmp")
    ds = ReplayDataset(root)
    want = np.stack([frames[i] for i in (0, 1, 3, 4)])
    np.testing.assert_array_equal(
        np.stack(list(ds.frames(native=True))), want)
    np.testing.assert_array_equal(
        np.stack(list(ds.frames(native=False))), want)


def test_dataset_frames_fallback_on_shape_mismatch(tmp_path, rng):
    """A dataset whose on-disk frame size differs from the manifest must
    fall back to the Python reader (delivering the actual frames), not
    raise IOError mid-iteration from the native loader."""
    from slc_tpu.io.dataset import write_manifest

    root = str(tmp_path / "ds")
    os.makedirs(os.path.join(root, "cFrame"))
    actual = rng.integers(0, 256, (8, 16), dtype=np.uint8)
    write_bmp(os.path.join(root, "cFrame", "dynaCam0.bmp"), actual)
    write_manifest(root, {"gray_count": 2, "phase_count": 2,
                          "frame_count": 1, "cam_h": 16, "cam_w": 32})
    ds = ReplayDataset(root)
    got = list(ds.frames())
    assert len(got) == 1
    np.testing.assert_array_equal(got[0], actual)
