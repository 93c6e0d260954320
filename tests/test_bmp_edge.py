"""BMP codec edge hardening (VERDICT r4 item 8): formats the reference's
cv::imread tolerates (CSensorV.cpp:111-114) but our native codec does not
must fail CLEANLY — Python-path ValueError for a direct read, a per-index
fault record (never a mid-iteration crash) inside a streaming run."""

import struct

import numpy as np
import pytest

from slc_tpu.io.bmp import read_bmp, write_bmp

_BF = struct.Struct("<2sIHHI")
_BI = struct.Struct("<IiiHHIIiiII")


def _bmp_bytes(w, h, bpp, compression=0, payload=b"", palette=b""):
    off = _BF.size + _BI.size + len(palette)
    return (_BF.pack(b"BM", off + len(payload), 0, 0, off)
            + _BI.pack(_BI.size, w, h, 1, bpp, compression,
                       len(payload), 2835, 2835, 0, 0)
            + palette + payload)


def _write(path, data):
    with open(path, "wb") as f:
        f.write(data)
    return str(path)


def test_rle8_bmp_rejected_cleanly(tmp_path):
    """Compressed (BI_RLE8) BMP: native probe rejects it (slc_io.cpp
    header gate), the Python fallback raises a descriptive ValueError —
    never garbage pixels."""
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    p = _write(tmp_path / "rle8.bmp",
               _bmp_bytes(4, 4, 8, compression=1,
                          payload=b"\x04\x80\x00\x01", palette=pal))
    with pytest.raises(ValueError, match="compressed"):
        read_bmp(p)


def test_16bit_bmp_rejected_cleanly(tmp_path):
    """16-bit (RGB555) BMP: the native probe ACCEPTS the header (bpp is
    only format-gated at read time, slc_io.cpp read_gray -> -6), so the
    wrapper must fall through to the Python reader, which rejects with
    the bpp in the message."""
    rows = b"\x00" * (((4 * 16 // 8) + 3) & ~3) * 4
    p = _write(tmp_path / "b16.bmp", _bmp_bytes(4, 4, 16, payload=rows))
    with pytest.raises(ValueError, match="16-bit"):
        read_bmp(p)


def test_odd_stride_24bit_roundtrip(tmp_path):
    """Odd-width 24-bit BMP: rows are padded to 4 bytes; both codecs
    must honor the stride. Grayscale read uses the exact OpenCV integer
    BGR2GRAY arithmetic."""
    h, w = 5, 7                       # stride = 24 != w*3 = 21
    rgb = (np.arange(h * w * 3, dtype=np.uint32) * 37 % 256
           ).astype(np.uint8).reshape(h, w, 3)
    p = str(tmp_path / "odd.bmp")
    write_bmp(p, rgb)
    got = read_bmp(p, grayscale=True)
    r, g, b = (rgb[..., i].astype(np.int32) for i in range(3))
    want = ((1868 * b + 9617 * g + 4899 * r + 8192) >> 14
            ).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # Color read roundtrips exactly.
    np.testing.assert_array_equal(read_bmp(p, grayscale=False), rgb)


def test_store_images_rejects_foreign_suffix(tmp_path):
    from slc_tpu.visualization import store_images
    with pytest.raises(ValueError, match="suffix"):
        store_images([np.zeros((4, 4), np.uint8)], str(tmp_path), "img",
                     suffix=".png")


def test_indexed_frames_surfaces_midstream_bad_format(tmp_path):
    """A frame whose FORMAT the native loader can't decode mid-sequence
    (frame 0 probed fine) must surface as a per-index fault record and
    the stream must continue — the streaming-run guarantee behind
    runner skip-and-carry (dataset.indexed_frames)."""
    from slc_tpu.io.dataset import ReplayDataset, write_manifest

    root = tmp_path / "ds"
    cdir = root / "cFrame"
    cdir.mkdir(parents=True)
    h, w = 8, 8
    imgs = [np.full((h, w), 10 * i, np.uint8) for i in range(4)]
    for i, im in enumerate(imgs):
        write_bmp(str(cdir / f"dynaCam{i}.bmp"), im)
    # Replace frame 2 with an RLE8-compressed file of the same shape.
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    _write(cdir / "dynaCam2.bmp",
           _bmp_bytes(w, h, 8, compression=1,
                      payload=b"\x08\x14", palette=pal))
    write_manifest(str(root), {"frame_count": 4})
    ds = ReplayDataset(str(root))

    for native in (True, False):
        got = list(ds.indexed_frames(native=native))
        assert [i for i, _, _ in got] == [0, 1, 2, 3]
        for i, frame, err in got:
            if i == 2:
                assert frame is None and err
            else:
                assert err is None
                np.testing.assert_array_equal(frame, imgs[i])


def test_abandoned_python_iteration_releases_worker(tmp_path):
    """Breaking out of indexed_frames mid-stream with a FULL prefetch
    queue must not strand the producer thread (ADVICE r4: bounded put
    rechecks the stop event)."""
    import threading
    import time

    from slc_tpu.io.dataset import ReplayDataset, write_manifest

    root = tmp_path / "ds2"
    cdir = root / "cFrame"
    cdir.mkdir(parents=True)
    n = 12
    for i in range(n):
        write_bmp(str(cdir / f"dynaCam{i}.bmp"),
                  np.zeros((4, 4), np.uint8))
    write_manifest(str(root), {"frame_count": n})
    ds = ReplayDataset(str(root))

    before = {t.ident for t in threading.enumerate()}
    it = ds.indexed_frames(native=False, prefetch=1)
    next(it)          # worker now races ahead and blocks on the queue
    time.sleep(0.05)  # let it reach the bounded put
    it.close()        # abandon: generator finally sets the stop event
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not alive:
            break
        time.sleep(0.02)
    assert not alive, f"stranded worker threads: {alive}"


def test_read_bmp_fuzz_garbage_never_crashes(tmp_path):
    """Fuzz: random byte blobs (including BM-prefixed ones) must raise
    a clean ValueError/IOError from read_bmp — never hang, segfault the
    native codec, or return garbage silently."""
    rng = np.random.default_rng(0)
    for k in range(40):
        blob = rng.integers(0, 256, rng.integers(0, 2048),
                            dtype=np.uint8).tobytes()
        if k % 2:
            blob = b"BM" + blob          # plausible magic
        p = _write(tmp_path / f"fuzz{k}.bin", blob)
        try:
            out = read_bmp(p)
        except (ValueError, IOError, OSError, struct.error):
            continue
        # The odd blob that parses as a valid header must still return
        # a sane uint8 image, not out-of-bounds memory.
        assert out.dtype == np.uint8 and out.ndim == 2
