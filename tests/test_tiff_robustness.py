"""Adversarial-input robustness of the TIFF codec (production hardening the
reference delegates to tifffile — our codec must reject corrupt containers
cleanly, never hang, crash, or allocate unboundedly).

Two layers:

- crafted cases that pin each specific guard (truncated IFD, corrupt
  deflate stream, huge tag count, implausible page dimensions,
  decompression bomb, truncated strip data, fallback-chain exception type);
- a bounded seeded fuzz sweep (truncations + byte flips of valid files)
  over both the pure-Python reader and the native C++ decoder, asserting
  every outcome is either a successful decode or a clean exception.

The full 3000-case-per-decoder sweep ran during development; the committed
sweep is trimmed for suite wall-time but uses the same generator.
"""

import io
import struct

import numpy as np
import pytest

from bio_image_unet_tpu.data import tiff
from bio_image_unet_tpu.data.tiff import TiffFormatError


@pytest.fixture
def valid_bytes():
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    tiff.imwrite(buf, rng.integers(0, 65535, (3, 32, 48)).astype(np.uint16))
    return buf.getvalue()


def _write(tmp_path, data: bytes):
    p = tmp_path / "case.tif"
    p.write_bytes(data)
    return str(p)


def test_truncated_everywhere_raises_cleanly(tmp_path, valid_bytes):
    """Truncating a valid file at ANY prefix length must produce a clean
    TiffFormatError from TiffReader (never struct.error / zlib.error /
    bare ValueError from a reshape)."""
    for cut in range(0, len(valid_bytes), 97):
        path = _write(tmp_path, valid_bytes[:cut])
        try:
            with tiff.TiffReader(path) as tr:
                for i in range(tr.n_pages):
                    tr.read_page(i)
        except TiffFormatError:
            pass  # the one acceptable failure type


def test_corrupt_deflate_strip_is_codec_error(tmp_path):
    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    tiff.imwrite(buf, rng.integers(0, 255, (16, 16)).astype(np.uint8),
                 compress=6)
    data = bytearray(buf.getvalue())
    # the deflate payload sits after the 8-byte header; garble its middle
    data[len(data) // 2] ^= 0xFF
    path = _write(tmp_path, bytes(data))
    with pytest.raises(TiffFormatError, match="deflate|truncated"):
        with tiff.TiffReader(path) as tr:
            tr.read_page(0)


def test_huge_tag_count_is_bounded(tmp_path, valid_bytes):
    """A corrupt tag count field (here 0x3FFFFFFF entries) must be rejected
    via the payload-length check BEFORE any count-proportional allocation
    (the 'fmt * count' format string)."""
    data = bytearray(valid_bytes)
    # classic little-endian header: first IFD offset at byte 4
    (ifd,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd:ifd + 2])
    # entry 0: tag(2) type(2) count(4) value(4) — blow up the count
    struct.pack_into("<I", data, ifd + 2 + 4, 0x3FFFFFFF)
    path = _write(tmp_path, bytes(data))
    with pytest.raises(TiffFormatError):
        with tiff.TiffReader(path) as tr:
            tr.read_page(0)


def test_implausible_page_size_refused(tmp_path, valid_bytes):
    """Corrupt width/height tags claiming a >1 TiB page must be refused
    before any size-keyed allocation."""
    data = bytearray(valid_bytes)
    (ifd,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd:ifd + 2])
    for i in range(n):
        base = ifd + 2 + i * 12
        tag, typ = struct.unpack_from("<HH", data, base)
        if tag in (256, 257):  # ImageWidth / ImageLength
            struct.pack_into("<I", data, base + 8, 0x7FFFFFFF)
    path = _write(tmp_path, bytes(data))
    with pytest.raises(TiffFormatError, match="implausible"):
        with tiff.TiffReader(path) as tr:
            tr.read_page(0)


def test_bigtiff_huge_count_and_offsets_are_codec_errors(tmp_path):
    """A corrupt 64-bit BigTIFF IFD entry count (e.g. 2**62) must raise
    TiffFormatError — not the OS-level \"cannot fit 'int' into an
    offset-sized integer\" ValueError from seek() (review finding: that
    bare ValueError escaped imread's (TiffFormatError, struct.error)
    fallback filter)."""
    rng = np.random.default_rng(3)
    buf = io.BytesIO()
    tiff.imwrite(buf, rng.integers(0, 255, (16, 16)).astype(np.uint8),
                 bigtiff=True)
    base = buf.getvalue()
    # BigTIFF LE header: bytes 8..16 = first IFD offset (Q)
    (ifd,) = struct.unpack("<Q", base[8:16])

    # corrupt the 8-byte entry count at the IFD
    data = bytearray(base)
    struct.pack_into("<Q", data, ifd, 1 << 62)
    path = _write(tmp_path, bytes(data))
    with pytest.raises(TiffFormatError):
        tiff.TiffReader(path)

    # corrupt a tag's 64-bit value offset into the stratosphere
    data = bytearray(base)
    (n,) = struct.unpack("<Q", data[ifd:ifd + 8])
    for i in range(n):
        b = ifd + 8 + i * 20
        tag, typ = struct.unpack_from("<HH", data, b)
        (count,) = struct.unpack_from("<Q", data, b + 4)
        from bio_image_unet_tpu.data.tiff import TiffReader  # type sizes
        if count * 2 > 8:  # out-of-line value area — repoint it
            struct.pack_into("<Q", data, b + 12, 1 << 61)
    path = _write(tmp_path, bytes(data))
    try:
        with tiff.TiffReader(path) as tr:
            tr.read_page(0)
    except TiffFormatError:
        pass  # the one acceptable failure type


def test_decompression_bomb_capped(tmp_path):
    """A deflate strip expanding far past the declared page size must be
    truncated at the page's byte budget, not inflated in full."""
    # 16x16 uint8 page (need=256 bytes) whose strip decompresses to 64 MiB
    bomb = zlib_compress_bomb(64 << 20)
    rng = np.random.default_rng(2)
    buf = io.BytesIO()
    tiff.imwrite(buf, rng.integers(0, 255, (16, 16)).astype(np.uint8),
                 compress=6)
    data = bytearray(buf.getvalue())
    # find the strip: offsets/counts from our own reader's tag parse
    with tiff.TiffReader(io.BytesIO(bytes(data))) as tr:
        tags = tr._read_tags(tr._ifd_offsets[0])
    (off,), (cnt,) = tags[273], tags[279]
    # append the bomb at EOF and repoint the strip at it
    bomb_off = len(data)
    data.extend(bomb)
    (ifd,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd:ifd + 2])
    for i in range(n):
        base = ifd + 2 + i * 12
        tag, _ = struct.unpack_from("<HH", data, base)
        if tag == 273:
            struct.pack_into("<I", data, base + 8, bomb_off)
        if tag == 279:
            struct.pack_into("<I", data, base + 8, len(bomb))
    path = _write(tmp_path, bytes(data))
    import tracemalloc

    tracemalloc.start()
    with tiff.TiffReader(path) as tr:
        page = tr.read_page(0)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert page.shape == (16, 16)
    # the 64 MiB payload must have been capped at the 256-byte page budget
    assert peak < 8 << 20, f"decompression not capped: peak {peak} bytes"


def zlib_compress_bomb(n: int) -> bytes:
    import zlib

    return zlib.compress(b"\x00" * n, 9)


def test_imread_garbage_raises_tiff_format_error(tmp_path):
    """When every decoder in imread's chain (native → built-in → imageio →
    PIL) refuses a file, the caller must see ONE TiffFormatError — not
    PIL's SyntaxError or imageio's internals."""
    path = _write(tmp_path, b"II*\x00" + bytes(range(256)) * 8)
    with pytest.raises(TiffFormatError, match="could not decode"):
        tiff.imread(path)


def test_native_probe_dims_bounded_before_allocation(tmp_path):
    """A corrupt header whose probe-reported dimensions imply a payload far
    beyond what the file could decode to (deflate tops out ~1032:1) must
    make the native wrapper return None BEFORE any np.empty — an ASan-fuzz
    case drove a ~258 GiB allocation request through the old unguarded
    path."""
    from bio_image_unet_tpu import native

    if not native.available():
        pytest.skip("native codec not built")

    rng = np.random.default_rng(4)
    buf = io.BytesIO()
    tiff.imwrite(buf, rng.integers(0, 65535, (3, 32, 48)).astype(np.uint16))
    data = bytearray(buf.getvalue())
    (ifd,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd:ifd + 2])
    for i in range(n):
        base = ifd + 2 + i * 12
        tag, _ = struct.unpack_from("<HH", data, base)
        if tag in (256, 257):  # claim a ~4-gigapixel page
            struct.pack_into("<I", data, base + 8, 1 << 16)
    path = _write(tmp_path, bytes(data))
    assert native.imread(path) is None  # refused pre-allocation
    assert native.imread_batch([path]) is None
    # ... and the full imread chain still yields ONE clean codec error
    with pytest.raises(TiffFormatError):
        with tiff.TiffReader(path) as tr:
            tr.read_page(0)


@pytest.mark.parametrize("mode", ["py", "native"])
def test_seeded_fuzz_sweep(tmp_path, mode):
    """Seeded mutation sweep (truncate / flip bytes / corrupt the header
    region) over valid uint8/uint16/float32, deflate, and BigTIFF corpora.
    Acceptable outcomes: clean decode or a clean exception; never a hang or
    an uncontained decoder-internal error type."""
    if mode == "native":
        from bio_image_unet_tpu import native

        if not native.available():
            pytest.skip("native codec not built")

    rng = np.random.default_rng(1234)
    corpus = []
    base = rng.integers(0, 65535, (3, 32, 48)).astype(np.uint16)
    for kw in [dict(), dict(compress=6), dict(bigtiff=True)]:
        buf = io.BytesIO()
        tiff.imwrite(buf, base, **kw)
        corpus.append(buf.getvalue())
    buf = io.BytesIO()
    tiff.imwrite(buf, base[0].astype(np.float32))
    corpus.append(buf.getvalue())

    ok_exc = (TiffFormatError, ValueError, OSError, EOFError, KeyError,
              IndexError, NotImplementedError)
    for case in range(150):
        r = np.random.default_rng(case)
        data = bytearray(corpus[r.integers(0, len(corpus))])
        kind = r.integers(0, 3)
        if kind == 0:
            data = data[: r.integers(0, len(data))]
        elif kind == 1:
            for _ in range(r.integers(1, 9)):
                data[r.integers(0, len(data))] = r.integers(0, 256)
        else:
            for _ in range(r.integers(1, 5)):
                data[r.integers(0, min(len(data), 4096))] = r.integers(0, 256)
        path = _write(tmp_path, bytes(data))
        try:
            if mode == "py":
                with tiff.TiffReader(path) as tr:
                    for i in range(tr.n_pages):
                        np.asarray(tr.read_page(i)).sum()
            else:
                arr = native.imread(path)
                if arr is not None:
                    np.asarray(arr).sum()
        except ok_exc:
            pass
