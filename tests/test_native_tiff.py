"""Native C++ TIFF decoder (native/biotiff.cpp via ctypes) must agree with
the pure-Python codec on everything the framework writes."""

import numpy as np
import pytest

from bio_image_unet_tpu import native
from bio_image_unet_tpu.data.tiff import TiffReader, TiffWriter, imwrite

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native biotiff unavailable (no g++/zlib)")


def _python_read(path):
    with TiffReader(path) as r:
        return r.asarray()


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float16, np.float32,
                                   np.int16, np.float64])
def test_single_page_dtypes(tmp_path, rng, dtype):
    if np.issubdtype(dtype, np.floating):
        arr = rng.standard_normal((33, 47)).astype(dtype)
    else:
        arr = rng.integers(0, 100, (33, 47)).astype(dtype)
    p = str(tmp_path / "x.tif")
    imwrite(p, arr)
    got = native.imread(p)
    np.testing.assert_array_equal(got, _python_read(p))
    np.testing.assert_array_equal(got, arr)


def test_multipage_and_multisample(tmp_path, rng):
    stack = rng.integers(0, 255, (7, 20, 24), dtype=np.uint8)
    p = str(tmp_path / "stack.tif")
    imwrite(p, stack)
    np.testing.assert_array_equal(native.imread(p), stack)

    hwc = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
    p2 = str(tmp_path / "hwc.tif")
    imwrite(p2, hwc)
    np.testing.assert_array_equal(native.imread(p2), hwc)


def test_deflate_compression(tmp_path, rng):
    arr = rng.integers(0, 50, (64, 64), dtype=np.uint8)
    p = str(tmp_path / "z.tif")
    imwrite(p, arr, compress=6)
    np.testing.assert_array_equal(native.imread(p), arr)


def test_streamed_multistrip(tmp_path, rng):
    # streaming writer: one strip per page, back-patched IFD chain
    frames = rng.integers(0, 255, (5, 16, 16), dtype=np.uint8)
    p = str(tmp_path / "s.tif")
    with TiffWriter(p) as w:
        for f in frames:
            w.write(f)
    np.testing.assert_array_equal(native.imread(p), frames)


def test_batch_read(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(12):
        a = rng.integers(0, 255, (32, 32), dtype=np.uint8)
        p = str(tmp_path / f"t{i}.tif")
        imwrite(p, a)
        paths.append(p)
        arrays.append(a)
    batch = native.imread_batch(paths, n_threads=4)
    assert batch.shape == (12, 32, 32)
    np.testing.assert_array_equal(batch, np.stack(arrays))


def test_graceful_none_on_garbage(tmp_path):
    p = tmp_path / "bad.tif"
    p.write_bytes(b"not a tiff at all")
    assert native.imread(str(p)) is None


def test_native_write_roundtrip(tmp_path, rng):
    """Native multithreaded encoder output must read back identically via
    BOTH the native decoder and the pure-Python reader (multi-strip deflate
    pages are standard TIFF 6.0)."""
    from bio_image_unet_tpu import native
    from bio_image_unet_tpu.data import tiff

    if not native.available() or not hasattr(native.get_lib(), "biotiff_write"):
        pytest.skip("native library unavailable")

    cases = [
        rng.integers(0, 255, (3, 100, 70), dtype=np.uint8),
        rng.random((2, 64, 48)).astype(np.float16),
        rng.integers(0, 60000, (80, 60), dtype=np.uint16),
        rng.random((2, 33, 20, 3)).astype(np.float32),
    ]
    for i, arr in enumerate(cases):
        p = str(tmp_path / f"n{i}.tif")
        assert native.imwrite(p, arr, compress=6, rows_per_strip=16)
        np.testing.assert_array_equal(np.asarray(native.imread(p)), arr)
        with tiff.TiffReader(p) as tr:
            np.testing.assert_array_equal(tr.asarray(), arr)


def test_native_write_uncompressed_and_fallback(tmp_path, rng):
    from bio_image_unet_tpu import native
    from bio_image_unet_tpu.data import tiff

    if not native.available() or not hasattr(native.get_lib(), "biotiff_write"):
        pytest.skip("native library unavailable")
    arr = rng.integers(0, 255, (2, 40, 40), dtype=np.uint8)
    p = str(tmp_path / "raw.tif")
    assert native.imwrite(p, arr, compress=None)
    np.testing.assert_array_equal(tiff.imread(p), arr)
    # imwrite() facade routes big compressed writes natively, small ones via
    # the Python writer — both must round-trip
    big = rng.integers(0, 255, (20, 256, 256), dtype=np.uint8)
    p2 = str(tmp_path / "big.tif")
    tiff.imwrite(p2, big, compress=6)
    np.testing.assert_array_equal(tiff.imread(p2), big)


def test_channels_first_4d_matches_python_writer(tmp_path, rng):
    """Multi-output predictors save (N, C, H, W) stacks; the native encoder
    must produce the same N·C-page layout as the Python writer, so the file
    format never depends on which encoder the size/compression routing
    picked."""
    arr = rng.standard_normal((3, 2, 300, 400)).astype(np.float32)
    p_native = str(tmp_path / "native.tif")
    p_python = str(tmp_path / "python.tif")
    imwrite(p_native, arr, compress=6)     # ≥1 MB compressed → native
    imwrite(p_python, arr, compress=None)  # always the Python writer
    a, b = _python_read(p_native), _python_read(p_python)
    assert a.shape == b.shape == (6, 300, 400)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, arr.reshape(-1, 300, 400))


def test_channels_last_4d_single_write(tmp_path, rng):
    """(N, H, W, C≤8) stacks keep the channels-last interpretation in both
    encoders."""
    arr = rng.integers(0, 255, (5, 200, 240, 3)).astype(np.uint8)
    p_native = str(tmp_path / "native.tif")
    p_python = str(tmp_path / "python.tif")
    imwrite(p_native, arr, compress=6)
    imwrite(p_python, arr, compress=None)
    np.testing.assert_array_equal(_python_read(p_native), arr)
    np.testing.assert_array_equal(_python_read(p_python), arr)


def test_native_reads_bigtiff(tmp_path, rng):
    """The C++ decoder parses BigTIFF (magic 43: 8-byte IFD counts, 20-byte
    entries, LONG8 offsets) the same as classic."""
    arr = rng.standard_normal((5, 33, 47)).astype(np.float32)
    p = str(tmp_path / "big.tif")
    imwrite(p, arr, compress=6, bigtiff=True)
    assert open(p, "rb").read(4) == b"II+\x00"
    got = native.imread(p)
    assert got is not None
    np.testing.assert_array_equal(got, arr)
    np.testing.assert_array_equal(got, _python_read(p))


def test_native_writes_bigtiff(tmp_path, rng):
    """The C++ encoder emits BigTIFF (magic 43) on request; big compressed
    imwrite calls route through it instead of the single-threaded Python
    writer."""
    arr = rng.standard_normal((4, 96, 112)).astype(np.float32)
    p = str(tmp_path / "big_w.tif")
    assert native.imwrite(p, arr, compress=6, bigtiff=True)
    assert open(p, "rb").read(4) == b"II+\x00"
    np.testing.assert_array_equal(_python_read(p), arr)
    np.testing.assert_array_equal(native.imread(p), arr)

    # imwrite routing: >=1MB compressed + bigtiff stays on the native path.
    # The native encoder splits pages into 64-row strips while the Python
    # writer emits ONE strip per page — assert the multi-strip layout so a
    # silent fallback to Python cannot pass this test.
    big = rng.integers(0, 255, (2, 800, 800)).astype(np.uint8)
    p2 = str(tmp_path / "big_route.tif")
    imwrite(p2, big, compress=6, bigtiff=True)
    assert open(p2, "rb").read(4) == b"II+\x00"
    with TiffReader(p2) as r:
        tags = r._read_tags(r._ifd_offsets[0])
    assert len(tags[273]) > 1, "expected the native encoder's 64-row strips"
    np.testing.assert_array_equal(_python_read(p2), big)
