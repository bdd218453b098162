"""TIFF codec: roundtrips, dtypes, streaming, compression, interop."""

import numpy as np
import pytest

from bio_image_unet_tpu.data import tiff


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.uint16, np.int16, np.float16, np.float32, np.float64]
)
def test_single_page_roundtrip(tmp_path, rng, dtype):
    arr = (rng.random((37, 53)) * 100).astype(dtype)
    path = tmp_path / "x.tif"
    tiff.imwrite(path, arr)
    out = tiff.imread(path)
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_multipage_roundtrip(tmp_path, rng):
    arr = (rng.random((7, 20, 31)) * 255).astype(np.uint8)
    path = tmp_path / "stack.tif"
    tiff.imwrite(path, arr)
    out = tiff.imread(path)
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_multichannel_roundtrip(tmp_path, rng):
    arr = (rng.random((16, 18, 3)) * 255).astype(np.uint8)
    path = tmp_path / "hwc.tif"
    tiff.imwrite(path, arr)
    out = tiff.imread(path)
    assert out.shape == (16, 18, 3)
    np.testing.assert_array_equal(out, arr)


def test_multipage_multichannel(tmp_path, rng):
    arr = rng.random((4, 10, 12, 2)).astype(np.float32)
    path = tmp_path / "nhwc.tif"
    tiff.imwrite(path, arr)
    out = tiff.imread(path)
    assert out.shape == (4, 10, 12, 2)
    np.testing.assert_array_equal(out, arr)


def test_deflate_compression(tmp_path):
    arr = np.zeros((64, 64), dtype=np.uint16)
    arr[10:20, 10:20] = 7
    raw, comp = tmp_path / "raw.tif", tmp_path / "comp.tif"
    tiff.imwrite(raw, arr)
    tiff.imwrite(comp, arr, compress=6)
    assert comp.stat().st_size < raw.stat().st_size
    np.testing.assert_array_equal(tiff.imread(comp), arr)


def test_streaming_writer_reader(tmp_path, rng):
    """Frame-at-a-time append + page-at-a-time read (siam movie path)."""
    frames = [(rng.random((24, 24)) * 255).astype(np.uint8) for _ in range(5)]
    path = tmp_path / "movie.tif"
    with tiff.TiffWriter(path) as tw:
        for f in frames:
            tw.write(f)
    with tiff.TiffReader(path) as tr:
        assert tr.n_pages == 5
        assert tr.page_shape(0) == (24, 24)
        assert tr.page_dtype(0) == np.uint8
        for i, f in enumerate(frames):
            np.testing.assert_array_equal(tr.read_page(i), f)
        # out-of-order access works too
        np.testing.assert_array_equal(tr.read_page(2), frames[2])


def test_pil_interop(tmp_path, rng):
    """Our writer produces files PIL can read, and we can read PIL's files."""
    from PIL import Image

    arr = (rng.random((30, 40)) * 255).astype(np.uint8)
    ours = tmp_path / "ours.tif"
    tiff.imwrite(ours, arr)
    np.testing.assert_array_equal(np.array(Image.open(ours)), arr)

    theirs = tmp_path / "pil.tif"
    Image.fromarray(arr).save(theirs)
    np.testing.assert_array_equal(tiff.imread(theirs), arr)


def test_float16_pages(tmp_path, rng):
    """save_as_tif writes float16 (reference utils/utils.py:8-22) — PIL can't,
    our codec must."""
    from bio_image_unet_tpu.utils import save_as_tif

    arr = rng.random((3, 12, 14)).astype(np.float32)
    path = tmp_path / "f16.tif"
    save_as_tif(arr, path)
    out = tiff.imread(path)
    assert out.dtype == np.float16
    np.testing.assert_allclose(out, arr.astype(np.float16))


def test_tiled_tiff_raises_codec_error_not_keyerror(tmp_path):
    """Tiled TIFFs (TileOffsets, no StripOffsets) must raise TiffFormatError
    so imread's PIL/imageio fallback triggers instead of a bare KeyError."""
    import struct

    from bio_image_unet_tpu.data.tiff import TiffFormatError, TiffReader

    # minimal classic-TIFF: header + one IFD with width/length but NO strips
    p = tmp_path / "tiled.tif"
    ifd_entries = [
        (256, 4, 1, 8),  # ImageWidth = 8
        (257, 4, 1, 8),  # ImageLength = 8
        (324, 4, 1, 0),  # TileOffsets (bogus) — marks it tiled
    ]
    body = struct.pack("<H", len(ifd_entries))
    for tag, typ, cnt, val in ifd_entries:
        body += struct.pack("<HHII", tag, typ, cnt, val)
    body += struct.pack("<I", 0)
    p.write_bytes(b"II*\x00" + struct.pack("<I", 8) + body)

    with TiffReader(str(p)) as r:
        import pytest as _pytest

        with _pytest.raises(TiffFormatError):
            r.read_page(0)
        with _pytest.raises(TiffFormatError):
            r.asarray()


class TestBigTiff:
    """BigTIFF (64-bit offsets) — tifffile reads/writes >4 GiB microscopy
    movies transparently; the codec must too (validated structurally at
    small scale: same pixels, magic 43 container)."""

    def test_roundtrip_dtypes_and_pages(self, tmp_path, rng):
        from bio_image_unet_tpu.data.tiff import TiffReader

        for dtype in (np.uint8, np.uint16, np.float16, np.float32):
            if np.issubdtype(dtype, np.floating):
                arr = rng.standard_normal((4, 33, 47)).astype(dtype)
            else:
                arr = rng.integers(0, 200, (4, 33, 47)).astype(dtype)
            p = str(tmp_path / f"big_{np.dtype(dtype).name}.tif")
            tiff.imwrite(p, arr, bigtiff=True)
            assert open(p, "rb").read(4) == b"II+\x00"  # magic 43
            got = tiff.imread(p)
            np.testing.assert_array_equal(got, arr)

    def test_roundtrip_compressed_multisample(self, tmp_path, rng):
        arr = rng.integers(0, 255, (3, 40, 52, 3)).astype(np.uint8)
        p = str(tmp_path / "big_c.tif")
        tiff.imwrite(p, arr, compress=6, bigtiff=True)
        np.testing.assert_array_equal(tiff.imread(p), arr)

    def test_streaming_writer(self, tmp_path, rng):
        from bio_image_unet_tpu.data.tiff import TiffReader, TiffWriter

        frames = rng.integers(0, 255, (7, 21, 35)).astype(np.uint8)
        p = str(tmp_path / "big_stream.tif")
        with TiffWriter(p, bigtiff=True) as tw:
            for f in frames:
                tw.write(f)
        with TiffReader(p) as r:
            assert r.n_pages == 7
            for i in range(7):
                np.testing.assert_array_equal(r.read_page(i), frames[i])

    def test_small_files_stay_classic(self, tmp_path, rng):
        arr = rng.integers(0, 255, (8, 8)).astype(np.uint8)
        p = str(tmp_path / "small.tif")
        tiff.imwrite(p, arr)  # bigtiff=None auto → classic for small data
        assert open(p, "rb").read(4) == b"II*\x00"

    def test_classic_guard_mentions_bigtiff(self):
        from bio_image_unet_tpu.data.tiff import TiffFormatError, TiffWriter

        import io as _io

        class FakeBig(_io.BytesIO):
            def tell(self):
                return 0x1_0000_0000  # pretend 4 GiB already written

        tw = TiffWriter(FakeBig())
        with pytest.raises(TiffFormatError, match="bigtiff"):
            tw.write(np.zeros((4, 4), np.uint8))


def test_codec_property_roundtrip(tmp_path, rng):
    """Randomized round trips across the full config space: dtype × shape ×
    channels × compression × container, cross-checked between the Python
    reader and (when built) the native decoder."""
    from bio_image_unet_tpu import native
    from bio_image_unet_tpu.data.tiff import TiffReader

    dtypes = [np.uint8, np.uint16, np.uint32, np.int8, np.int16, np.int32,
              np.float16, np.float32, np.float64]
    for trial in range(30):
        dtype = dtypes[int(rng.integers(len(dtypes)))]
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        n = int(rng.integers(1, 5))
        c = int(rng.integers(1, 4))
        shape = (h, w) if n == 1 and c == 1 else (
            (h, w, c) if n == 1 else ((n, h, w) if c == 1 else (n, h, w, c)))
        if np.issubdtype(dtype, np.floating):
            arr = rng.standard_normal(shape).astype(dtype)
        else:
            info = np.iinfo(dtype)
            arr = rng.integers(max(info.min, -1000), min(info.max, 1000),
                               shape).astype(dtype)
        compress = [None, 1, 6, True][int(rng.integers(4))]
        big = bool(rng.integers(2))
        p = str(tmp_path / f"t{trial}.tif")
        tiff.imwrite(p, arr, compress=compress, bigtiff=big)
        with TiffReader(p) as r:
            got = r.asarray()
        np.testing.assert_array_equal(got, arr, err_msg=str(
            (trial, dtype, shape, compress, big)))
        if native.available():
            got_n = native.imread(p)
            if got_n is not None:  # native covers the framework subset
                np.testing.assert_array_equal(got_n, got, err_msg=str(
                    (trial, dtype, shape, compress, big)))
            # also drive the native ENCODER on every config (the size-based
            # imwrite routing never reaches it for these small arrays)
            p_n = str(tmp_path / f"t{trial}_native.tif")
            if native.imwrite(p_n, arr, compress=compress or 6, bigtiff=big):
                with TiffReader(p_n) as r:
                    np.testing.assert_array_equal(r.asarray(), arr, err_msg=str(
                        ("native-enc", trial, dtype, shape, compress, big)))
