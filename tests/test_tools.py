"""Helper-toolbox tests (reference siam_unet/helpers/* capabilities)."""

import os

import numpy as np
import pytest

from bio_image_unet_tpu.data import tiff
from bio_image_unet_tpu.tools import (
    average_tifs,
    cpu_count,
    create_pixel_value_histogram,
    device_test,
    find_frame_of_image,
    frame_generator,
    generate_coupled_image,
    generate_coupled_image_from_self,
    generate_plain_image,
    get_info_file_header,
    md5sum,
    mse,
    threshold_images,
    utilize_search_result,
    write_info_file,
)


@pytest.fixture
def movie(tmp_path, rng):
    path = str(tmp_path / "movie.tif")
    frames = rng.integers(0, 255, (5, 32, 32), dtype=np.uint8)
    tiff.imwrite(path, frames)
    return path, frames


def test_generate_coupled_image(tmp_path, movie):
    path, frames = movie
    out = str(tmp_path / "coupled.tif")
    generate_coupled_image(path, 2, out)
    coupled = tiff.imread(out)
    assert coupled.shape == (32, 64)
    np.testing.assert_array_equal(coupled[:, :32], frames[1])  # prev
    np.testing.assert_array_equal(coupled[:, 32:], frames[2])  # curr
    # frame 0 pairs with frame 1
    generate_coupled_image(path, 0, out)
    coupled = tiff.imread(out)
    np.testing.assert_array_equal(coupled[:, :32], frames[1])


def test_generate_coupled_from_self(tmp_path, rng):
    img = str(tmp_path / "img.tif")
    tiff.imwrite(img, rng.integers(0, 255, (32, 32), dtype=np.uint8))
    out = str(tmp_path / "self.tif")
    generate_coupled_image_from_self(img, out, noise_amp=5, seed=0)
    assert tiff.imread(out).shape == (32, 64)


def test_frame_search_and_utilize(tmp_path, movie):
    path, frames = movie
    # label named by its frame number (the reference's search contract)
    query = str(tmp_path / "3.tif")
    tiff.imwrite(query, frames[3])
    mr = str(tmp_path / "search_result_mr.txt")
    results = find_frame_of_image(query, [path],
                                  machine_readable_output_filename=mr)
    assert results[0]["frame"] == 3 and results[0]["exact"]
    assert os.path.exists(mr)
    line = open(mr).read().strip().split("\t")
    assert line == ["3.tif", "movie.tif", "3"]

    out = str(tmp_path / "train")
    utilize_search_result(mr, str(tmp_path), str(tmp_path), out)
    coupled = tiff.imread(os.path.join(out, "image", "3.tif"))
    assert coupled.shape == (32, 64)
    assert os.path.exists(os.path.join(out, "label", "3.tif"))


def test_mse_and_frame_generator(movie):
    path, frames = movie
    assert mse(frames[0], frames[0]) == 0.0
    gen = list(frame_generator(path))
    assert len(gen) == 5
    np.testing.assert_array_equal(gen[2], frames[2])


def test_average_tifs(tmp_path, rng):
    a = str(tmp_path / "a.tif")
    b = str(tmp_path / "b.tif")
    fa = rng.integers(0, 100, (3, 16, 16)).astype(np.float32)
    fb = rng.integers(0, 100, (3, 16, 16)).astype(np.float32)
    tiff.imwrite(a, fa), tiff.imwrite(b, fb)
    out = str(tmp_path / "avg.tif")
    average_tifs([a, b], out)
    np.testing.assert_allclose(tiff.imread(out), (fa + fb) / 2, rtol=1e-6)


def test_threshold_images(tmp_path, rng):
    src = tmp_path / "src"
    os.makedirs(src)
    tiff.imwrite(str(src / "x.tif"), rng.integers(0, 255, (16, 16), dtype=np.uint8))
    n = threshold_images(str(src), str(tmp_path / "dst"), threshold=150)
    assert n == 1
    out = tiff.imread(str(tmp_path / "dst" / "x.tif"))
    assert set(np.unique(out)) <= {0, 255}


def test_plain_image_and_histogram(tmp_path, movie):
    img = generate_plain_image((16, 16), 42, str(tmp_path / "plain.tif"))
    assert (img == 42).all()
    path, _ = movie
    pngs = create_pixel_value_histogram(path, str(tmp_path / "hists"),
                                        frames_per_plot=2)
    assert len(pngs) == 3 and all(os.path.exists(p) for p in pngs)


def test_sysinfo(tmp_path):
    assert cpu_count() >= 1
    assert len(device_test(verbose=False)) >= 1
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    assert md5sum(str(p)) == "5d41402abc4b2a76b9719d911017c592"
    # folder digest (reference __md5sum__.py:16-21): deterministic on
    # content — equal trees hash equal, any content change flips it
    from bio_image_unet_tpu.tools import md5sum_folder

    d1, d2 = tmp_path / "d1", tmp_path / "d2"
    for d in (d1, d2):
        (d / "sub").mkdir(parents=True)
        (d / "a.txt").write_bytes(b"alpha")
        (d / "sub" / "b.txt").write_bytes(b"beta")
    assert md5sum_folder(str(d1)) == md5sum_folder(str(d2))
    (d2 / "sub" / "b.txt").write_bytes(b"BETA")
    assert md5sum_folder(str(d1)) != md5sum_folder(str(d2))
    # tar-like entry semantics: a dangling symlink is an entry (hashed by
    # target string), not a crash; an empty subdir changes the digest
    base = md5sum_folder(str(d1))
    os.symlink("does/not/exist", d1 / "dangling")
    with_link = md5sum_folder(str(d1))
    assert with_link != base
    os.remove(d1 / "dangling")
    assert md5sum_folder(str(d1)) == base
    (d1 / "empty").mkdir()
    assert md5sum_folder(str(d1)) != base
    (d1 / "empty").rmdir()
    assert md5sum_folder(str(d1)) == base
    header = get_info_file_header("job")
    assert "host:" in header and "cpu_count:" in header
    write_info_file(str(tmp_path / "info.txt"), "job", extra="note")
    assert "note" in (tmp_path / "info.txt").read_text()


def test_annotator_requires_gui():
    from bio_image_unet_tpu.tools import ImageAnnotator

    with pytest.raises(ImportError):
        ImageAnnotator("/nonexistent", "/nonexistent")


def test_low_mem_streaming_helpers(tmp_path, rng):
    from bio_image_unet_tpu.tools import fetch_frame, individual_tif_generator, stream_write

    frames = rng.integers(0, 255, (4, 16, 16), dtype=np.uint8)
    src = str(tmp_path / "m.tif")
    tiff.imwrite(src, frames)
    # stream-copy with bounded memory
    out = str(tmp_path / "copy.tif")
    assert stream_write(out, fetch_frame(src)) == 4
    np.testing.assert_array_equal(tiff.imread(out), frames)
    # per-index directory generator
    for i, f in enumerate(frames):
        tiff.imwrite(str(tmp_path / f"{i}.tif"), f)
    gen = list(individual_tif_generator(tmp_path, 4))
    np.testing.assert_array_equal(np.stack(gen), frames)


def test_movie_ffmpeg_commands(tmp_path, monkeypatch):
    """ffmpeg isn't installed in CI — record the exact argv each export
    helper would run (reference util.py:39-52 shells out unquoted; here
    list-argv subprocess calls, no shell)."""
    from bio_image_unet_tpu.tools import movie as movie_mod
    from bio_image_unet_tpu.tools import (compare_videos_vstack,
                                          create_zoomed_in_comparison,
                                          crop_zoom)

    calls = []
    monkeypatch.setattr(movie_mod, "_require_ffmpeg", lambda: "ffmpeg")
    monkeypatch.setattr(movie_mod.subprocess, "run",
                        lambda cmd, **kw: calls.append(cmd))

    crop_zoom("a.mp4", "z.mp4", "100", "80")          # centered crop
    assert "crop=100:80,scale=iw:ih" in calls[-1]
    crop_zoom("a.mp4", "z.mp4", "100", "80", "5", "7")
    assert "crop=100:80:5:7,scale=iw:ih" in calls[-1]

    compare_videos_vstack(["a.mp4", "b.mp4"], "out.mp4")
    assert "vstack=inputs=2" in calls[-1]
    with pytest.raises(ValueError):
        compare_videos_vstack(["a.mp4"], "out.mp4")

    calls.clear()
    create_zoomed_in_comparison("a.mp4", "b.mp4", "64", "64",
                                output=str(tmp_path / "cmp.mp4"))
    # two crops into a private temp dir, then one vstack of those crops
    assert len(calls) == 3
    assert calls[0][-1] != calls[1][-1] and "vstack=inputs=2" in calls[2]
    assert calls[2][calls[2].index("-i") + 1] == calls[0][-1]
