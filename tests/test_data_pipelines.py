"""DataProcess pipeline tests — the reference's random-TIFF fixture pattern
(utils/test.py:26-34) plus unit checks of the staging/tiling/augmentation
semantics against reference rules (unet/data.py etc.)."""

import os

import numpy as np
import pytest

from bio_image_unet_tpu.data import (
    DataLoader,
    DataProcess2D,
    DataProcess3D,
    DataProcessMultiOutput,
    DataProcessMultiOutput3D,
    DataProcessSiam,
    clip_and_normalize,
    random_split,
    tiff,
    tile_starts,
)


def _write_random_tifs(tmpdir, n=3, shape=(80, 96), mask=False, rng=None):
    rng = rng or np.random.default_rng(0)
    d = str(tmpdir)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        if mask:
            arr = (rng.random(shape) > 0.5).astype(np.uint8) * 255
        else:
            arr = rng.integers(0, 255, shape, dtype=np.uint8)
        tiff.imwrite(os.path.join(d, f"img_{i}.tif"), arr)
    return d + "/"


def test_tile_starts_matches_reference_rule():
    # ceil(256/64) = 4 tiles, linspace starts over [0, 192]
    np.testing.assert_array_equal(tile_starts(256, 64), [0, 64, 128, 192])
    # non-divisible: ceil(100/64)=2 starts [0, 36]
    np.testing.assert_array_equal(tile_starts(100, 64), [0, 36])
    # add_tile only when >1 tile
    assert len(tile_starts(100, 64, 1)) == 3
    assert len(tile_starts(64, 64, 1)) == 1


def test_clip_and_normalize_range(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32) * 50 + 100
    out = clip_and_normalize(img, (2, 98))
    assert out.min() == 0.0 and out.max() == 255.0


def test_dataprocess2d_end_to_end(tmp_path, rng):
    img_dir = _write_random_tifs(tmp_path / "image", 3, (80, 96), rng=rng)
    mask_dir = _write_random_tifs(tmp_path / "label", 3, (80, 96), mask=True, rng=rng)
    data = DataProcess2D(
        (img_dir, mask_dir), dim_out=(64, 64), aug_factor=2,
        data_path=str(tmp_path / "data"), seed=0,
    )
    # 3 images × (2×2 tiles) × aug 2 = 24
    assert len(data) == 24
    item = data[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["mask"].shape == (64, 64, 1)
    assert item["image"].dtype == np.float32
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    # staging tree exists (reference directory contract, unet/data.py:98-122)
    for sub in ["image", "mask", "merge", "split/image", "split/mask",
                "augmentation/aug_image", "augmentation/aug_mask"]:
        assert os.path.isdir(os.path.join(str(tmp_path / "data"), sub)), sub


def test_dataprocess2d_no_aug_reads_split(tmp_path, rng):
    img_dir = _write_random_tifs(tmp_path / "image", 2, (64, 64), rng=rng)
    mask_dir = _write_random_tifs(tmp_path / "label", 2, (64, 64), mask=True, rng=rng)
    data = DataProcess2D((img_dir, mask_dir), dim_out=(64, 64), aug_factor=None,
                         data_path=str(tmp_path / "data"), seed=0)
    assert len(data) == 2
    item = data[0]
    # mask comes from the mask dir (reference bug reads image dir) — binary-ish
    assert set(np.unique(item["mask"])) <= {0.0, 1.0}


def test_dataprocess_siam(tmp_path, rng):
    # W-doubled images: left = prev frame
    img_dir = _write_random_tifs(tmp_path / "image", 2, (64, 128), rng=rng)
    mask_dir = _write_random_tifs(tmp_path / "label", 2, (64, 64), mask=True, rng=rng)
    data = DataProcessSiam((img_dir, mask_dir), dim_out=(64, 64), aug_factor=2,
                           data_path=str(tmp_path / "data"), seed=0)
    assert len(data) == 4
    item = data[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["prev_image"].shape == (64, 64, 1)
    assert item["mask"].shape == (64, 64, 1)


def test_dataprocess3d(tmp_path, rng):
    vol_dir = str(tmp_path / "vol")
    mask_dir = str(tmp_path / "masks")
    os.makedirs(vol_dir), os.makedirs(mask_dir)
    for i in range(2):
        tiff.imwrite(os.path.join(vol_dir, f"v{i}.tif"),
                     rng.integers(0, 255, (20, 40, 40), dtype=np.uint8))
        tiff.imwrite(os.path.join(mask_dir, f"v{i}.tif"),
                     (rng.random((20, 40, 40)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess3D((vol_dir + "/", mask_dir + "/"), dim_out=(8, 32, 32),
                         aug_factor=2, data_path=str(tmp_path / "data"), seed=0)
    # per volume: N_z=ceil(20/8)=3, N_x=N_y=ceil(40/32)=2 → 12 tiles ×2 vol ×2 aug
    assert len(data) == 48
    item = data[0]
    assert item["volume"].shape == (8, 32, 32, 1)
    assert item["mask"].shape == (8, 32, 32, 1)


def test_dataprocess_multioutput(tmp_path, rng):
    img_dir = str(tmp_path / "image")
    t1 = str(tmp_path / "mask")
    t2 = str(tmp_path / "orientation")
    os.makedirs(img_dir), os.makedirs(t1), os.makedirs(t2)
    for i in range(2):
        name = f"s{i}.tif"
        tiff.imwrite(os.path.join(img_dir, name),
                     rng.integers(0, 255, (96, 96), dtype=np.uint8))
        tiff.imwrite(os.path.join(t1, name), (rng.random((96, 96)) > 0.5).astype(np.float32))
        ori = rng.uniform(0, 2 * np.pi, (96, 96)).astype(np.float32)
        ori[:10] = np.nan  # NaN region must survive the pipeline
        tiff.imwrite(os.path.join(t2, name), ori)
    data = DataProcessMultiOutput(
        img_dir, [t1, t2], {"mask": "mask", "orientation": "mask"},
        data_dir=str(tmp_path / "data"), dim_out=(64, 64), aug_factor=1,
        nan_to_val=0.0, seed=0,
    )
    # patches/image = max(int(96*96/(64*64)*1), 2) = 2 → 4 total
    assert len(data) == 4
    item = data[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["mask"].shape == (64, 64, 1)
    # orientation becomes a cos/sin 2-vector (reference data.py:340-341)
    assert item["orientation"].shape == (64, 64, 2)
    assert np.isfinite(item["orientation"]).all()  # NaNs → nan_to_val


def test_dataprocess_multioutput3d(tmp_path, rng):
    vol_dir = str(tmp_path / "volume")
    t1 = str(tmp_path / "mask")
    os.makedirs(vol_dir), os.makedirs(t1)
    for i in range(2):
        name = f"v{i}.tif"
        tiff.imwrite(os.path.join(vol_dir, name),
                     rng.integers(0, 255, (12, 48, 48), dtype=np.uint8))
        tiff.imwrite(os.path.join(t1, name), (rng.random((12, 48, 48)) > 0.5).astype(np.float32))
    data = DataProcessMultiOutput3D(
        vol_dir, [t1], data_dir=str(tmp_path / "data"), dim_out=(8, 32, 32),
        aug_factor=2, scale_limit=(0, 0), seed=0,
    )
    assert len(data) == 4
    item = data[0]
    assert item["volume"].shape == (8, 32, 32, 1)
    assert item["mask"].shape == (8, 32, 32, 1)


def test_random_split_and_loader(tmp_path, rng):
    img_dir = _write_random_tifs(tmp_path / "image", 2, (64, 64), rng=rng)
    mask_dir = _write_random_tifs(tmp_path / "label", 2, (64, 64), mask=True, rng=rng)
    data = DataProcess2D((img_dir, mask_dir), dim_out=(64, 64), aug_factor=5,
                         data_path=str(tmp_path / "data"), seed=0)
    train, val = random_split(data, 0.2, seed=0)
    assert len(train) + len(val) == len(data) == 10
    assert len(val) == 2
    loader = DataLoader(train, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 64, 64, 1)
    assert batches[0]["mask"].shape == (4, 64, 64, 1)
    # unprefetched iteration matches length too
    assert len(list(DataLoader(train, batch_size=4, prefetch=0))) == 2


def test_dataloader_abandoned_iteration_releases_worker():
    """Breaking out of a DataLoader early (early stopping, smoke tests) must
    not leak the prefetch thread blocked on a full queue."""
    import gc
    import threading
    import time

    from bio_image_unet_tpu.data.pipelines import DataLoader

    class _DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full((4, 4), i, np.float32)}

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(_DS(), batch_size=2, prefetch=2))
        next(it)
        it.close()  # abandon mid-iteration
    gc.collect()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch threads leaked"


def test_tif_files_uppercase_extension(tmp_path):
    from bio_image_unet_tpu.data.pipelines import _tif_files

    (tmp_path / "A.TIF").write_bytes(b"x")
    (tmp_path / "b.tif").write_bytes(b"x")
    assert len(_tif_files(str(tmp_path))) == 2
    assert len(_tif_files(str(tmp_path), (".TIF",))) == 2  # user-supplied case


def test_3d_split_add_patch_every_tiled_axis(tmp_path, rng):
    """add_patch applies to every axis with >1 tiles (documented divergence
    from the reference's copy-paste rule, unet3d/data.py:188-190)."""
    from bio_image_unet_tpu.data.pipelines import tile_starts

    # z tiled (2 tiles) now gets the extra patch too
    assert len(tile_starts(16, 8, 1)) == 3
    assert len(tile_starts(8, 8, 1)) == 1  # single tile never padded


def test_dataprocess2d_no_aug_multichannel_mask_layout(tmp_path, rng):
    """Non-augmented split tiles are stored as HWC pages; the loader must
    return (H, W, C) with channel content intact (the round-4 review found
    the CHW reader scrambling multichannel split tiles to (W, C, H))."""
    img_dir = str(tmp_path / "image") + "/"
    mask_dir = str(tmp_path / "label") + "/"
    os.makedirs(img_dir), os.makedirs(mask_dir)
    img = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    mask = (rng.random((2, 64, 64)) > 0.5).astype(np.uint8) * 255  # (C,H,W)
    tiff.imwrite(os.path.join(img_dir, "a.tif"), img)
    tiff.imwrite(os.path.join(mask_dir, "a.tif"), mask)
    data = DataProcess2D((img_dir, mask_dir), dim_out=(64, 64),
                         aug_factor=None, out_channels=2,
                         data_path=str(tmp_path / "data"), seed=0)
    item = data[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["mask"].shape == (64, 64, 2)
    # single 64² tile of a 64² source → channel content round-trips exactly
    for c in range(2):
        np.testing.assert_array_equal(item["mask"][..., c],
                                      mask[c].astype(np.float32) / 255.0,
                                      err_msg=f"channel {c}")


def test_dataprocess_len_ignores_stray_files(tmp_path, rng):
    """A stray OS/editor file in a persisted tile dir must not shift the
    dense {idx}.tif index range (len counted os.listdir before round 4)."""
    img_dir = _write_random_tifs(tmp_path / "image", 2, (64, 64), rng=rng)
    mask_dir = _write_random_tifs(tmp_path / "label", 2, (64, 64), mask=True,
                                  rng=rng)
    data = DataProcess2D((img_dir, mask_dir), dim_out=(64, 64), aug_factor=2,
                         data_path=str(tmp_path / "data"), seed=0)
    n = len(data)
    for stray in (".DS_Store", "Thumbs.db", "notes.txt"):
        with open(os.path.join(data.aug_image_path, stray), "w") as fh:
            fh.write("junk")
    assert len(data) == n
    data[n - 1]  # every dense index still loads
    with pytest.raises(IndexError):
        data[n]
