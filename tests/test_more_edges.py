"""Remaining contract edges: siam whole-frame mode (resize_dim=None),
DataProcess(create=False) reuse, string load_weights, and the
multi_output_unet3d facade end-to-end."""

import os

import numpy as np

from bio_image_unet_tpu.data import DataProcess2D, tiff


def test_siam_whole_frame_mode(tmp_path, rng):
    """resize_dim=None → whole-frame convolution (siam_unet/predict.py:82-85)."""
    import torch

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_siam_wf", "/root/reference/bio_image_unet/siam_unet/siam_unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.Siam_UNet(n_filter=4, mode="max").eval()
    ckpt = str(tmp_path / "s.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Siam_UNet",
                "n_filter": 4, "mode": "max"}, ckpt)

    from bio_image_unet_tpu.predict import PredictSiam

    movie = str(tmp_path / "m.tif")
    tiff.imwrite(movie, rng.integers(0, 255, (3, 48, 64), dtype=np.uint8))
    out = str(tmp_path / "o.tif")
    PredictSiam(movie, out, ckpt, resize_dim=None, show_progress=False)
    assert tiff.imread(out).shape == (3, 48, 64)


def test_dataprocess_create_false_reuses(tmp_path, rng):
    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255)
    args = ((str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),)
    kw = dict(dim_out=(32, 32), aug_factor=2, data_path=str(tmp_path / "data"))
    first = DataProcess2D(*args, seed=0, **kw)
    n = len(first)
    item0 = first[0]
    # reuse the staged data without regenerating
    second = DataProcess2D(*args, create=False, **kw)
    assert len(second) == n
    np.testing.assert_array_equal(second[0]["image"], item0["image"])


def test_load_weights_path_string(tmp_path, rng):
    from bio_image_unet_tpu.train import Trainer

    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (32, 32), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess2D(
        (str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),
        dim_out=(32, 32), aug_factor=4, data_path=str(tmp_path / "data"), seed=0)
    t1 = Trainer(data, num_epochs=1, network="Unet", batch_size=4, n_filter=4,
                 save_dir=str(tmp_path / "a"), seed=0)
    t1.start()
    # siam-style path form (siam_unet/train.py:96-98)
    t2 = Trainer(data, num_epochs=1, network="Unet", batch_size=4, n_filter=4,
                 save_dir=str(tmp_path / "b"),
                 load_weights=str(tmp_path / "a" / "model.ckpt"), seed=0)
    assert np.isfinite(t2.best_loss)
    t2.start()


def test_multi_output_unet3d_facade(tmp_path, rng):
    """mo3d facade: positional output_heads ctor (reference
    multi_output_unet3d/train.py:57) through train + predict."""
    import bio_image_unet_tpu.multi_output_unet3d as mo3d

    vol_dir, t_dir = str(tmp_path / "volume"), str(tmp_path / "mask")
    os.makedirs(vol_dir), os.makedirs(t_dir)
    for i in range(2):
        name = f"v{i}.tif"
        tiff.imwrite(os.path.join(vol_dir, name),
                     rng.integers(0, 255, (12, 32, 32), dtype=np.uint8))
        tiff.imwrite(os.path.join(t_dir, name),
                     (rng.random((12, 32, 32)) > 0.5).astype(np.float32))
    data = mo3d.DataProcess(vol_dir, [t_dir], data_dir=str(tmp_path / "data"),
                            dim_out=(8, 16, 16), aug_factor=4,
                            scale_limit=(0, 0), seed=0)
    heads = {"mask": {"channels": 1, "activation": "sigmoid",
                      "loss": "BCEDiceLoss", "weight": 1.0}}
    trainer = mo3d.Trainer(data, heads, num_epochs=1, batch_size=2,
                           n_filter=4, save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)

    vol = rng.integers(0, 255, (10, 24, 24), dtype=np.uint8)
    pred = mo3d.Predict(vol, str(tmp_path / "out" / "model.ckpt"),
                        result_path=str(tmp_path / "res"),
                        max_patch_size=(8, 16, 16), overlap_factor=0.25,
                        show_progress=False, batch_size=2, blend_margin=4)
    assert pred.result["mask"].shape == (10, 24, 24)
