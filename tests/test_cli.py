"""CLI smoke: python -m bio_image_unet_tpu train/predict/devices
(a capability the reference lacks — SURVEY.md §1 'no CLI')."""

import os

import numpy as np

from bio_image_unet_tpu.__main__ import main
from bio_image_unet_tpu.data import tiff


def test_cli_train_predict(tmp_path, rng):
    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub)
    for i in range(3):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255)
    rc = main(["train", "--family", "unet",
               "--image-dir", str(tmp_path / "image"),
               "--label-dir", str(tmp_path / "label"),
               "--workdir", str(tmp_path / "run"),
               "--epochs", "1", "--batch-size", "4", "--n-filter", "4",
               "--dim", "32", "32", "--aug-factor", "2"])
    assert rc == 0
    assert (tmp_path / "run" / "model" / "model.ckpt").exists()

    tiff.imwrite(str(tmp_path / "movie.tif"),
                 rng.integers(0, 255, (2, 64, 64), dtype=np.uint8))
    rc = main(["predict", "--family", "unet",
               "--input", str(tmp_path / "movie.tif"),
               "--output", str(tmp_path / "pred.tif"),
               "--checkpoint", str(tmp_path / "run" / "model" / "model.ckpt"),
               "--resize-dim", "32", "32", "--batch-size", "4"])
    assert rc == 0
    assert tiff.imread(str(tmp_path / "pred.tif")).shape == (2, 64, 64)


def test_cli_devices(capsys):
    assert main(["devices"]) == 0
    assert "backend" in capsys.readouterr().out


def test_cli_train_predict_multi_output(tmp_path, rng):
    """The multi_output families train and predict from the CLI: target dirs
    become heads (default sigmoid/BCEDiceLoss config)."""
    for sub in ("image", "mask"):
        os.makedirs(tmp_path / sub)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "image" / f"s{i}.tif"),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "mask" / f"s{i}.tif"),
                     (rng.random((64, 64)) > 0.5).astype(np.float32))
    rc = main(["train", "--family", "multi_output_unet",
               "--image-dir", str(tmp_path / "image"),
               "--target-dir", str(tmp_path / "mask"),
               "--network", "MultiOutputUnet",
               "--workdir", str(tmp_path / "run"),
               "--epochs", "1", "--batch-size", "4", "--n-filter", "4",
               "--dim", "32", "32", "--aug-factor", "4"])
    assert rc == 0
    ckpt = tmp_path / "run" / "model" / "model.ckpt"
    assert ckpt.exists()

    # no --family: inferred from the checkpoint's embedded model_name
    rc = main(["predict",
               "--input", str(tmp_path / "image" / "s0.tif"),
               "--output", str(tmp_path / "results"),
               "--checkpoint", str(ckpt), "--batch-size", "4"])
    assert rc == 0
    assert (tmp_path / "results" / "mask.tif").exists()
