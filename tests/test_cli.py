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
