"""Facade subpackage tests — the reference's end-to-end smoke recipe
(utils/test.py:18-111: random TIFFs → DataProcess → Trainer → Predict)
run through the drop-in surfaces."""

import os

import numpy as np

from bio_image_unet_tpu.data import tiff


def test_facade_exports():
    import bio_image_unet_tpu.multi_output_unet as mo
    import bio_image_unet_tpu.multi_output_unet3d as mo3d
    import bio_image_unet_tpu.siam_unet as siam
    import bio_image_unet_tpu.unet as unet
    import bio_image_unet_tpu.unet3d as unet3d

    for pkg in (unet, siam, unet3d, mo, mo3d):
        for name in ("DataProcess", "Trainer", "Predict"):
            assert hasattr(pkg, name), (pkg.__name__, name)
    assert unet.Unet is not None and unet.AttentionUnet is not None
    assert siam.Siam_UNet is not None
    assert unet3d.UNet3D is not None
    assert mo.MultiOutputNestedUNet is not None
    assert mo3d.MultiOutputUnet3D is not None
    # multi_output's BCEDiceLoss is the probability-space variant
    from bio_image_unet_tpu.losses import BCEDiceLossProb

    assert mo.BCEDiceLoss is BCEDiceLossProb


def test_unet_facade_end_to_end(tmp_path, rng):
    """≙ utils/test.py:18-46 test_unet at toy scale."""
    import bio_image_unet_tpu.unet as unet

    img_dir, mask_dir = tmp_path / "image", tmp_path / "label"
    os.makedirs(img_dir), os.makedirs(mask_dir)
    for i in range(3):
        tiff.imwrite(str(img_dir / f"img_{i}.tif"),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(str(mask_dir / f"img_{i}.tif"),
                     (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255)

    data = unet.DataProcess(
        (str(img_dir) + "/", str(mask_dir) + "/"), dim_out=(32, 32),
        aug_factor=3, data_path=str(tmp_path / "data"), seed=0,
    )
    trainer = unet.Trainer(data, num_epochs=2, batch_size=4, n_filter=4,
                           save_dir=str(tmp_path / "out"), seed=0)
    trainer.start()

    movie = rng.integers(0, 255, (3, 64, 64), dtype=np.uint8)
    result_path = str(tmp_path / "pred.tif")
    pred = unet.Predict(movie, result_path, str(tmp_path / "out" / "model.ckpt"),
                        resize_dim=(32, 32), show_progress=False, batch_size=4)
    assert pred.result.shape == (3, 64, 64)
    assert os.path.exists(result_path)
    saved = tiff.imread(result_path)
    assert saved.dtype == np.float16


def test_multi_output_facade_end_to_end(tmp_path, rng):
    """multi_output_unet facade: DataProcess → Trainer (TensorBoard + val
    imaging defaults) → Predict, per-head results."""
    import bio_image_unet_tpu.multi_output_unet as mo

    img_dir, t1 = str(tmp_path / "image"), str(tmp_path / "mask")
    os.makedirs(img_dir), os.makedirs(t1)
    for i in range(2):
        name = f"s{i}.tif"
        tiff.imwrite(os.path.join(img_dir, name),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(os.path.join(t1, name),
                     (rng.random((64, 64)) > 0.5).astype(np.float32))

    data = mo.DataProcess(img_dir, [t1], {"mask": "mask"},
                          data_dir=str(tmp_path / "data"), dim_out=(32, 32),
                          aug_factor=8, seed=0)
    heads = {"mask": {"channels": 1, "activation": "sigmoid",
                      "loss": "BCEDiceLoss", "weight": 1.0}}
    trainer = mo.Trainer(data, num_epochs=1, network="MultiOutputUnet",
                         batch_size=4, n_filter=4, output_heads=heads,
                         save_dir=str(tmp_path / "out"), seed=0)
    trainer.start()
    # TensorBoard logs + validation imaging written by default
    assert os.path.isdir(str(tmp_path / "out" / "logs"))
    assert os.path.isdir(str(tmp_path / "out" / "val_results"))

    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    pred = mo.Predict(imgs, str(tmp_path / "out" / "model.ckpt"),
                      result_path=str(tmp_path / "res"), max_patch_size=(32, 32),
                      show_progress=False, batch_size=4, safe_margin=4)
    assert pred.result["mask"].shape == (2, 48, 48)
    assert np.isfinite(pred.result["mask"]).all()
