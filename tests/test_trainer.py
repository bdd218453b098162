"""Generic Trainer smoke + semantics tests at toy scale (the reference's
utils/test.py recipe, plus unit checks of scheduler/resume/checkpointing)."""

import os

import numpy as np
import pytest

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.data import (
    DataProcess2D,
    DataProcess3D,
    DataProcessMultiOutput,
    DataProcessSiam,
    tiff,
)
from bio_image_unet_tpu.train import Trainer
from bio_image_unet_tpu.train.trainer import ReduceLROnPlateau


def _random_dataset_2d(tmp_path, rng, n=3, shape=(64, 64)):
    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(n):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, shape, dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random(shape) > 0.5).astype(np.uint8) * 255)
    return DataProcess2D(
        (str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),
        dim_out=(32, 32), aug_factor=4, data_path=str(tmp_path / "data"), seed=0,
    )


def test_reduce_lr_on_plateau_matches_torch_semantics():
    s = ReduceLROnPlateau(factor=0.1, patience=2)
    scales = [s.step(v) for v in [1.0, 0.9, 0.9, 0.9, 0.9, 0.8]]
    # epochs 2,3 are bad (<=patience), epoch 4 is the 3rd bad -> reduce
    assert scales == [1.0, 1.0, 1.0, 1.0, 0.1, 0.1]


def test_trainer_2d_end_to_end(tmp_path, rng):
    data = _random_dataset_2d(tmp_path, rng)
    trainer = Trainer(
        data, num_epochs=2, network="Unet", batch_size=4, lr=1e-3,
        n_filter=4, save_dir=str(tmp_path / "out"), save_name="model.ckpt", seed=0,
    )
    best = trainer.start()
    assert np.isfinite(best)
    ckpt_path = tmp_path / "out" / "model.ckpt"
    assert ckpt_path.exists()
    meta = checkpoint.peek(str(ckpt_path))
    # self-describing schema (reference unet/train.py:107-118)
    hp = meta["hyperparams"]
    assert hp["model_name"] == "Unet"
    assert hp["n_filter"] == 4
    assert hp["loss_function"] == "BCEDice"
    assert "augmentation" in hp and "clip_threshold" in hp
    # metrics CSV written
    assert (tmp_path / "out" / "metrics.csv").read_text().count("\n") >= 3


def test_trainer_resume(tmp_path, rng):
    data = _random_dataset_2d(tmp_path, rng)
    out = str(tmp_path / "out")
    t1 = Trainer(data, num_epochs=1, network="Unet", batch_size=4, n_filter=4,
                 save_dir=out, seed=0)
    t1.start()
    t2 = Trainer(data, num_epochs=1, network="Unet", batch_size=4, n_filter=4,
                 save_dir=out, load_weights=True, seed=0)
    assert t2.epoch_start == 0  # saved at epoch 0
    assert np.isfinite(t2.best_loss)
    t2.start()
    meta = checkpoint.peek(os.path.join(out, "model.ckpt"))
    assert meta["has_opt_state"]


def test_trainer_siam(tmp_path, rng):
    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(3):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (32, 64), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255)
    data = DataProcessSiam(
        (str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),
        dim_out=(32, 32), aug_factor=4, data_path=str(tmp_path / "data"), seed=0,
    )
    trainer = Trainer(data, num_epochs=1, network="Siam_UNet", mode="max",
                      batch_size=4, n_filter=4, save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert checkpoint.peek(str(tmp_path / "out" / "model.ckpt"))["hyperparams"]["mode"] == "max"


def test_trainer_3d_with_time_loss(tmp_path, rng):
    for sub in ("vol", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "vol" / f"v{i}.tif"),
                     rng.integers(0, 255, (16, 32, 32), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"v{i}.tif"),
                     (rng.random((16, 32, 32)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess3D(
        (str(tmp_path / "vol") + "/", str(tmp_path / "label") + "/"),
        dim_out=(8, 16, 16), aug_factor=2, data_path=str(tmp_path / "data"), seed=0,
    )
    trainer = Trainer(data, num_epochs=1, network="UNet3D", batch_size=4,
                      n_filter=4, time_loss_weight=0.1,
                      save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)


def test_trainer_multi_output_deep_supervision(tmp_path, rng):
    img_dir, t1 = str(tmp_path / "image"), str(tmp_path / "mask")
    os.makedirs(img_dir), os.makedirs(t1)
    for i in range(2):
        name = f"s{i}.tif"
        tiff.imwrite(os.path.join(img_dir, name),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(os.path.join(t1, name), (rng.random((64, 64)) > 0.5).astype(np.float32))
    data = DataProcessMultiOutput(
        img_dir, [t1], {"mask": "mask"}, data_dir=str(tmp_path / "data"),
        dim_out=(32, 32), aug_factor=8, seed=0,
    )
    heads = {"mask": {"channels": 1, "activation": "sigmoid",
                      "loss": "BCEDiceLoss", "weight": 1.0}}
    trainer = Trainer(
        data, num_epochs=1, network="MultiOutputNestedUNet_3Levels", levels=3,
        batch_size=4, n_filter=4, output_heads=heads, deep_supervision=True,
        grad_clip=1.0, save_dir=str(tmp_path / "out"), log_images=True, seed=0,
    )
    best = trainer.start()
    assert np.isfinite(best)
    hp = checkpoint.peek(str(tmp_path / "out" / "model.ckpt"))["hyperparams"]
    assert hp["deep_supervision"] is True
    assert "output_heads" in hp
    # validation imaging written (≙ multi_output_unet/train.py val_results)
    assert os.path.isdir(str(tmp_path / "out" / "val_results"))


def test_trainer_explicit_mesh(tmp_path, rng):
    """Training with an explicit 8-device mesh: gradients psum over the data
    axis — loss trajectory must stay finite and a checkpoint must land."""
    from bio_image_unet_tpu.parallel import get_mesh

    data = _random_dataset_2d(tmp_path, rng)
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=8,
                      n_filter=4, mesh=get_mesh(), save_dir=str(tmp_path / "out"),
                      seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()


def test_temporal_loss_batch_of_one_not_nan(tmp_path, rng):
    """Regression: a single-sample val batch with time_loss_weight must not
    produce NaN (smooth_l1 over an empty adjacent-slice diff)."""
    for sub in ("vol", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "vol" / f"v{i}.tif"),
                     rng.integers(0, 255, (8, 16, 16), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"v{i}.tif"),
                     (rng.random((8, 16, 16)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess3D(
        (str(tmp_path / "vol") + "/", str(tmp_path / "label") + "/"),
        dim_out=(8, 16, 16), aug_factor=2, data_path=str(tmp_path / "data"), seed=0,
    )
    assert len(data) == 4  # val split -> 1 sample -> batch of one
    trainer = Trainer(data, num_epochs=1, network="UNet3D", batch_size=2,
                      n_filter=4, time_loss_weight=0.1,
                      save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()


def test_trainer_val_split_zero(tmp_path, rng):
    """val_split=0: train loss drives scheduling/saving (the reference
    crashes on an empty val loader)."""
    data = _random_dataset_2d(tmp_path, rng)
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=4,
                      n_filter=4, val_split=0.0, save_dir=str(tmp_path / "out"),
                      seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()


def test_trainer_remat_and_half_precision(tmp_path, rng):
    """remat (grad checkpointing) + bf16 compute: one epoch trains to a
    finite loss and checkpoints."""
    data = _random_dataset_2d(tmp_path, rng)
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=4,
                      n_filter=4, remat=True, half_precision=True,
                      save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()


def test_trainer_device_cache_fused_epoch(tmp_path, rng):
    """device_cache=True: HBM-resident dataset + one lax.scan dispatch per
    epoch — trains to a finite loss and checkpoints."""
    data = _random_dataset_2d(tmp_path, rng)
    trainer = Trainer(data, num_epochs=2, network="Unet", batch_size=4,
                      n_filter=4, device_cache=True, device_augment=True,
                      save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()
    # two epochs logged
    assert (tmp_path / "out" / "metrics.csv").read_text().count("\n") >= 3
