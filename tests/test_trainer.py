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
    # the resume APPENDED to the metric history instead of truncating it
    # (round-4 review finding): one header + both runs' epoch rows
    lines = [ln for ln in
             (tmp_path / "out" / "metrics.csv").read_text().splitlines() if ln]
    assert lines[0].startswith("epoch")
    assert sum(ln.startswith("epoch") for ln in lines) == 1
    assert len(lines) == 3, lines


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


def test_reduce_lr_threshold_matches_torch():
    """Scheduler parity vs torch.optim.lr_scheduler.ReduceLROnPlateau on a
    recorded loss sequence with sub-threshold 'improvements' (the reference
    relies on torch's default rel threshold 1e-4, unet/train.py:103)."""
    import torch

    seq = [1.0, 0.99995, 0.99994, 0.99993, 0.99992, 0.99991, 0.9999,
           0.5, 0.49999, 0.49998, 0.49997, 0.49996, 0.49995, 0.3]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=4)
    ours = ReduceLROnPlateau(factor=0.1, patience=4)
    for v in seq:
        tsched.step(v)
        scale = ours.step(v)
        assert scale == pytest.approx(opt.param_groups[0]["lr"]), v


def test_default_mesh_uses_largest_dividing_data_axis(tmp_path, rng):
    """batch 12 on an 8-device host must train on 6 devices (largest divisor
    of the batch ≤ device count), not silently fall back to 1."""
    data = _random_dataset_2d(tmp_path, rng, n=4)
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=12,
                      n_filter=4, save_dir=str(tmp_path / "out"), seed=0)
    assert trainer.mesh.shape["data"] == 6


def test_device_cache_multichip_matches_single_chip(tmp_path, rng):
    """The fused-epoch scan with the dataset replicated and index rows
    sharded over 8 devices reproduces the single-device loss trajectory."""
    from bio_image_unet_tpu.parallel import get_mesh

    data = _random_dataset_2d(tmp_path, rng, n=4)

    def run(mesh, out):
        t = Trainer(data, num_epochs=2, network="Unet", batch_size=8,
                    n_filter=4, device_cache=True, mesh=mesh,
                    save_dir=str(tmp_path / out), seed=0)
        t.start()
        rows = (tmp_path / out / "metrics.csv").read_text().strip().splitlines()[1:]
        return [float(r.split(",")[1]) for r in rows]

    single = run(get_mesh(n_data=1), "single")
    multi = run(get_mesh(n_data=8), "multi")
    np.testing.assert_allclose(multi, single, rtol=1e-4)


def test_device_augment_multi_output_orientation():
    """augment_batch_heads: orientation cos/sin channels stay unit-norm under
    the rotated-frame re-expression; non-orientation targets keep shape."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.data.augment_jax import augment_batch_heads

    rng = np.random.default_rng(3)
    b = 8
    image = jnp.asarray(rng.random((b, 16, 16, 1), np.float32))
    theta = rng.uniform(0, 2 * np.pi, (b, 16, 16)).astype(np.float32)
    targets = {
        "mask": jnp.asarray((rng.random((b, 16, 16, 1)) > 0.5).astype(np.float32)),
        "orientation": jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1),
    }
    img, out = augment_batch_heads(jax.random.PRNGKey(0), image, targets,
                                   orientation_keys=("orientation",),
                                   p_pipeline=1.0)
    assert img.shape == image.shape
    assert out["mask"].shape == targets["mask"].shape
    norm = np.asarray(out["orientation"][..., 0] ** 2 + out["orientation"][..., 1] ** 2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)
    # mask stays binary (pure spatial permutation, no intensity ops)
    assert set(np.unique(np.asarray(out["mask"]))) <= {0.0, 1.0}


def test_trainer_multi_output_device_augment(tmp_path, rng):
    """Multi-output training with device_augment=True (previously rejected)."""
    img_dir, t1 = str(tmp_path / "image"), str(tmp_path / "mask")
    os.makedirs(img_dir), os.makedirs(t1)
    for i in range(2):
        name = f"s{i}.tif"
        tiff.imwrite(os.path.join(img_dir, name),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(os.path.join(t1, name),
                     (rng.random((64, 64)) > 0.5).astype(np.float32))
    data = DataProcessMultiOutput(
        img_dir, [t1], {"mask": "mask"}, data_dir=str(tmp_path / "data"),
        dim_out=(32, 32), aug_factor=8, seed=0,
    )
    heads = {"mask": {"channels": 1, "activation": "sigmoid",
                      "loss": "BCEDiceLoss", "weight": 1.0}}
    trainer = Trainer(data, num_epochs=1, network="MultiOutputUnet",
                      batch_size=4, n_filter=4, output_heads=heads,
                      device_augment=True, save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)


def test_device_cache_sharded(tmp_path, rng):
    """device_cache='sharded': the dataset shards over the 8-device data
    axis, the epoch runs under shard_map with per-shard shuffling and pmean
    collectives — trains to a finite loss and checkpoints."""
    from bio_image_unet_tpu.parallel import get_mesh

    data = _random_dataset_2d(tmp_path, rng, n=4)
    trainer = Trainer(data, num_epochs=2, network="Unet", batch_size=8,
                      n_filter=4, device_cache="sharded",
                      mesh=get_mesh(n_data=8), save_dir=str(tmp_path / "out"),
                      seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    assert (tmp_path / "out" / "model.ckpt").exists()


def test_device_cache_sharded_single_chip_equals_replicated(tmp_path, rng):
    """On a 1-chip data axis the sharded mode degenerates exactly to the
    replicated mode (same permutations, pmean over one device is identity)."""
    from bio_image_unet_tpu.parallel import get_mesh

    data = _random_dataset_2d(tmp_path, rng, n=4)

    def run(mode, out):
        t = Trainer(data, num_epochs=2, network="Unet", batch_size=4,
                    n_filter=4, device_cache=mode, mesh=get_mesh(n_data=1),
                    save_dir=str(tmp_path / out), seed=0)
        t.start()
        rows = (tmp_path / out / "metrics.csv").read_text().strip().splitlines()[1:]
        return [float(r.split(",")[1]) for r in rows]

    np.testing.assert_allclose(run(True, "rep"), run("sharded", "sh"), rtol=1e-5)


def test_trainer_per_epoch_test_prediction(tmp_path, rng):
    """start(test_data_path=...) predicts the test folder after each epoch
    (≙ unet/train.py:190-197)."""
    data = _random_dataset_2d(tmp_path, rng)
    test_dir = tmp_path / "testdata"
    os.makedirs(test_dir)
    tiff.imwrite(str(test_dir / "t0.tif"),
                 rng.integers(0, 255, (48, 48), dtype=np.uint8))
    trainer = Trainer(data, num_epochs=1, network="Unet", batch_size=4,
                      n_filter=4, save_dir=str(tmp_path / "out"), seed=0)
    trainer.start(test_data_path=str(test_dir),
                  result_path=str(tmp_path / "results"),
                  test_resize_dim=(32, 32))
    outs = os.listdir(str(tmp_path / "results"))
    assert any("t0.tif" in f and "epoch_0" in f for f in outs), outs


class _SynthDS:
    """In-memory tile dataset for unit tests that don't need disk staging."""

    def __init__(self, n=8, shape=(32, 32, 1), keys=("image", "mask"), seed=0):
        self.n, self.shape, self.keys, self.seed = n, shape, keys, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(self.seed + i)
        out = {}
        for k in self.keys:
            if k == "image":
                out[k] = r.random(self.shape, np.float32)
            else:
                out[k] = (r.random(self.shape) > 0.5).astype(np.float32)
        return out


def test_multi_output_default_heads_checkpoint_predicts(tmp_path, rng):
    """With output_heads=None the checkpoint must store the RESOLVED default
    head dict (not None) so PredictMultiOutput can rebuild its targets."""
    from bio_image_unet_tpu.predict import PredictMultiOutput

    ds = _SynthDS(n=6, keys=("image", "default"))
    tr = Trainer(ds, num_epochs=1, network="MultiOutputUnet", n_filter=4,
                 batch_size=2, val_split=0.0, save_dir=str(tmp_path),
                 tensorboard=False, log_images=False)
    tr.start()
    hp = checkpoint.peek(str(tmp_path / "model.ckpt"))["hyperparams"]
    assert hp["output_heads"] is not None and "default" in hp["output_heads"]
    pred = PredictMultiOutput(rng.integers(0, 255, (48, 48)).astype(np.uint8),
                              str(tmp_path / "model.ckpt"),
                              max_patch_size=(32, 32), show_progress=False)
    assert "default" in pred.result


def test_deep_supervision_levels_from_model(tmp_path):
    """The 3-level nested UNet must train with the trainer's DEFAULT
    levels kwarg (4): the depth is reconciled from the model."""
    heads = {"mask": {"channels": 1, "activation": "sigmoid",
                      "loss": "BCEDiceLoss", "weight": 1.0}}
    ds = _SynthDS(n=4, keys=("image", "mask"))
    tr = Trainer(ds, num_epochs=1, network="MultiOutputNestedUNet_3Levels",
                 n_filter=4, batch_size=2, output_heads=heads,
                 deep_supervision=True, val_split=0.0,
                 save_dir=str(tmp_path), tensorboard=False, log_images=False)
    assert tr.levels == 3
    loss = tr._iterate_train(0)
    assert np.isfinite(loss)


def test_scheduler_state_survives_resume(tmp_path):
    """A decayed LR must stay decayed across load_weights resume."""
    ds = _SynthDS(n=4)
    tr = Trainer(ds, num_epochs=1, network="Unet", n_filter=4, batch_size=2,
                 val_split=0.0, save_dir=str(tmp_path), lr=1e-3)
    # force a decay then checkpoint
    for loss in (1.0, 1.0, 1.0, 1.0, 1.0, 1.0):
        scale = tr.scheduler.step(loss)
    assert scale < 1.0
    tr._save(str(tmp_path / "model.ckpt"), epoch=5)

    tr2 = Trainer(ds, num_epochs=1, network="Unet", n_filter=4, batch_size=2,
                  val_split=0.0, save_dir=str(tmp_path), lr=1e-3,
                  load_weights=True)
    assert tr2.scheduler.scale == tr.scheduler.scale
    assert tr2.scheduler.best == tr.scheduler.best


def test_emergency_checkpoint_after_donated_steps(tmp_path, monkeypatch):
    """A crash AFTER train steps ran (donated buffers) must still write a
    loadable emergency checkpoint with the epoch actually reached."""
    ds = _SynthDS(n=6)
    tr = Trainer(ds, num_epochs=3, network="Unet", n_filter=4, batch_size=2,
                 val_split=0.0, save_dir=str(tmp_path))

    calls = {"n": 0}
    orig = tr._iterate_val

    def crash_on_second(epoch):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return orig(epoch)

    monkeypatch.setattr(tr, "_iterate_val", crash_on_second)
    with pytest.raises(RuntimeError, match="boom"):
        tr.start()
    emergency = str(tmp_path / "model_interrupted.ckpt")
    assert os.path.exists(emergency), "emergency checkpoint missing"
    state = checkpoint.load(emergency)
    assert state["epoch"] == 1  # one epoch completed before the crash
    # the params must be real fetchable buffers (not donation-invalidated)
    import jax

    leaves = jax.tree_util.tree_leaves(state["variables"]["params"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
