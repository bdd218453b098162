"""Deeper multi-output coverage: orientation (vector-field) heads through
training, and UNet++ checkpoints through prediction — the reference's
myofibril-analysis configuration (multi_output_unet/*)."""

import os

import numpy as np

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.data import DataProcessMultiOutput, tiff
from bio_image_unet_tpu.predict import PredictMultiOutput
from bio_image_unet_tpu.train import Trainer


def test_orientation_head_training(tmp_path, rng):
    """mask (BCEDice) + orientation (WeightedVectorFieldLoss on cos/sin
    2-vectors) heads train to a finite loss."""
    img_dir = str(tmp_path / "image")
    m_dir = str(tmp_path / "mask")
    o_dir = str(tmp_path / "orientation")
    os.makedirs(img_dir), os.makedirs(m_dir), os.makedirs(o_dir)
    for i in range(2):
        name = f"s{i}.tif"
        tiff.imwrite(os.path.join(img_dir, name),
                     rng.integers(0, 255, (64, 64), dtype=np.uint8))
        tiff.imwrite(os.path.join(m_dir, name),
                     (rng.random((64, 64)) > 0.5).astype(np.float32))
        ori = rng.uniform(0, 2 * np.pi, (64, 64)).astype(np.float32)
        ori[:8] = np.nan
        tiff.imwrite(os.path.join(o_dir, name), ori)

    data = DataProcessMultiOutput(
        img_dir, [m_dir, o_dir], {"mask": "mask", "orientation": "mask"},
        data_dir=str(tmp_path / "data"), dim_out=(32, 32), aug_factor=8,
        nan_to_val=0.0, seed=0,
    )
    heads = {
        "mask": {"channels": 1, "activation": "sigmoid",
                 "loss": "BCEDiceLoss", "weight": 1.0},
        "orientation": {"channels": 2, "activation": None,
                        "loss": "WeightedVectorFieldLoss", "weight": 0.5},
    }
    trainer = Trainer(data, num_epochs=1, network="MultiOutputUnet",
                      batch_size=4, n_filter=4, output_heads=heads,
                      grad_clip=1.0, save_dir=str(tmp_path / "out"), seed=0)
    best = trainer.start()
    assert np.isfinite(best)
    hp = checkpoint.peek(str(tmp_path / "out" / "model.ckpt"))["hyperparams"]
    assert hp["output_heads"]["orientation"]["loss"] == "WeightedVectorFieldLoss"


def test_nested_unet_checkpoint_predict(tmp_path, rng):
    """A deep-supervision UNet++ checkpoint predicts in eval mode (only the
    final per-head outputs, reference multi_output_nested_unet.py:136-154)."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.models import MultiOutputNestedUNet_3Levels

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    model = MultiOutputNestedUNet_3Levels(n_filter=4, output_heads=heads,
                                          deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = str(tmp_path / "npp.ckpt")
    checkpoint.save(ckpt, variables,
                    {"model_name": "MultiOutputNestedUNet_3Levels",
                     "n_filter": 4, "in_channels": 1, "output_heads": heads,
                     "deep_supervision": True})

    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    pred = PredictMultiOutput(imgs, ckpt, result_path=None,
                              max_patch_size=(32, 32), show_progress=False,
                              batch_size=4, safe_margin=4)
    assert set(pred.result) == {"mask"}
    assert pred.result["mask"].shape == (2, 48, 48)
    assert np.isfinite(pred.result["mask"]).all()
