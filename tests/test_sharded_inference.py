"""Whole-frame halo-sharded U-Net inference: a full U-Net forward over a
frame sharded across the mesh's spatial axis (halo exchange via ppermute)
matches the unsharded forward on the halo-padded frame — the framework's
"context parallelism" for frames too large for one chip's HBM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bio_image_unet_tpu.models import BabyUnet
from bio_image_unet_tpu.parallel import get_mesh, spatial_shard_apply


def test_unet_whole_frame_halo_sharded(rng):
    mesh = get_mesh(n_data=1, n_spatial=2)
    model = BabyUnet(n_filter=4)  # 3-level: receptive half-width < 48
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    frame = rng.random((1, 128, 64, 1)).astype(np.float32)
    halo = 48  # multiple of the total pooling stride (8) → grids stay aligned

    def fwd(x):
        return model.apply(variables, x)[0]  # sigmoid output

    got = np.asarray(spatial_shard_apply(fwd, jnp.asarray(frame), mesh, halo=halo))

    padded = jnp.pad(jnp.asarray(frame), ((0, 0), (halo, halo), (0, 0), (0, 0)))
    expected = np.asarray(fwd(padded))[:, halo:-halo]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    # interior rows (> halo from the global border) equal the plain forward
    plain = np.asarray(fwd(jnp.asarray(frame)))
    np.testing.assert_allclose(got[:, halo:-halo], plain[:, halo:-halo],
                               rtol=1e-4, atol=1e-5)


def test_preload(tmp_path, rng):
    import os

    from bio_image_unet_tpu.data import DataProcess2D, tiff

    for sub in ("image", "label"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(2):
        tiff.imwrite(str(tmp_path / "image" / f"i{i}.tif"),
                     rng.integers(0, 255, (32, 32), dtype=np.uint8))
        tiff.imwrite(str(tmp_path / "label" / f"i{i}.tif"),
                     (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255)
    data = DataProcess2D(
        (str(tmp_path / "image") + "/", str(tmp_path / "label") + "/"),
        dim_out=(32, 32), aug_factor=3, data_path=str(tmp_path / "data"), seed=0,
    )
    data.preload(n_threads=4)
    assert len(data._cache) == len(data) == 6
    item = data[3]
    assert item["image"].shape == (32, 32, 1)


def test_public_sharded_predict_api(tmp_path, rng):
    """predict_frames_spatial_sharded: full U-Net, checkpoint in, uint8 masks
    out, interior identical to the single-device tiled forward."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import Unet
    from bio_image_unet_tpu.predict import predict_frames_spatial_sharded

    model = Unet(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    ckpt = str(tmp_path / "m.ckpt")
    checkpoint.save(ckpt, variables, {"model_name": "Unet", "n_filter": 4,
                                      "in_channels": 1, "out_channels": 1})

    mesh = get_mesh(n_data=1, n_spatial=2)
    frames = rng.integers(0, 255, (2, 256, 64), dtype=np.uint8)
    sharded = predict_frames_spatial_sharded(frames, ckpt, mesh, halo=128)
    assert sharded.shape == (2, 256, 64) and sharded.dtype == np.uint8

    # single-device whole-frame forward for comparison (same normalization)
    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    norm = _normalize_stack(frames.astype(np.float32), "single", (0.0, 99.8))
    x = jnp.asarray(norm.astype(np.uint8)[..., None].astype(np.float32) / 255)
    plain = (np.asarray(model.apply(variables, x)[0]) * 255).astype(np.uint8)[..., 0]
    # interior rows (>halo from border) bit-identical
    np.testing.assert_array_equal(sharded[:, 128:-128], plain[:, 128:-128])

    with np.testing.assert_raises(Exception):
        predict_frames_spatial_sharded(
            rng.integers(0, 255, (1, 100, 64), dtype=np.uint8), ckpt, mesh)


def test_public_sharded_predict_3d_api(tmp_path, rng):
    """predict_volume_spatial_sharded: whole-volume halo-sharded UNet3D
    forward, interior identical to the single-device forward."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import UNet3D
    from bio_image_unet_tpu.predict import predict_volume_spatial_sharded

    model = UNet3D(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 1)))
    ckpt = str(tmp_path / "m3.ckpt")
    checkpoint.save(ckpt, variables,
                    {"model_name": "UNet3D", "n_filter": 4,
                     "use_interpolation": False})

    mesh = get_mesh(n_data=1, n_spatial=2)
    vol = rng.integers(0, 255, (8, 128, 32), dtype=np.uint8)
    sharded = predict_volume_spatial_sharded(vol, ckpt, mesh, halo=48)
    assert sharded.shape == (8, 128, 32) and sharded.dtype == np.uint8

    from bio_image_unet_tpu.predict.predictor import _normalize_stack

    norm = _normalize_stack(vol[None], "all", (0.0, 99.8))[0].astype(np.uint8)
    x = jnp.asarray(norm[None, ..., None].astype(np.float32) / 255)
    plain = (np.asarray(model.apply(variables, x, train=False)[0])
             * 255).astype(np.uint8)[0, ..., 0]
    np.testing.assert_array_equal(sharded[:, 48:-48], plain[:, 48:-48])

    with pytest.raises(ValueError):
        predict_volume_spatial_sharded(
            rng.integers(0, 255, (8, 100, 32), dtype=np.uint8), ckpt, mesh)
