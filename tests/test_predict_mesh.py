"""Multi-chip predict: sharding patch batches over the mesh `data` axis must
reproduce the single-device result exactly (8-device virtual CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.models import Unet
from bio_image_unet_tpu.parallel import get_mesh
from bio_image_unet_tpu.predict import Predict


@pytest.fixture(scope="module")
def unet_ckpt(tmp_path_factory):
    model = Unet(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    path = str(tmp_path_factory.mktemp("ck") / "m.ckpt")
    checkpoint.save(path, variables, {"model_name": "Unet", "n_filter": 4,
                                      "in_channels": 1, "out_channels": 1})
    return path


def test_mesh_predict_matches_single_device(tmp_path, rng, unet_ckpt):
    movie = rng.integers(0, 255, (3, 96, 96), dtype=np.uint8)
    single = Predict(movie, None, unet_ckpt, resize_dim=(32, 32),
                     show_progress=False, batch_size=8)
    mesh = get_mesh()
    sharded = Predict(movie, None, unet_ckpt, resize_dim=(32, 32),
                      show_progress=False, batch_size=8, mesh=mesh)
    np.testing.assert_array_equal(sharded.result, single.result)


def test_mesh_batch_size_validation(unet_ckpt, rng):
    mesh = get_mesh()
    with pytest.raises(ValueError, match="divisible"):
        Predict(rng.integers(0, 255, (64, 64), dtype=np.uint8), None, unet_ckpt,
                resize_dim=(32, 32), show_progress=False, batch_size=3, mesh=mesh)
