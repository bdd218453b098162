"""Multi-chip predict: sharding patch batches over the mesh `data` axis must
reproduce the single-device result (8-device virtual CPU mesh).

Float compute compiled as a shard_map program and as a plain jit program may
differ by 1 ULP (different batch shapes pick different conv schedules, so
FMA ordering differs); at the final uint8 quantization a half-level boundary
pixel can then round differently. The canonical contract lives in
`bio_image_unet_tpu.testing.assert_mesh_parity` (shared with
`__graft_entry__.dryrun_multichip`): at most ONE output level on <=0.1% of
pixels for the float paths. int8 mesh parity stays bitwise-exact (integer
math) — see tests/test_quant*.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.models import Unet
from bio_image_unet_tpu.parallel import get_mesh
from bio_image_unet_tpu.predict import Predict
from bio_image_unet_tpu.testing import assert_mesh_parity


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
    assert_mesh_parity(sharded.result, single.result)


def test_mesh_batch_size_validation(unet_ckpt, rng):
    mesh = get_mesh()
    with pytest.raises(ValueError, match="divisible"):
        Predict(rng.integers(0, 255, (64, 64), dtype=np.uint8), None, unet_ckpt,
                resize_dim=(32, 32), show_progress=False, batch_size=3, mesh=mesh)


@pytest.mark.parametrize("dtype,mode", [(np.uint16, "single"),
                                        (np.uint8, "all")])
def test_mesh_fused_predict_dtype_mode_matrix(rng, unet_ckpt, dtype, mode):
    """The shard_map fused program must honor the same dtype x mode matrix
    as single-chip: uint16 (bit-search bounds) and 'all' (fixed traced
    bounds, the 3-arg shard_map spec) both reproduce the single-chip fused
    result to within assert_mesh_parity's one-quantization-level bound."""
    hi = 255 if dtype == np.uint8 else 50000
    movie = rng.integers(0, hi, (5, 96, 96), dtype=dtype)
    kwargs = dict(resize_dim=(32, 32), normalization_mode=mode,
                  show_progress=False, batch_size=8, device_pipeline=True)
    single = Predict(movie, None, unet_ckpt, **kwargs)
    sharded = Predict(movie, None, unet_ckpt, mesh=get_mesh(), **kwargs)
    assert_mesh_parity(sharded.result, single.result)


def test_mesh_fused_3d_and_multioutput_match_single_device(rng, tmp_path):
    """Siam-excepted families whose fused programs shard the lax.map batch
    axis over `data` (forward partitions across chips, XLA all-gathers the
    tile probabilities before the replicated stitch) must reproduce the
    single-chip fused result."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import MultiOutputUnet, UNet3D
    from bio_image_unet_tpu.predict import Predict3D, PredictMultiOutput

    m3 = UNet3D(n_filter=4)
    v3 = m3.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    ck3 = str(tmp_path / "u3d.ckpt")
    checkpoint.save(ck3, v3, {"model_name": "UNet3D", "n_filter": 4})
    vol = rng.integers(0, 255, (16, 32, 32), dtype=np.uint8)
    kw = dict(resize_dim=(8, 16, 16), show_progress=False, batch_size=8,
              device_pipeline=True)
    single = Predict3D(vol, None, ck3, **kw)
    sharded = Predict3D(vol, None, ck3, mesh=get_mesh(), **kw)
    assert_mesh_parity(sharded.result, single.result)

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    mm = MultiOutputUnet(n_filter=4, output_heads=heads)
    vm = mm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckm = str(tmp_path / "mo.ckpt")
    checkpoint.save(ckm, vm, {"model_name": "MultiOutputUnet", "n_filter": 4,
                              "in_channels": 1, "output_heads": heads})
    imgs = rng.integers(0, 255, (2, 48, 48), dtype=np.uint8)
    kw = dict(max_patch_size=(32, 32), show_progress=False, batch_size=8,
              safe_margin=4, device_pipeline=True)
    s1 = PredictMultiOutput(imgs, ckm, **kw)
    s8 = PredictMultiOutput(imgs, ckm, mesh=get_mesh(), **kw)
    assert_mesh_parity(s8.result["mask"], s1.result["mask"])


def test_mesh_fused_siam_matches_single_device(rng, tmp_path):
    import importlib.util

    import torch

    from bio_image_unet_tpu.data import tiff
    from bio_image_unet_tpu.predict import PredictSiam

    torch.manual_seed(0)
    spec = importlib.util.spec_from_file_location(
        "ref_siam", "/root/reference/bio_image_unet/siam_unet/siam_unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.Siam_UNet(n_filter=4, mode="max").eval()
    ck = str(tmp_path / "siam.pt")
    torch.save({"state_dict": net.state_dict(), "model_name": "Siam_UNet",
                "n_filter": 4, "mode": "max"}, ck)
    movie_path = str(tmp_path / "m.tif")
    tiff.imwrite(movie_path, rng.integers(0, 255, (5, 48, 48), dtype=np.uint8))
    kw = dict(resize_dim=(32, 32), show_progress=False, batch_size=8,
              frames_per_chunk=3, device_pipeline=True)
    o1, o8 = str(tmp_path / "o1.tif"), str(tmp_path / "o8.tif")
    PredictSiam(movie_path, o1, ck, **kw)
    PredictSiam(movie_path, o8, ck, mesh=get_mesh(), **kw)
    assert_mesh_parity(tiff.imread(o8), tiff.imread(o1))


def test_mesh_cache_key_distinguishes_axis_topology():
    """Two meshes over the SAME devices but different axis topology (8x1
    'data' vs 4x2 'data'x'spatial') must not share a cache key — compiled
    programs bake their mesh's sharding layout."""
    from bio_image_unet_tpu.predict.predictor import _mesh_key

    k_data = _mesh_key(get_mesh(n_data=8))
    k_combo = _mesh_key(get_mesh(n_data=4, n_spatial=2))
    assert k_data != k_combo
    assert k_data == _mesh_key(get_mesh(n_data=8))


def test_mesh_fused_heads_3d_fixed_bounds_match_single_device(rng, tmp_path):
    """The stack-global ('first'/'all') 3D heads program threads its fixed
    bounds as traced scalars — under a mesh it must reproduce the
    single-chip fused result (round-4 review fix: these modes were
    silently per-volume before)."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import MultiOutputUnet3D
    from bio_image_unet_tpu.predict import PredictMultiOutput3D

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    m = MultiOutputUnet3D(n_filter=4, output_heads=heads)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    ck = str(tmp_path / "mo3d.ckpt")
    checkpoint.save(ck, v, {"model_name": "MultiOutputUnet3D", "n_filter": 4,
                            "output_heads": heads})
    stack = np.stack([
        rng.integers(5, 90, (8, 32, 32), dtype=np.uint8),
        rng.integers(40, 250, (8, 32, 32), dtype=np.uint8),
    ])
    kw = dict(max_patch_size=(8, 16, 16), overlap_factor=0.25,
              show_progress=False, batch_size=8, blend_margin=4,
              normalization_mode="all", device_pipeline=True)
    single = PredictMultiOutput3D(stack, ck, **kw)
    sharded = PredictMultiOutput3D(stack, ck, mesh=get_mesh(), **kw)
    assert_mesh_parity(sharded.result["mask"], single.result["mask"])
