"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest.py).

Verifies the new parallel runtime (SURVEY.md §2.8: no reference counterpart —
the reference is single-device):
- halo-sharded conv stacks match the unsharded result exactly,
- a data-parallel jitted loss/grad over the mesh matches single-device values,
- shard_batch padding round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_image_unet_tpu.parallel import (
    data_sharding,
    get_mesh,
    halo_exchange,  # noqa: F401  (exercised via spatial_shard_apply)
    get_mesh as _gm,
    pad_to_multiple,
    replicated,
    shard_batch,
    spatial_shard_apply,
)


def test_get_mesh_shapes():
    mesh = get_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh2 = get_mesh(n_data=4, n_spatial=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["spatial"] == 2
    with pytest.raises(ValueError):
        get_mesh(n_data=16, n_spatial=2)


def test_pad_to_multiple():
    assert pad_to_multiple(0, 8) == 8
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_shard_batch_roundtrip(rng):
    mesh = get_mesh()
    x = rng.standard_normal((13, 4, 4, 1)).astype(np.float32)
    arr, n = shard_batch(x, mesh)
    assert n == 13 and arr.shape[0] == 16
    np.testing.assert_array_equal(np.asarray(arr)[:13], x)
    # padding repeats the final sample
    np.testing.assert_array_equal(np.asarray(arr)[13:], np.broadcast_to(x[-1:], (3, 4, 4, 1)))


def _conv_stack(x, kernels):
    """Three SAME-padded 3x3 convs + leaky relu — half receptive field = 3."""
    for k in kernels:
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        x = jax.nn.leaky_relu(x, 0.1)
    return x


def test_spatial_shard_apply_matches_unsharded(rng):
    mesh = get_mesh(n_data=1, n_spatial=8)
    x = rng.standard_normal((2, 64, 32, 4)).astype(np.float32)
    kernels = [rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1 for _ in range(3)]

    fn = lambda t: _conv_stack(t, kernels)  # noqa: E731
    # contract: equals fn on the halo-zero-padded image, cropped back
    halo = 3
    padded = jnp.pad(jnp.asarray(x), ((0, 0), (halo, halo), (0, 0), (0, 0)))
    expected = np.asarray(fn(padded))[:, halo:-halo]
    got = np.asarray(spatial_shard_apply(fn, jnp.asarray(x), mesh, halo=halo))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
    # and the interior (> halo from the global border) matches plain fn(x)
    plain = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(got[:, 3:-3], plain[:, 3:-3], rtol=1e-5, atol=1e-5)


def test_spatial_shard_requires_divisible(rng):
    mesh = get_mesh(n_data=1, n_spatial=8)
    x = jnp.zeros((1, 60, 32, 1))
    with pytest.raises(ValueError):
        spatial_shard_apply(lambda t: t, x, mesh, halo=1)


def test_data_parallel_grad_matches_single_device(rng):
    """jit with NamedSharding annotations: per-batch loss/grad equals the
    single-device computation — XLA's inserted collectives are correct."""
    mesh = get_mesh()
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 1)).astype(np.float32) * 0.1)
    x = rng.standard_normal((16, 8, 8, 1)).astype(np.float32)
    y = (rng.random((16, 8, 8, 1)) > 0.5).astype(np.float32)

    def loss_fn(w, x, y):
        p = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.mean((p - y) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss_fn)(w, jnp.asarray(x), jnp.asarray(y))

    xs = jax.device_put(x, data_sharding(mesh, 4))
    ys = jax.device_put(y, data_sharding(mesh, 4))
    ws = jax.device_put(w, replicated(mesh))
    sharded = jax.jit(jax.value_and_grad(loss_fn))
    got_l, got_g = sharded(ws, xs, ys)

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), rtol=1e-5, atol=1e-6)


def test_initialize_distributed_plumbs_kwargs(monkeypatch):
    """Multi-host entry point: kwargs must pass through verbatim to
    jax.distributed.initialize (we cannot run a real multi-host ring here)."""
    import jax

    from bio_image_unet_tpu.parallel import initialize_distributed

    captured = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: captured.update(kw))
    initialize_distributed(coordinator_address="10.0.0.1:1234",
                           num_processes=4, process_id=2)
    assert captured == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 2}


def test_get_mesh_empty_raises():
    """n_spatial beyond the device count must raise, not build a 0-row mesh."""
    with pytest.raises(ValueError, match="empty|exceeds"):
        get_mesh(n_spatial=16)


def test_spatial_shard_2d_mesh_batch_sharded(rng):
    """On a (data × spatial) mesh the batch axis shards over `data` while H
    shards over `spatial` — combined DP + context parallelism, same result."""
    mesh = get_mesh(n_data=2, n_spatial=4)
    x = rng.standard_normal((4, 32, 16, 4)).astype(np.float32)
    kernels = [rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.1
               for _ in range(2)]
    fn = lambda t: _conv_stack(t, kernels)  # noqa: E731
    halo = 2
    padded = jnp.pad(jnp.asarray(x), ((0, 0), (halo, halo), (0, 0), (0, 0)))
    expected = np.asarray(fn(padded))[:, halo:-halo]
    got = np.asarray(spatial_shard_apply(fn, jnp.asarray(x), mesh, halo=halo))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
    # odd batch (not divisible by data axis) still works, replicated
    got3 = np.asarray(spatial_shard_apply(fn, jnp.asarray(x[:3]), mesh, halo=halo))
    np.testing.assert_allclose(got3, expected[:3], rtol=1e-5, atol=1e-5)
