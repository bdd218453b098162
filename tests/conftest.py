"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: this host's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU plugin, so plain env vars are too late — we must go through jax.config.
XLA_FLAGS is still read lazily at first backend initialization, so setting it
here (before any jax computation) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float32 PyTorch; keep MXU-style bf16 out of tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8, f"expected 8 virtual devices, got {jax.device_count()}"


# `pytest -m quick`: a <2-minute smoke subset touching every subsystem once
# (losses, tiff codec, morphology/progress, tools, checkpoint, augmentation,
# mesh/collectives, pipelines, predict/stitch, model parity, .pt interop,
# halo sharding).  Selected centrally so the slow e2e files stay unmarked.
_QUICK = (
    "test_losses.py",
    "test_tiff.py",
    "test_morphology_progress.py",
    "test_tools.py",
    "test_checkpoint.py::test_roundtrip",
    "test_checkpoint.py::test_bad_magic",
    "test_augment.py::test_rotate_array_nan_preserved",
    "test_augment.py::test_device_rot90_flip_shared",
    "test_parallel.py::test_get_mesh_shapes",
    "test_parallel.py::test_data_parallel_grad_matches_single_device",
    "test_data_pipelines.py::test_tile_starts_matches_reference_rule",
    "test_data_pipelines.py::test_dataprocess2d_end_to_end",
    "test_predict.py::test_grid_starts_matches_reference",
    "test_predict.py::test_stitch_mean_equals_nanmean",
    "test_histogram.py::test_float_clip_bounds_matches_numpy",
    "test_model_parity.py::test_unet_parity",
    "test_pt_reader.py::test_read_pt_matches_torch_load",
    "test_sharded_inference.py::test_unet_whole_frame_halo_sharded",
    "test_quant_families.py::test_ratio_registry_matches_artifacts",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("tests/")[-1]
        if any(name == q or (q.endswith(".py") and name.startswith(q + "::"))
               for q in _QUICK):
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
