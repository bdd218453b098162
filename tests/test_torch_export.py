"""Round-trip export: our variables → torch .pt → loaded by the actual
reference torch model → same outputs as our forward."""

import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bio_image_unet_tpu.interop.torch_export import (
    export_torch_checkpoint,
    variables_to_torch_state_dict,
)
from bio_image_unet_tpu.models import AttentionUnet, Unet


def _ref(rel, name):
    spec = importlib.util.spec_from_file_location(name, f"/root/reference/bio_image_unet/{rel}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("cls,ref_rel,ref_name,kwargs", [
    (Unet, "unet/unet.py", "Unet", dict(n_filter=4)),
    (AttentionUnet, "unet/attention_unet.py", "AttentionUnet", dict(n_filter=4)),
])
def test_export_roundtrip(tmp_path, rng, cls, ref_rel, ref_name, kwargs):
    import torch

    model = cls(**kwargs)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    sd = variables_to_torch_state_dict(variables)

    mod = _ref(ref_rel, ref_name)
    net = getattr(mod, ref_name)(in_channels=1, out_channels=1, **kwargs)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    net.eval()

    x = rng.random((2, 32, 32, 1)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))[0])
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)))[0].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1), atol=2e-5)


def test_export_file(tmp_path, rng):
    import torch

    model = Unet(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    p = str(tmp_path / "export.pt")
    export_torch_checkpoint(p, variables, {"n_filter": 4, "in_channels": 1,
                                           "out_channels": 1}, epoch=3, best_loss=0.2)
    ckpt = torch.load(p, weights_only=False)
    assert ckpt["epoch"] == 3 and ckpt["n_filter"] == 4
    assert "encode1.0.weight" in ckpt["state_dict"]


def test_export_unet3d_roundtrip(tmp_path, rng):
    """UNet3D export: its reference ``final`` is a bare Conv3d (not a
    Sequential) — final_sequential=False."""
    import torch

    from bio_image_unet_tpu.models import UNet3D

    model = UNet3D(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    sd = variables_to_torch_state_dict(variables, final_sequential=False)

    mod = _ref("unet3d/unet3d.py", "UNet3D")
    net = mod.UNet3D(in_channels=1, out_channels=1, n_filter=4)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    net.eval()
    x = rng.random((1, 8, 16, 16, 1)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))[0])
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)))[0].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1), atol=2e-5)


def test_export_multi_output_unet3d_interpolation_roundtrip(tmp_path, rng):
    """The interpolation variant's ``up{1,2,3}_conv`` are conv+BN Sequentials
    (reference multi_output_unet3d.py:68-70), NOT bare ConvTransposes — the
    exporter must emit ``up1_conv.0.*``/``up1_conv.1.*`` keys (regression:
    the bare-ConvTranspose branch used to catch them, emitting
    ``up1_conv.weight`` with the BN beta clobbering the conv bias)."""
    import torch

    from bio_image_unet_tpu.models import MultiOutputUnet3D

    heads = {
        "mask": {"channels": 1, "activation": "sigmoid"},
        "flow": {"channels": 2, "activation": None},
    }
    model = MultiOutputUnet3D(n_filter=4, output_heads=heads,
                              use_interpolation=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    sd = variables_to_torch_state_dict(variables)
    assert "up1_conv.0.weight" in sd and "up1_conv.1.weight" in sd
    assert "up1_conv.weight" not in sd

    mod = _ref("multi_output_unet3d/multi_output_unet3d.py", "MultiOutputUnet3D")
    net = mod.MultiOutputUnet3D(in_channels=1, output_heads=heads, n_filter=4,
                                use_interpolation=True)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    net.eval()
    x = rng.random((1, 8, 16, 16, 1)).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)))
    for name in heads:
        np.testing.assert_allclose(
            np.asarray(ours[name]),
            np.moveaxis(theirs[name].numpy(), 1, -1),
            atol=2e-5,
        )


def test_export_siam_roundtrip(tmp_path, rng):
    import torch

    from bio_image_unet_tpu.models import Siam_UNet

    model = Siam_UNet(n_filter=4, mode="concat")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                           jnp.zeros((1, 32, 32, 1)))
    sd = variables_to_torch_state_dict(variables)

    mod = _ref("siam_unet/siam_unet.py", "Siam_UNet")
    net = mod.Siam_UNet(n_filter=4, mode="concat")
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    net.eval()
    x = rng.random((1, 32, 32, 1)).astype(np.float32)
    p = rng.random((1, 32, 32, 1)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(p))[0])
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)),
                     torch.from_numpy(np.moveaxis(p, -1, 1)))[0].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1), atol=2e-5)


def test_export_unet_v0_roundtrip(tmp_path, rng):
    """decode9 is a conv+BN block (reference unet_v0.py:50-63), NOT a plain
    final conv — the exporter must emit decode9.0.*/decode9.1.* keys."""
    import torch

    from bio_image_unet_tpu.models import Unet_v0

    model = Unet_v0(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    sd = variables_to_torch_state_dict(variables)
    assert "decode9.0.weight" in sd and "decode9.1.weight" in sd

    mod = _ref("unet/unet_v0.py", "Unet_v0")
    net = mod.Unet_v0(n_filter=4)
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # only torch bookkeeping keys may be missing
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    net.eval()

    x = rng.random((2, 32, 32, 1)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False)[0])
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.moveaxis(x, -1, 1)))[0].numpy()
    np.testing.assert_allclose(ours, np.moveaxis(theirs, 1, -1), atol=2e-5)
