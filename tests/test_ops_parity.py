"""Golden tests: ops primitives vs their torch counterparts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bio_image_unet_tpu.ops import functional as ops
from bio_image_unet_tpu.ops.blocks import ConvBlock, ConvTranspose, TorchBatchNorm


def nchw(x):  # NHWC → NCHW torch tensor
    return torch.tensor(np.moveaxis(np.asarray(x), -1, 1))


def nhwc(t):  # torch NCHW → NHWC numpy
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_max_pool_2d_odd(rng):
    x = rng.standard_normal((2, 17, 19, 5)).astype(np.float32)
    ours = ops.max_pool(jnp.asarray(x))
    ref = nhwc(F.max_pool2d(nchw(x), 2, 2))
    np.testing.assert_allclose(np.asarray(ours), ref)


def test_max_pool_3d(rng):
    x = rng.standard_normal((1, 8, 10, 12, 3)).astype(np.float32)
    ours = ops.max_pool(jnp.asarray(x))
    ref = np.moveaxis(F.max_pool3d(torch.tensor(np.moveaxis(x, -1, 1)), 2, 2).numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(ours), ref)


def test_upsample_nearest(rng):
    x = rng.standard_normal((1, 4, 6, 8, 3)).astype(np.float32)
    ours = ops.upsample_nearest(jnp.asarray(x))
    ref = np.moveaxis(
        F.interpolate(torch.tensor(np.moveaxis(x, -1, 1)), scale_factor=2, mode="nearest").numpy(),
        1, -1,
    )
    np.testing.assert_allclose(np.asarray(ours), ref)


def test_downsample_nearest(rng):
    x = rng.standard_normal((1, 4, 6, 8, 3)).astype(np.float32)
    ours = ops.downsample_nearest(jnp.asarray(x))
    ref = np.moveaxis(
        F.interpolate(torch.tensor(np.moveaxis(x, -1, 1)), scale_factor=0.5, mode="nearest").numpy(),
        1, -1,
    )
    np.testing.assert_allclose(np.asarray(ours), ref)


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear(rng, align_corners):
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    ours = ops.resize_linear(jnp.asarray(x), (18, 22), align_corners=align_corners)
    ref = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=align_corners))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)


def test_resize_trilinear(rng):
    x = rng.standard_normal((1, 4, 6, 8, 2)).astype(np.float32)
    ours = ops.resize_linear(jnp.asarray(x), (8, 12, 16), align_corners=False)
    ref = np.moveaxis(
        F.interpolate(
            torch.tensor(np.moveaxis(x, -1, 1)), scale_factor=2, mode="trilinear",
            align_corners=False,
        ).numpy(),
        1, -1,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-6)


def test_depthwise_xcorr(rng):
    """vs the reference's grouped-conv formulation (siam_unet/siam_unet.py:75-83)."""
    b, c, h, w = 2, 3, 12, 14
    cur = rng.standard_normal((b, c, h, w)).astype(np.float32)
    prev = rng.standard_normal((b, c, h, w)).astype(np.float32)
    ref = (
        F.conv2d(
            torch.tensor(cur.reshape(1, b * c, h, w)),
            torch.tensor(prev.reshape(b * c, 1, h, w)),
            groups=b * c,
            padding="same",
        )
        .numpy()
        .reshape(b, c, h, w)
    )
    ours = ops.depthwise_xcorr(
        jnp.asarray(np.moveaxis(cur, 1, -1)), jnp.asarray(np.moveaxis(prev, 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref, rtol=2e-5, atol=2e-4)


def test_conv_transpose_2d_parity(rng):
    x = rng.standard_normal((2, 9, 11, 5)).astype(np.float32)
    wt = rng.standard_normal((5, 7, 2, 2)).astype(np.float32)  # torch (in,out,kh,kw)
    bt = rng.standard_normal((7,)).astype(np.float32)
    ref = nhwc(F.conv_transpose2d(nchw(x), torch.tensor(wt), torch.tensor(bt), stride=2))

    module = ConvTranspose(features=7)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {"params": {"kernel": jnp.asarray(wt.transpose(2, 3, 1, 0)), "bias": jnp.asarray(bt)}}
    ours = module.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_conv_transpose_3d_parity(rng):
    x = rng.standard_normal((1, 4, 5, 6, 3)).astype(np.float32)
    wt = rng.standard_normal((3, 4, 2, 2, 2)).astype(np.float32)
    ref = np.moveaxis(
        F.conv_transpose3d(torch.tensor(np.moveaxis(x, -1, 1)), torch.tensor(wt), stride=2).numpy(),
        1, -1,
    )
    module = ConvTranspose(features=4)
    variables = {
        "params": {
            "kernel": jnp.asarray(wt.transpose(2, 3, 4, 1, 0)),
            "bias": jnp.zeros((4,), jnp.float32),
        }
    }
    ours = module.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_batchnorm_torch_semantics(rng):
    """Training normalization, unbiased running-var update, eval stats use."""
    x1 = rng.standard_normal((4, 6, 6, 5)).astype(np.float32)
    x2 = rng.standard_normal((4, 6, 6, 5)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(5)
    tbn.train()
    ref1 = nhwc(tbn(nchw(x1)))
    ref2 = nhwc(tbn(nchw(x2)))
    tbn.eval()
    ref_eval = nhwc(tbn(nchw(x1)))

    module = TorchBatchNorm()
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x1), use_running_average=False)
    out1, mut = module.apply(
        variables, jnp.asarray(x1), use_running_average=False, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], **mut}
    out2, mut = module.apply(
        variables, jnp.asarray(x2), use_running_average=False, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], **mut}
    out_eval = module.apply(variables, jnp.asarray(x1), use_running_average=True)

    np.testing.assert_allclose(np.asarray(out1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, rtol=1e-4, atol=1e-5)


def test_batchnorm_single_value_per_channel_raises(rng):
    """torch raises 'Expected more than 1 value per channel when training';
    the unbiased n/(n-1) update would otherwise write inf into the running
    var silently (regression)."""
    module = TorchBatchNorm()
    x = jnp.asarray(rng.standard_normal((1, 1, 1, 5)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x, use_running_average=False)
    with pytest.raises(ValueError, match="more than 1 value per channel"):
        module.apply(variables, x, use_running_average=False,
                     mutable=["batch_stats"])


def test_torch_default_bias_init_on_gates_and_heads():
    """The reference's init_weights re-inits conv *weights* only
    (utils/utils.py:76-78), so torch's default U(±1/√fan_in) biases survive —
    attention-gate 1×1 convs and the final/head 1×1 convs must not start at
    flax's zero default (regression: fresh-training init parity)."""
    from bio_image_unet_tpu.models import AttentionUnet, MultiOutputUnet3D
    from bio_image_unet_tpu.ops.blocks import AttentionBlock

    blk = AttentionBlock(n_coefficients=8)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)),
                 jnp.zeros((1, 8, 8, 16)))
    for name, fan_in in [("W_gate_conv", 16), ("W_x_conv", 16), ("psi_conv", 8)]:
        b = np.asarray(v["params"][name]["bias"])
        bound = 1.0 / np.sqrt(fan_in)
        assert np.any(b != 0.0), f"{name} bias is zero-initialized"
        assert np.all(np.abs(b) <= bound + 1e-7), name

    m = AttentionUnet(n_filter=8)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    b = np.asarray(v["params"]["final"]["bias"])
    assert np.any(b != 0.0) and np.all(np.abs(b) <= 1.0 / np.sqrt(8) + 1e-7)

    heads = {"seg": {"channels": 1, "activation": "sigmoid"}}
    m3 = MultiOutputUnet3D(n_filter=8, output_heads=heads)
    v3 = m3.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 16, 16, 1)))
    b3 = np.asarray(v3["params"]["output_layers_seg"]["bias"])
    assert np.any(b3 != 0.0) and np.all(np.abs(b3) <= 1.0 / np.sqrt(4) + 1e-7)


def test_conv_block_vs_torch_sequential(rng):
    """Full block: Conv(k3,pad=dil,dil) + BN + LeakyReLU(0.1), eval mode."""
    for dilation in (1, 2):
        x = rng.standard_normal((2, 12, 14, 3)).astype(np.float32)
        tblock = torch.nn.Sequential(
            torch.nn.Conv2d(3, 6, 3, padding=dilation, dilation=dilation),
            torch.nn.BatchNorm2d(6),
            torch.nn.LeakyReLU(0.1),
            torch.nn.Dropout2d(0.0),
        )
        tblock.eval()
        ref = nhwc(tblock(nchw(x)))

        module = ConvBlock(features=6, dilation=dilation)
        w = tblock[0].weight.detach().numpy()
        variables = {
            "params": {
                "conv": {
                    "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(tblock[0].bias.detach().numpy()),
                },
                "bn": {
                    "scale": jnp.asarray(tblock[1].weight.detach().numpy()),
                    "bias": jnp.asarray(tblock[1].bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": jnp.asarray(tblock[1].running_mean.numpy()),
                    "var": jnp.asarray(tblock[1].running_var.numpy()),
                }
            },
        }
        ours = module.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_conv_block_kernel5_shape_preserving():
    """Padding generalizes to any odd kernel: dilation·(k−1)/2."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu.ops.blocks import ConvBlock

    for k, d in ((5, 1), (3, 2), (7, 1)):
        block = ConvBlock(features=4, kernel_size=k, dilation=d)
        x = jnp.zeros((1, 16, 16, 2))
        variables = block.init(jax.random.PRNGKey(0), x)
        y = block.apply(variables, x, train=False)
        assert y.shape == (1, 16, 16, 4), (k, d, y.shape)
