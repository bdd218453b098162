"""BN-folded fast forward (predict/fastpath.py) must reproduce model.apply
eval-mode outputs across every 2D variant it claims to cover."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_image_unet_tpu.models import (
    AttentionUnet,
    MultiOutputUnet,
    Siam_UNet,
    Unet,
)
from bio_image_unet_tpu.predict.fastpath import build_fast_apply


def _warm_bn(model, variables, *shapes, steps=3):
    """Run a few train-mode steps so running stats differ from init
    (otherwise folding trivially passes with mean 0 / var 1)."""
    rng = jax.random.PRNGKey(7)
    for i in range(steps):
        args = [jax.random.uniform(jax.random.fold_in(rng, 10 * i + j), s)
                for j, s in enumerate(shapes)]
        _, mutated = model.apply(variables, *args, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.fold_in(rng, i)})
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
    return variables


def _check(model, *shapes, atol=2e-5):
    variables = model.init(jax.random.PRNGKey(0), *(jnp.zeros(s) for s in shapes))
    variables = _warm_bn(model, variables, *shapes)
    fast = build_fast_apply(model, variables, dtype=None)
    assert fast is not None
    apply_fn, folded = fast
    args = [jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(1), j), s)
            for j, s in enumerate(shapes)]
    ref = model.apply(variables, *args, train=False)
    out = apply_fn(folded, *args)
    if isinstance(ref, dict):
        assert set(ref) == set(out)
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       atol=atol, err_msg=k)
    else:
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=atol)


@pytest.mark.quick
def test_fast_unet():
    _check(Unet(n_filter=4), (2, 32, 32, 1))


def test_fast_unet_dilation():
    _check(Unet(n_filter=4, dilation=2), (2, 32, 32, 1))


def test_fast_attention_unet():
    _check(AttentionUnet(n_filter=4), (2, 32, 32, 1))


@pytest.mark.parametrize("mode", ["concat", "corr", "max", "control"])
def test_fast_siam(mode):
    _check(Siam_UNet(n_filter=4, mode=mode), (2, 32, 32, 1), (2, 32, 32, 1))


def test_fast_multi_output():
    heads = {"mask": {"channels": 1, "activation": "sigmoid"},
             "orientation": {"channels": 2, "activation": None}}
    _check(MultiOutputUnet(n_filter=4, output_heads=heads), (2, 32, 32, 1))


def test_fast_requires_batch_stats():
    """Variable trees without batch_stats (nothing to fold) fall back to the
    flax path."""
    m = Unet(n_filter=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    assert build_fast_apply(m, {"params": v["params"]}, None) is None


@pytest.mark.parametrize("use_interpolation", [False, True])
def test_fast_unet3d(use_interpolation):
    from bio_image_unet_tpu.models import UNet3D

    _check(UNet3D(n_filter=4, use_interpolation=use_interpolation),
           (2, 8, 16, 16, 1))


@pytest.mark.parametrize("use_interpolation", [False, True])
def test_fast_multi_output_unet3d(use_interpolation):
    from bio_image_unet_tpu.models import MultiOutputUnet3D

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    _check(MultiOutputUnet3D(n_filter=4, output_heads=heads,
                             use_interpolation=use_interpolation),
           (2, 8, 16, 16, 1))


@pytest.mark.parametrize("levels,deep", [(4, False), (4, True), (3, True)])
def test_fast_nested_unet(levels, deep):
    from bio_image_unet_tpu.models import (
        MultiOutputNestedUNet,
        MultiOutputNestedUNet_3Levels,
    )

    heads = {"mask": {"channels": 1, "activation": "sigmoid"}}
    cls = MultiOutputNestedUNet if levels == 4 else MultiOutputNestedUNet_3Levels
    _check(cls(n_filter=4, output_heads=heads, deep_supervision=deep),
           (2, 32, 32, 1))


@pytest.mark.parametrize("name", ["Unet_v0", "BabyUnet"])
def test_fast_legacy(name):
    from bio_image_unet_tpu.models import get_model

    _check(get_model(name, n_filter=4), (2, 32, 32, 1))


@pytest.mark.parametrize("name", ["Unet_v0", "BabyUnet"])
def test_fast_legacy_f32_contract(name, tmp_path):
    """The legacy models have no bf16 mode (parity first): requesting
    half_precision must leave the whole legacy path f32, so results are
    IDENTICAL with and without the flag."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import get_model
    from bio_image_unet_tpu.predict.predictor import _Engine

    model = get_model(name, n_filter=4)
    shape = (2, 32, 32, 1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    variables = _warm_bn(model, variables, shape)
    ckpt = str(tmp_path / "legacy.ckpt")
    checkpoint.save(ckpt, variables, {"model_name": name, "n_filter": 4,
                                      "in_channels": 1, "out_channels": 1})
    eng_half = _Engine(ckpt, half_precision=True)
    eng_full = _Engine(ckpt, half_precision=False)
    assert eng_half.dtype == jnp.float32
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), shape),
                   np.float32)
    out_half = eng_half.predict_patches(x)
    out_full = eng_full.predict_patches(x)
    np.testing.assert_array_equal(np.asarray(out_half), np.asarray(out_full))
