"""Loss zoo goldens vs the reference torch implementations."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import bio_image_unet_tpu.losses as L

from ref_loader import load_ref_module

ref_unet_losses = load_ref_module("unet/losses.py", "ref_unet_losses")
ref_siam_losses = load_ref_module("siam_unet/losses.py", "ref_siam_losses")
ref_mo_losses = load_ref_module("multi_output_unet/losses.py", "ref_mo_losses")
ref_mo3d_losses = load_ref_module("multi_output_unet3d/losses.py", "ref_mo3d_losses")


@pytest.fixture
def logits_targets(rng):
    logits = rng.standard_normal((4, 1, 16, 16)).astype(np.float32) * 2
    targets = (rng.random((4, 1, 16, 16)) > 0.6).astype(np.float32)
    return logits, targets


def t(x):
    return torch.tensor(x)


def j(x):
    return jnp.asarray(x)


def close(ours, ref, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(float(ours), float(ref), rtol=rtol, atol=atol)


def test_bce(logits_targets):
    lg, tg = logits_targets
    close(L.bce_loss(j(lg), j(tg)), ref_unet_losses.BCELoss2d()(t(lg), t(tg)))


def test_soft_dice(logits_targets):
    lg, tg = logits_targets
    close(L.soft_dice_loss(j(lg), j(tg)), ref_unet_losses.SoftDiceLoss()(t(lg), t(tg)))


def test_bce_dice(logits_targets):
    lg, tg = logits_targets
    close(
        L.bce_dice_loss(j(lg), j(tg), alpha=0.3, beta=0.7),
        ref_unet_losses.BCEDiceLoss(0.3, 0.7)(t(lg), t(tg)),
    )
    close(L.BCEDiceLoss(1.0, 1.0)(j(lg), j(tg)), ref_unet_losses.BCEDiceLoss(1, 1)(t(lg), t(tg)))


def test_logcosh_dice(logits_targets):
    lg, tg = logits_targets
    close(L.logcosh_dice_loss(j(lg), j(tg)), ref_unet_losses.logcoshDiceLoss()(t(lg), t(tg)))


def test_tversky(logits_targets):
    lg, tg = logits_targets
    close(
        L.tversky_loss(j(lg), j(tg), alpha=0.3, beta=0.7),
        ref_unet_losses.TverskyLoss(0.3, 0.7)(t(lg), t(tg)),
    )


def test_logcosh_tversky(logits_targets):
    lg, tg = logits_targets
    close(
        L.logcosh_tversky_loss(j(lg), j(tg), alpha=0.3, beta=0.7),
        ref_unet_losses.logcoshTverskyLoss(0.3, 0.7)(t(lg), t(tg)),
    )


def test_weighted_bce(logits_targets):
    lg, tg = logits_targets
    close(
        L.weighted_bce_loss(j(lg), j(tg), alpha=1.0, beta=0.1),
        ref_siam_losses.weightedBCELoss(1, 0.1)(t(lg), t(tg)),
        rtol=1e-4,
    )


def test_bce_dice_prob_space(rng):
    """multi_output probability-space BCEDice (reference
    multi_output_unet/losses.py:8-28)."""
    probs = rng.random((2, 1, 16, 16)).astype(np.float32) * 0.98 + 0.01
    tg = (rng.random((2, 1, 16, 16)) > 0.5).astype(np.float32)
    close(
        L.BCEDiceLossProb(0.5, 0.5)(j(probs), j(tg)),
        ref_mo_losses.BCEDiceLoss(0.5, 0.5)(t(probs), t(tg)),
        rtol=1e-4,
    )


def test_tversky_prob_space(rng):
    probs = rng.random((2, 1, 16, 16)).astype(np.float32)
    tg = (rng.random((2, 1, 16, 16)) > 0.5).astype(np.float32)
    close(
        L.tversky_loss(j(probs), j(tg), from_logits=False),
        ref_mo_losses.TverskyLoss()(t(probs), t(tg)),
    )


def test_regression_losses(rng):
    a = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    b = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
    close(L.mse_loss(j(a), j(b)), ref_mo_losses.MSELoss()(t(a), t(b)))
    close(L.mae_loss(j(a), j(b)), ref_mo_losses.MAELoss()(t(a), t(b)))
    close(L.huber_loss(j(a), j(b), 1.0), ref_mo_losses.HuberLoss(1.0)(t(a), t(b)))


def test_gradient_losses(rng):
    """reference gradient losses operate on NCHW with dims (-2,-1)."""
    a = rng.standard_normal((2, 1, 12, 12)).astype(np.float32)
    b = rng.standard_normal((2, 1, 12, 12)).astype(np.float32)
    close(
        L.gradient_loss(j(a), j(b), axes=(-2, -1)),
        ref_mo_losses.gradient_loss(t(a), t(b)),
        rtol=1e-4,
    )
    close(
        L.distance_gradient_loss(j(a), j(b), alpha=1.0, axes=(-2, -1)),
        ref_mo_losses.DistanceGradientLoss(1.0)(t(a), t(b)),
        rtol=1e-4,
    )
    close(
        L.weighted_distance_gradient_loss(j(a), j(b), alpha=1.0, beta=0.5, axes=(-2, -1)),
        ref_mo_losses.WeightedDistanceGradientLoss(1.0, 0.5)(t(a), t(b)),
        rtol=1e-4,
    )


def test_weighted_vector_field_loss(rng):
    pred = rng.standard_normal((2, 2, 10, 10)).astype(np.float32)
    true = rng.standard_normal((2, 2, 10, 10)).astype(np.float32)
    true[:, :, :3] = 0.0  # some invalid-vector regions
    ref = ref_mo_losses.WeightedVectorFieldLoss(0.5, 0.3)(t(pred), t(true))
    ours = L.weighted_vector_field_loss(
        j(np.moveaxis(pred, 1, -1)), j(np.moveaxis(true, 1, -1)), beta=0.5, magnitude_weight=0.3
    )
    close(ours, ref, rtol=1e-4)


def test_temporal_losses(rng):
    """reference layout (B, C, Z, X, Y); ours channels-last (B, Z, X, Y, C)."""
    pred = rng.standard_normal((2, 1, 6, 8, 8)).astype(np.float32)
    tg = (rng.random((2, 1, 6, 8, 8)) > 0.5).astype(np.float32)
    ref_t = ref_mo3d_losses.TemporalConsistencyLoss()(t(pred))
    ours_t = L.temporal_consistency_loss(j(np.moveaxis(pred, 1, -1)), time_axis=1)
    close(ours_t, ref_t, rtol=1e-5)
    ref_c = ref_mo3d_losses.BCEDiceTemporalLoss((1.0, 0.1))(t(pred), t(tg))
    ours_c = L.bce_dice_temporal_loss(
        j(np.moveaxis(pred, 1, -1)), j(np.moveaxis(tg, 1, -1)), (1.0, 0.1), time_axis=1
    )
    close(ours_c, ref_c, rtol=1e-4)


def test_smooth_l1(rng):
    a = rng.standard_normal((4, 8)).astype(np.float32)
    b = rng.standard_normal((4, 8)).astype(np.float32)
    close(L.smooth_l1_loss(j(a), j(b)), torch.nn.SmoothL1Loss()(t(a), t(b)))


def test_head_loss_3d_family(rng):
    """The 3D multi-output reference parameterizes 'BCEDiceLoss'/'DiceLoss'
    as BCEDiceLoss(1,1)/(0,1) with per-sample dice and smooth 1.0
    (multi_output_unet3d/train.py:150-153), unlike the 2D family's 0.5/0.5
    global-dice smooth-1e-5 convention.  Golden: the reference 3D loss on
    logits whose sigmoid equals our probabilities (the reference's
    double-sigmoid is the documented divergence — see MIGRATION.md)."""
    ref_3d = load_ref_module("multi_output_unet3d/losses.py", "ref_mo3d_losses")
    probs = rng.random((2, 1, 4, 8, 8)).astype(np.float32) * 0.98 + 0.01
    tg = (rng.random((2, 1, 4, 8, 8)) > 0.5).astype(np.float32)
    logits = np.log(probs / (1.0 - probs))  # sigmoid(logits) == probs
    for name, ref_loss in [("BCEDiceLoss", ref_3d.BCEDiceLoss(1, 1)),
                           ("DiceLoss", ref_3d.BCEDiceLoss(0, 1))]:
        ours = L.get_head_loss(name, family="3d")
        assert isinstance(ours, L.BCEDiceLossProb3D)
        close(ours(j(probs), j(tg)), ref_loss(t(logits), t(tg)), rtol=1e-4)
    # the 2D family keeps the multi_output convention
    assert isinstance(L.get_head_loss("BCEDiceLoss"), L.BCEDiceLossProb)
    assert isinstance(L.get_head_loss("BCEDiceLoss", family="3d"),
                      L.BCEDiceLossProb3D)


def test_trainer_binds_3d_head_loss_family(tmp_path):
    """Trainer resolves head losses with the 3D parameterization for
    MultiOutputUnet3D and the 2D one for MultiOutputUnet."""
    from bio_image_unet_tpu.train.trainer import Trainer

    def _ds(shape):
        class _DS:
            dim_out = None

            def __len__(self):
                return 4

            def __getitem__(self, i):
                img = np.zeros(shape, np.float32)
                return {"image": img, "seg": np.zeros(shape, np.float32)}

        return _DS()

    heads = {"seg": {"channels": 1, "activation": "sigmoid",
                     "loss": "BCEDiceLoss"}}
    tr3d = Trainer(_ds((8, 16, 16, 1)), num_epochs=1, network="MultiOutputUnet3D",
                   output_heads=heads, n_filter=4, batch_size=1,
                   val_split=0.0, save_dir=str(tmp_path))
    assert isinstance(tr3d.head_losses["seg"], L.BCEDiceLossProb3D)
    tr2d = Trainer(_ds((16, 16, 1)), num_epochs=1, network="MultiOutputUnet",
                   output_heads=heads, n_filter=4, batch_size=1,
                   val_split=0.0, save_dir=str(tmp_path))
    assert isinstance(tr2d.head_losses["seg"], L.BCEDiceLossProb)


def test_registry():
    loss = L.get_loss("BCEDice", alpha=1.0, beta=1.0)
    assert isinstance(loss, L.BCEDiceLoss)
    with pytest.raises(ValueError):
        L.get_loss("nope")
    custom = lambda a, b: 0.0  # noqa: E731
    assert L.get_loss(custom) is custom


def test_losses_are_grad_safe(logits_targets):
    import jax

    lg, tg = logits_targets
    g = jax.grad(lambda x: L.bce_dice_loss(x, j(tg), 1.0, 1.0))(j(lg))
    assert np.isfinite(np.asarray(g)).all()
    g = jax.grad(lambda x: L.weighted_distance_gradient_loss(x, j(tg), axes=(-2, -1)))(j(lg))
    assert np.isfinite(np.asarray(g)).all()
