"""The complete loss zoo, as pure JAX functions plus thin class wrappers.

The reference duplicates ~6 loss files across its five subpackages with subtle
per-package differences (logits-space vs probability-space BCE/Dice — see
bio_image_unet/unet/losses.py vs multi_output_unet/losses.py:8-28).  Here every
loss lives once, with the space made explicit via ``from_logits`` and the two
Dice conventions via ``per_sample``/``smooth``:

- segmentation: BCE, weighted BCE, soft Dice, BCE+Dice, log-cosh Dice,
  Tversky, log-cosh Tversky (reference: unet/losses.py:5-240,
  siam_unet/losses.py:109-148);
- regression: MSE, MAE, Huber (multi_output_unet/losses.py:75-99);
- structure: gradient loss, distance-gradient, weighted distance-gradient,
  weighted vector-field (multi_output_unet/losses.py:102-189);
- temporal: temporal consistency, BCE+Dice+temporal
  (multi_output_unet3d/losses.py:250-298).

Tensor layout is channels-last (NHWC / NDHWC); all functions are jit- and
grad-safe (no data-dependent Python control flow).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "bce_loss", "weighted_bce_loss", "soft_dice_loss", "bce_dice_loss",
    "logcosh_dice_loss", "tversky_loss", "logcosh_tversky_loss",
    "mse_loss", "mae_loss", "huber_loss", "smooth_l1_loss",
    "gradient_loss", "distance_gradient_loss",
    "weighted_distance_gradient_loss", "weighted_vector_field_loss",
    "temporal_consistency_loss", "bce_dice_temporal_loss", "BCELoss2d",
    "SoftDiceLoss", "BCEDiceLoss", "BCEDiceLossProb", "logcoshDiceLoss",
    "TverskyLoss", "logcoshTverskyLoss", "weightedBCELoss", "MSELoss",
    "MAELoss", "HuberLoss", "DistanceGradientLoss",
    "WeightedDistanceGradientLoss", "WeightedVectorFieldLoss",
    "TemporalConsistencyLoss", "BCEDiceTemporalLoss", "BCELoss",
    "get_head_loss", "get_loss", "LOSS_REGISTRY", "HEAD_LOSS_REGISTRY",
]

# ---------------------------------------------------------------------------
# functional core
# ---------------------------------------------------------------------------


def _as_probs(x, from_logits: bool):
    return jax.nn.sigmoid(x) if from_logits else x


def bce_loss(inputs, targets, from_logits: bool = True, eps: float = 1e-7):
    """Mean binary cross-entropy.

    ``from_logits=True`` is numerically-stable BCEWithLogits
    (reference unet/losses.py:5-37); ``False`` applies BCE to probabilities
    (reference siam_unet/losses.py:72-106 applies sigmoid then nn.BCELoss —
    call with pre-sigmoided inputs for that exact path).
    """
    if from_logits:
        # log(1+exp(-|x|)) + max(x,0) - x*t  — stable BCEWithLogits
        loss = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    else:
        p = jnp.clip(inputs, eps, 1.0 - eps)
        loss = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    return jnp.mean(loss)


def weighted_bce_loss(logits, targets, alpha: float = 1.0, beta: float = 0.1):
    """Per-pixel weighted BCE: weight ``alpha`` where target ≥ 0.5 else ``beta``
    (reference siam_unet/losses.py:109-148; sigmoid applied inside)."""
    probs = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1.0 - 1e-7)
    pixel_bce = -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))
    weights = jnp.where(targets >= 0.5, alpha, beta)
    return jnp.mean(pixel_bce * weights)


def soft_dice_loss(inputs, targets, smooth: float = 1.0, from_logits: bool = True,
                   per_sample: bool = True):
    """Soft Dice loss.

    ``per_sample=True`` flattens each batch row and averages the per-row score
    with the smooth term inside the ×2 (reference unet/losses.py:40-75:
    ``2*(intersection+smooth)/(m1+m2+smooth)``); ``per_sample=False`` is the
    global formulation used by multi_output (multi_output_unet/losses.py:22-25:
    ``(2*intersection+smooth)/(sum+smooth)``).
    """
    probs = _as_probs(inputs, from_logits)
    if per_sample:
        n = probs.shape[0]
        m1 = probs.reshape(n, -1)
        m2 = targets.reshape(n, -1)
        intersection = jnp.sum(m1 * m2, axis=1)
        score = 2.0 * (intersection + smooth) / (jnp.sum(m1, 1) + jnp.sum(m2, 1) + smooth)
        return 1.0 - jnp.mean(score)
    intersection = jnp.sum(probs * targets)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(targets) + smooth)
    return 1.0 - dice


def bce_dice_loss(inputs, targets, alpha: float = 1.0, beta: float = 1.0,
                  from_logits: bool = True, smooth: float = 1.0, per_sample: bool = True):
    """``alpha``·BCE + ``beta``·Dice.

    Logits-space with per-sample dice = reference unet/losses.py:78-112;
    probability-space with global dice and smooth 1e-5 = reference
    multi_output_unet/losses.py:8-28 (pass from_logits=False, smooth=1e-5,
    per_sample=False, alpha/beta = bce_weight/dice_weight).
    """
    return alpha * bce_loss(inputs, targets, from_logits) + beta * soft_dice_loss(
        inputs, targets, smooth=smooth, from_logits=from_logits, per_sample=per_sample
    )


def logcosh_dice_loss(inputs, targets, from_logits: bool = True):
    """log((e^x + e^-x)/2) of the soft-dice loss (reference unet/losses.py:115-142)."""
    x = soft_dice_loss(inputs, targets, from_logits=from_logits)
    return jnp.log((jnp.exp(x) + jnp.exp(-x)) / 2.0)


def tversky_loss(inputs, targets, alpha: float = 0.5, beta: float = 0.5,
                 smooth: float = 1.0, from_logits: bool = True):
    """Tversky loss with FP weight ``alpha``, FN weight ``beta``
    (reference unet/losses.py:145-191; probability-space variant without the
    sigmoid = multi_output_unet/losses.py:31-49, pass from_logits=False)."""
    probs = _as_probs(inputs, from_logits).reshape(-1)
    t = targets.reshape(-1)
    tp = jnp.sum(probs * t)
    fp = jnp.sum((1.0 - t) * probs)
    fn = jnp.sum(t * (1.0 - probs))
    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1.0 - tversky


def logcosh_tversky_loss(inputs, targets, alpha: float = 0.5, beta: float = 0.5,
                         smooth: float = 1.0, from_logits: bool = True):
    """log(cosh(1 − Tversky)) (reference unet/losses.py:194-240);
    ``tversky_loss`` already returns 1 − Tversky."""
    x = tversky_loss(inputs, targets, alpha, beta, smooth, from_logits)
    return jnp.log(jnp.cosh(x))


# --- regression -------------------------------------------------------------


def mse_loss(inputs, targets):
    """(reference multi_output_unet/losses.py:78-82)"""
    return jnp.mean((inputs - targets) ** 2)


def mae_loss(inputs, targets):
    """(reference multi_output_unet/losses.py:85-90)"""
    return jnp.mean(jnp.abs(inputs - targets))


def huber_loss(inputs, targets, delta: float = 1.0):
    """(reference multi_output_unet/losses.py:93-99)"""
    diff = jnp.abs(inputs - targets)
    loss = jnp.where(diff < delta, 0.5 * diff**2, delta * (diff - 0.5 * delta))
    return jnp.mean(loss)


def smooth_l1_loss(inputs, targets, beta: float = 1.0):
    """torch nn.SmoothL1Loss semantics, used by the 3D trainer's
    time-consistency term (reference unet3d/train.py:105,142-145)."""
    diff = jnp.abs(inputs - targets)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


# --- structural (spatial-derivative) losses ---------------------------------


def _spatial_gradients(x, axes: Tuple[int, int]):
    """numpy/torch.gradient semantics: central differences, one-sided at edges."""
    return [jnp.gradient(x, axis=ax) for ax in axes]


def gradient_loss(pred, target, axes: Tuple[int, int] = (-3, -2)):
    """MSE between spatial derivatives of pred and target
    (reference multi_output_unet/losses.py:102-113; torch.gradient over
    (y, x) dims).  Default axes assume NHWC."""
    dy_t, dx_t = _spatial_gradients(target, axes)
    dy_p, dx_p = _spatial_gradients(pred, axes)
    return jnp.mean((dy_p - dy_t) ** 2) + jnp.mean((dx_p - dx_t) ** 2)


def distance_gradient_loss(pred, target, alpha: float = 1.0, axes=(-3, -2)):
    """MSE + α·gradient loss (reference multi_output_unet/losses.py:116-134)."""
    return mse_loss(pred, target) + alpha * gradient_loss(pred, target, axes)


def weighted_distance_gradient_loss(pred, target, alpha: float = 1.0, beta: float = 0.5,
                                    axes=(-3, -2)):
    """Foreground-weighted MSE+MAE + α·gradient loss on the weighted maps
    (reference multi_output_unet/losses.py:137-154)."""
    weights = jnp.where(target > 0, beta, 1.0 - beta)
    pw, tw = pred * weights, target * weights
    distance = jnp.mean((pw - tw) ** 2) + jnp.mean(jnp.abs(pw - tw))
    return distance + alpha * gradient_loss(pw, tw, axes)


def weighted_vector_field_loss(pred_vectors, true_vectors, beta: float = 0.5,
                               magnitude_weight: float = 0.3, channel_axis: int = -1):
    """Masked MSE+MAE + magnitude-MSE for 2-component orientation fields
    (reference multi_output_unet/losses.py:156-189; the reference is (B,2,H,W),
    here channels-last by default)."""
    u = jnp.take(true_vectors, 0, axis=channel_axis)
    v = jnp.take(true_vectors, 1, axis=channel_axis)
    mask = ~((u == 0) & (v == 0))
    weights = jnp.where(mask, beta, 1.0 - beta)
    w_full = jnp.expand_dims(weights, channel_axis)
    mse = jnp.mean((pred_vectors * w_full - true_vectors * w_full) ** 2)
    mae = jnp.mean(jnp.abs(pred_vectors * w_full - true_vectors * w_full))
    pred_mag = jnp.sum(pred_vectors**2, axis=channel_axis)
    true_mag = jnp.sum(true_vectors**2, axis=channel_axis)
    magnitude = jnp.mean((pred_mag * weights - true_mag * weights) ** 2)
    return mse + mae + magnitude_weight * magnitude


# --- temporal ----------------------------------------------------------------


def temporal_consistency_loss(predictions, time_axis: int = 1):
    """Mean L1 between consecutive frames along the temporal axis
    (reference multi_output_unet3d/losses.py:250-264; reference layout is
    (B,C,Z,X,Y) with Z temporal — here (B,Z,X,Y,C), time_axis=1)."""
    n = predictions.shape[time_axis]
    a = jax.lax.slice_in_dim(predictions, 1, n, axis=time_axis)
    b = jax.lax.slice_in_dim(predictions, 0, n - 1, axis=time_axis)
    return jnp.mean(jnp.abs(a - b))


def bce_dice_temporal_loss(predictions, targets, loss_params=(1.0, 0.1),
                           from_logits: bool = True, time_axis: int = 1):
    """BCEDice(1,1) + λ·temporal consistency
    (reference multi_output_unet3d/losses.py:267-298)."""
    seg = bce_dice_loss(predictions, targets, 1.0, 1.0, from_logits=from_logits)
    temporal = temporal_consistency_loss(predictions, time_axis)
    return loss_params[0] * seg + loss_params[1] * temporal


# ---------------------------------------------------------------------------
# class wrappers (reference API parity: each loss is a callable object)
# ---------------------------------------------------------------------------


class _Loss:
    def __repr__(self):
        return f"{type(self).__name__}({self.__dict__})"


class BCELoss2d(_Loss):
    """reference unet/losses.py:5-37 (logits) / siam_unet/losses.py:72-106 (probs)."""

    def __init__(self, from_logits: bool = True):
        self.from_logits = from_logits

    def __call__(self, inputs, targets):
        return bce_loss(inputs, targets, self.from_logits)


BCELoss = BCELoss2d  # multi_output_unet3d/losses.py:6-39 name


class SoftDiceLoss(_Loss):
    def __init__(self, smooth: float = 1.0, from_logits: bool = True):
        self.smooth, self.from_logits = smooth, from_logits

    def __call__(self, inputs, targets):
        return soft_dice_loss(inputs, targets, self.smooth, self.from_logits)


class BCEDiceLoss(_Loss):
    """Logits-space α·BCE+β·Dice (reference unet/losses.py:78-112)."""

    def __init__(self, alpha: float = 1.0, beta: float = 1.0):
        self.alpha, self.beta = alpha, beta

    def __call__(self, inputs, targets):
        return bce_dice_loss(inputs, targets, self.alpha, self.beta, from_logits=True)


class BCEDiceLossProb(_Loss):
    """Probability-space BCE+Dice with global dice & smooth 1e-5
    (reference multi_output_unet/losses.py:8-28; exported as ``BCEDiceLoss``
    from the multi_output facade)."""

    def __init__(self, bce_weight: float = 0.5, dice_weight: float = 0.5):
        self.bce_weight, self.dice_weight = bce_weight, dice_weight

    def __call__(self, inputs, targets):
        return bce_dice_loss(
            inputs, targets, self.bce_weight, self.dice_weight,
            from_logits=False, smooth=1e-5, per_sample=False,
        )


class BCEDiceLossProb3D(_Loss):
    """Probability-space BCE+Dice with the 3D multi-output family's
    parameterization: α/β weights 1/1 ('BCEDiceLoss') or 0/1 ('DiceLoss'),
    per-sample dice, smooth 1.0 (reference multi_output_unet3d/train.py:150-153
    → losses.py:81-116).

    Documented divergence: the reference applies its logits-space losses to
    outputs the model has already sigmoided (multi_output_unet3d.py:97-99,168)
    — a double sigmoid.  Here the loss runs in probability space once, keeping
    the intended formulation without the bug (see README, documented
    divergences)."""

    def __init__(self, alpha: float = 1.0, beta: float = 1.0):
        self.alpha, self.beta = alpha, beta

    def __call__(self, inputs, targets):
        return bce_dice_loss(
            inputs, targets, self.alpha, self.beta,
            from_logits=False, smooth=1.0, per_sample=True,
        )


class logcoshDiceLoss(_Loss):
    def __init__(self, from_logits: bool = True):
        self.from_logits = from_logits

    def __call__(self, inputs, targets):
        return logcosh_dice_loss(inputs, targets, self.from_logits)


class TverskyLoss(_Loss):
    def __init__(self, alpha: float = 0.5, beta: float = 0.5, smooth: float = 1.0,
                 from_logits: bool = True):
        self.alpha, self.beta, self.smooth, self.from_logits = alpha, beta, smooth, from_logits

    def __call__(self, inputs, targets):
        return tversky_loss(inputs, targets, self.alpha, self.beta, self.smooth, self.from_logits)


class logcoshTverskyLoss(_Loss):
    def __init__(self, alpha: float = 0.5, beta: float = 0.5, smooth: float = 1.0,
                 from_logits: bool = True):
        self.alpha, self.beta, self.smooth, self.from_logits = alpha, beta, smooth, from_logits

    def __call__(self, inputs, targets):
        return logcosh_tversky_loss(
            inputs, targets, self.alpha, self.beta, self.smooth, self.from_logits
        )


class weightedBCELoss(_Loss):
    def __init__(self, alpha: float = 1.0, beta: float = 0.1):
        self.alpha, self.beta = alpha, beta

    def __call__(self, logits, targets):
        return weighted_bce_loss(logits, targets, self.alpha, self.beta)


class MSELoss(_Loss):
    def __call__(self, inputs, targets):
        return mse_loss(inputs, targets)


class MAELoss(_Loss):
    def __call__(self, inputs, targets):
        return mae_loss(inputs, targets)


class HuberLoss(_Loss):
    def __init__(self, delta: float = 1.0):
        self.delta = delta

    def __call__(self, inputs, targets):
        return huber_loss(inputs, targets, self.delta)


class DistanceGradientLoss(_Loss):
    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def __call__(self, pred, target):
        return distance_gradient_loss(pred, target, self.alpha)


class WeightedDistanceGradientLoss(_Loss):
    def __init__(self, alpha: float = 1.0, beta: float = 0.5):
        self.alpha, self.beta = alpha, beta

    def __call__(self, pred, target):
        return weighted_distance_gradient_loss(pred, target, self.alpha, self.beta)


class WeightedVectorFieldLoss(_Loss):
    def __init__(self, beta: float = 0.5, magnitude_weight: float = 0.3):
        self.beta, self.magnitude_weight = beta, magnitude_weight

    def __call__(self, pred, target):
        return weighted_vector_field_loss(pred, target, self.beta, self.magnitude_weight)


class TemporalConsistencyLoss(_Loss):
    def __init__(self, time_axis: int = 1):
        self.time_axis = time_axis

    def __call__(self, predictions):
        return temporal_consistency_loss(predictions, self.time_axis)


class BCEDiceTemporalLoss(_Loss):
    def __init__(self, loss_params=(1.0, 0.1), from_logits: bool = True):
        self.loss_params, self.from_logits = tuple(loss_params), from_logits

    def __call__(self, predictions, targets):
        return bce_dice_temporal_loss(predictions, targets, self.loss_params, self.from_logits)


# registry used by the Trainer's string-based loss selection
# (reference unet/train.py:94-101 and multi_output_unet/train.py:107-130)
LOSS_REGISTRY = {
    "BCE": BCELoss2d,
    "BCEDice": BCEDiceLoss,
    "BCEDiceProb": BCEDiceLossProb,
    "Dice": SoftDiceLoss,
    "logcoshDice": logcoshDiceLoss,
    "Tversky": TverskyLoss,
    "logcoshTversky": logcoshTverskyLoss,
    "weightedBCE": weightedBCELoss,
    "MSE": MSELoss,
    "MAE": MAELoss,
    "Huber": HuberLoss,
    "DistanceGradient": DistanceGradientLoss,
    "WeightedDistanceGradient": WeightedDistanceGradientLoss,
    "WeightedVectorField": WeightedVectorFieldLoss,
    "BCEDiceTemporal": BCEDiceTemporalLoss,
}


# Per-head loss names as the multi_output reference spells them in
# ``output_heads`` configs (multi_output_unet/train.py:107-130).  Multi-output
# models activate in-forward, so these all operate in probability space.
HEAD_LOSS_REGISTRY = {
    "BCEDiceLoss": lambda: BCEDiceLossProb(),
    "DiceLoss": lambda: BCEDiceLossProb(bce_weight=0, dice_weight=1),
    "TverskyLoss": lambda: TverskyLoss(from_logits=False),
    "logcoshTverskyLoss": lambda: logcoshTverskyLoss(from_logits=False),
    "MSELoss": MSELoss,
    "MAELoss": MAELoss,
    "HuberLoss": HuberLoss,
    "DistanceGradientLoss": DistanceGradientLoss,
    "WeightedDistanceGradientLoss": WeightedDistanceGradientLoss,
    "WeightedVectorFieldLoss": WeightedVectorFieldLoss,
    "BCEDiceTemporalLoss": lambda: BCEDiceTemporalLoss(from_logits=False),
}

# The 3D multi-output reference parameterizes its seg losses differently
# (multi_output_unet3d/train.py:150-153): BCEDiceLoss(1,1)/DiceLoss=(0,1)
# with per-sample dice and smooth 1.0, vs the 2D family's 0.5/0.5 global
# dice with smooth 1e-5.  Everything else resolves identically (the
# Tversky defaults match, and BCEDiceTemporalLoss already carries the 3D
# formulation).
HEAD_LOSS_REGISTRY_3D = {
    **HEAD_LOSS_REGISTRY,
    "BCEDiceLoss": lambda: BCEDiceLossProb3D(),
    "DiceLoss": lambda: BCEDiceLossProb3D(alpha=0.0, beta=1.0),
}


def get_head_loss(name: str, family: str = "2d"):
    """Instantiate a per-head loss by its ``output_heads`` config name
    (reference multi_output_unet/train.py:107-130; ``family='3d'`` applies
    the multi_output_unet3d parameterization, train.py:150-153)."""
    if callable(name) and not isinstance(name, str):
        return name
    registry = HEAD_LOSS_REGISTRY_3D if family == "3d" else HEAD_LOSS_REGISTRY
    if name not in registry:
        raise ValueError(f'Loss "{name}" not defined! Available: {sorted(registry)}')
    return registry[name]()


def get_loss(name: str, **kwargs):
    """Instantiate a loss by registry name."""
    if callable(name) and not isinstance(name, str):
        return name
    if name not in LOSS_REGISTRY:
        raise ValueError(f"unknown loss '{name}'; available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name](**kwargs)
