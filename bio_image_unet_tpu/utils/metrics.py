"""Segmentation evaluation metrics.

The reference has no metric utilities (quality was judged by eye on
validation images); these back the framework's acceptance criterion — mask
IoU parity with the reference within 1e-3 (BASELINE.json:5) — and general
model evaluation.  Plain numpy/jax-agnostic: inputs may be arrays of
probabilities or binary masks.
"""

from __future__ import annotations

import numpy as np


def _binarize(x, threshold: float):
    """``threshold`` is on the [0, 1] probability scale; inputs on a wider
    scale (uint8/uint16 code points, or the library's own float16 0–255
    saved predictions) rescale it by their dtype/value range."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.integer) and x.max() > 1:
        return x >= threshold * float(np.iinfo(x.dtype).max)
    if np.issubdtype(x.dtype, np.floating) and x.size and np.nanmax(x) > 1.5:
        return x >= threshold * 255.0  # float probabilities·255 (save_as_tif)
    return x >= threshold


def iou(pred, target, threshold: float = 0.5, eps: float = 1e-9) -> float:
    """Intersection-over-union of binarized masks (Jaccard index)."""
    p = _binarize(pred, threshold)
    t = _binarize(target, threshold)
    inter = np.logical_and(p, t).sum()
    union = np.logical_or(p, t).sum()
    return float((inter + eps) / (union + eps))


def dice_coefficient(pred, target, threshold: float = 0.5, eps: float = 1e-9) -> float:
    """Sørensen–Dice coefficient of binarized masks."""
    p = _binarize(pred, threshold)
    t = _binarize(target, threshold)
    inter = np.logical_and(p, t).sum()
    return float((2.0 * inter + eps) / (p.sum() + t.sum() + eps))


def pixel_accuracy(pred, target, threshold: float = 0.5) -> float:
    """Fraction of pixels whose binarized prediction matches the target."""
    p = _binarize(pred, threshold)
    t = _binarize(target, threshold)
    return float(np.mean(p == t))
