"""Patch grids and overlap-aware stitchers (vectorized scatter-add).

The reference family uses three distinct overlap semantics; all are
reproduced here as (result, weight)-plane accumulation:

- mean of overlapping patches       ≙ NaN-stack + nanmean
  (unet/predict.py:204-229, siam_unet/predict.py:217-240,
  unet3d/predict.py:173-195)
- zeroed safe-margin weights, mean-fill of uncovered pixels
  (multi_output_unet/predict.py:234-285)
- linear blend-margin ramp          ≙ multi_output_unet3d/predict.py:203-307
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def grid_starts(extent: int, tile: int, add: int = 0) -> np.ndarray:
    """Predict-style grid (unet/predict.py:154-172): ``ceil(extent/tile)+add``
    linspace-spaced start offsets over [0, extent - tile]."""
    n = int(np.ceil(extent / tile)) + add
    return np.linspace(0, max(extent - tile, 0), max(n, 1)).astype(int)


def overlap_starts(extent: int, tile: int, overlap_factor: float) -> List[int]:
    """Stride-based grid (multi_output_unet3d/predict.py:134-148):
    stride = tile·(1−overlap), plus a final flush-right start."""
    stride = max(1, int(tile * (1.0 - overlap_factor)))
    starts = list(range(0, max(extent - tile + 1, 1), stride))
    if starts[-1] + tile < extent:
        starts.append(extent - tile)
    return starts


def _accumulate(patches, weights, starts_per_axis, out_shape):
    """Scatter-add ``patches·weights`` and ``weights`` into (result, weight)
    planes.  ``patches`` is (N_grid..., *tile, C) reshaped flat."""
    result = np.zeros(out_shape, dtype=np.float32)
    weight = np.zeros(out_shape, dtype=np.float32)
    tile = patches.shape[1:]
    nsp = len(starts_per_axis)
    idx_grids = np.meshgrid(*[np.arange(len(s)) for s in starts_per_axis], indexing="ij")
    flat_indices = [g.ravel() for g in idx_grids]
    for n in range(patches.shape[0]):
        slices = tuple(
            slice(starts_per_axis[a][flat_indices[a][n]],
                  starts_per_axis[a][flat_indices[a][n]] + tile[a])
            for a in range(nsp)
        )
        result[slices] += patches[n] * weights[n]
        weight[slices] += weights[n]
    return result, weight


def stitch_mean(patches: np.ndarray, starts_per_axis: Sequence[np.ndarray],
                out_spatial: Tuple[int, ...]) -> np.ndarray:
    """Plain mean of overlapping patches — numerically equals the reference's
    NaN-stack ``np.nanmean`` (every covered pixel averages its contributions;
    uncovered pixels cannot exist because the grid spans the extent)."""
    channels = patches.shape[-1]
    ones = np.ones((patches.shape[0],) + (1,) * (patches.ndim - 1), dtype=np.float32)
    result, weight = _accumulate(
        patches.astype(np.float32), ones, starts_per_axis, tuple(out_spatial) + (channels,)
    )
    np.divide(result, weight, out=result, where=weight > 0)
    return result


def _margin_weights(grid_shape: Sequence[int], tile: Sequence[int],
                    margin: int) -> np.ndarray:
    """Binary weights: zero a ``margin``-wide border on sides that overlap a
    neighbor (multi_output_unet/predict.py:247-266)."""
    weights = []
    for idx in np.ndindex(*grid_shape):
        w = np.ones(tuple(tile) + (1,), dtype=np.float32)
        for a, (i, n) in enumerate(zip(idx, grid_shape)):
            sl = [slice(None)] * (len(tile) + 1)
            if i > 0:
                sl[a] = slice(0, margin)
                w[tuple(sl)] = 0
            if i < n - 1:
                sl[a] = slice(-margin, None)
                w[tuple(sl)] = 0
        weights.append(w)
    return np.stack(weights)


def _margin_factors(grid_shape: Sequence[int], tile: Sequence[int],
                    margin: int) -> List[np.ndarray]:
    """Per-axis (n_a, t_a) factor tables whose outer MIN reproduces
    :func:`_margin_weights` (binary masks: min ≡ logical and).  The fused
    predict programs rebuild each patch's weight plane from these O(n·t)
    tables instead of materializing/uploading the (N, *tile) stack."""
    factors = []
    for n, t in zip(grid_shape, tile):
        f = np.ones((n, t), np.float32)
        for i in range(n):
            if i > 0:
                f[i, :margin] = 0
            if i < n - 1:
                # mirror the dense path's slice(-margin, None) EXACTLY,
                # including the margin=0 quirk (slice(-0, None) is the WHOLE
                # axis — the reference zeroes the entire patch,
                # multi_output_unet/predict.py:266)
                f[i, (max(t - margin, 0) if margin > 0 else 0):] = 0
        factors.append(f)
    return factors


def _blend_factors(grid_shape: Sequence[int], tile: Sequence[int],
                   margin: int) -> List[np.ndarray]:
    """Per-axis factor tables whose outer MIN reproduces
    :func:`_blend_weights` (which itself min-accumulates per-axis ramps)."""
    factors = []
    for n, t in zip(grid_shape, tile):
        f = np.ones((n, t), np.float32)
        m = min(margin, t)
        ramp = np.arange(m, dtype=np.float32) / margin
        for i in range(n):
            if i > 0:
                f[i, :m] = np.minimum(f[i, :m], ramp)
            if i < n - 1:
                f[i, t - m:] = np.minimum(f[i, t - m:], ramp[::-1])
        factors.append(f)
    return factors


def stitch_margin(patches: np.ndarray, starts_per_axis: Sequence[np.ndarray],
                  out_spatial: Tuple[int, ...], safe_margin: int = 20) -> np.ndarray:
    """Safe-margin stitch (multi_output_unet/predict.py:234-285): overlap
    borders are zero-weighted, pixels left uncovered are filled with the
    patch mean."""
    grid_shape = [len(s) for s in starts_per_axis]
    channels = patches.shape[-1]
    w = _margin_weights(grid_shape, patches.shape[1:-1], safe_margin)
    result, weight = _accumulate(
        patches.astype(np.float32), w, starts_per_axis, tuple(out_spatial) + (channels,)
    )
    np.divide(result, weight, out=result, where=weight > 0)
    result[np.broadcast_to(weight == 0, result.shape)] = float(patches.mean())
    return result


def _blend_weights(grid_shape: Sequence[int], tile: Sequence[int],
                   margin: int) -> np.ndarray:
    """Linear 0→1 ramp over ``margin`` voxels on overlapping sides.

    Documented divergence — the reference's weight construction
    (multi_output_unet3d/predict.py:249-273) is implemented sanely here,
    not reproduced: the reference (a) ASSIGNS each axis's ramp
    (``patch_weight[...] = i/blend_margin``), so the last-written axis
    clobbers the others at corners instead of combining; (b) ramps its
    trailing edges with ``max(-(i + 1), 0)``, which is 0 for every ``i`` —
    the back edge keeps weight 1 while the FRONT plane is overwritten with
    ``(m-1)/margin``; and (c) sizes the z ramp with ``min(blend_margin,
    self.N_z)`` — the patch COUNT, not the tile depth.  This rebuild uses a
    symmetric per-axis ramp combined with ``np.minimum`` (leading and
    trailing edges treated alike), which is what the reference's comments
    say it intends ('smooth transitions at borders')."""
    weights = []
    for idx in np.ndindex(*grid_shape):
        w = np.ones(tuple(tile) + (1,), dtype=np.float32)
        for a, (i, n) in enumerate(zip(idx, grid_shape)):
            m = min(margin, tile[a])
            ramp = np.arange(m, dtype=np.float32) / margin
            shape = [1] * (len(tile) + 1)
            shape[a] = m
            if i > 0:
                sl = [slice(None)] * (len(tile) + 1)
                sl[a] = slice(0, m)
                w[tuple(sl)] = np.minimum(w[tuple(sl)], ramp.reshape(shape))
            if i < n - 1:
                sl = [slice(None)] * (len(tile) + 1)
                sl[a] = slice(tile[a] - m, None)
                w[tuple(sl)] = np.minimum(w[tuple(sl)], ramp[::-1].reshape(shape))
        weights.append(w)
    return np.stack(weights)


def stitch_blend3d(patches: np.ndarray, starts_per_axis: Sequence[Sequence[int]],
                   out_spatial: Tuple[int, ...], blend_margin: int = 16) -> np.ndarray:
    """Linear-blend stitch for 3D grids
    (multi_output_unet3d/predict.py:203-307); uncovered voxels are zero."""
    channels = patches.shape[-1]
    w = _blend_weights([len(s) for s in starts_per_axis], patches.shape[1:-1], blend_margin)
    result, weight = _accumulate(
        patches.astype(np.float32), w, starts_per_axis, tuple(out_spatial) + (channels,)
    )
    np.divide(result, weight, out=result, where=weight > 0)
    result[np.broadcast_to(weight == 0, result.shape)] = 0.0
    return result
