"""Exact uint8 percentiles via 256-bin histograms — the TPU-friendly
replacement for ``jnp.percentile`` in the fused predict pipeline.

``jnp.percentile`` sorts: for per-frame normalization of a 1024² movie that
is a 1M-element sort per frame, which competes with the U-Net itself for
device time.  uint8 data admits an O(P) exact formulation: count the 256
values (a broadcast-compare fused into a reduction — no scatter, no sort),
cumsum, and read order statistics off the CDF with numpy's linear
interpolation rule.  Bit-exact against ``np.percentile`` on uint8 inputs
(tests/test_histogram.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def u8_counts(flat, chunk: int = 4096):
    """(N, P) uint8 → (N, 256) int32 value counts.

    Lowered as a broadcast-compare fused into a two-axis reduction (XLA
    never materializes the (…, 256) one-hot); falls back to the same math
    unchunked when ``chunk`` does not divide P."""
    n, p = flat.shape
    vals = jnp.arange(256, dtype=flat.dtype)
    if p % chunk:
        return jnp.sum(flat[:, :, None] == vals, axis=1, dtype=jnp.int32)
    blocks = flat.reshape(n, p // chunk, chunk)
    return jnp.sum(blocks[..., None] == vals, axis=(1, 2), dtype=jnp.int32)


def _order_stat(cum, k: int):
    """Value of the k-th (0-based) order statistic per row of a (N, 256)
    cumulative histogram: the smallest value v with cum[v] ≥ k+1."""
    return jnp.argmax(cum >= (k + 1), axis=1).astype(jnp.float32)


def u8_percentile(frames_u8, qs):
    """Exact per-frame percentiles of a (N, *spatial) uint8 array.

    ``qs`` is a static sequence of percentiles (0–100).  Returns a list of
    (N,) float32 arrays following numpy's 'linear' interpolation rule."""
    n = frames_u8.shape[0]
    flat = frames_u8.reshape(n, -1)
    cum = jnp.cumsum(u8_counts(flat), axis=1)
    return [_interp_pct(cum, flat.shape[1], q) for q in qs]


def _interp_pct(cum, p: int, q: float):
    """numpy 'linear'-rule percentile from a per-frame cumulative histogram
    (the single definition both u8_percentile and u8_clip_bounds use)."""
    pos = (p - 1) * (float(q) / 100.0)
    lo_k, hi_k = int(np.floor(pos)), int(np.ceil(pos))
    lo = _order_stat(cum, lo_k)
    if hi_k == lo_k:
        return lo
    return lo + (pos - lo_k) * (_order_stat(cum, hi_k) - lo)


def u8_clip_bounds(frames_u8, q_lo: float, q_hi: float):
    """Everything the percentile-normalize stage needs from ONE histogram
    pass: per-frame ``(lo, hi, fmin, fmax)`` where lo/hi are the clip
    percentiles and fmin/fmax are the min/max AFTER clipping to [lo, hi]
    (clipping can only pull the extremes inward)."""
    n = frames_u8.shape[0]
    flat = frames_u8.reshape(n, -1)
    p = flat.shape[1]
    cum = jnp.cumsum(u8_counts(flat), axis=1)
    lo, hi = _interp_pct(cum, p, q_lo), _interp_pct(cum, p, q_hi)
    vmin = _order_stat(cum, 0)
    vmax = _order_stat(cum, p - 1)
    return lo, hi, jnp.maximum(vmin, lo), jnp.minimum(vmax, hi)
