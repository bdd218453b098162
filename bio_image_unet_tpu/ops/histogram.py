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


def _order_stats_bitsearch(flat, ks, n_bits: int):
    """Per-frame order statistics of an unsigned (N, P) array by bitwise
    binary search over the VALUE space: ``n_bits`` passes, each a
    broadcast-compare fused into a reduction.

    The uint8 path counts all 256 values in one pass; at 16 bits a 65,536-bin
    one-hot would be 256× that work, while this search is 16 compare+sum
    sweeps (~2·n_bits VPU ops/pixel — noise next to the U-Net forward) and
    exact for integers.  ``ks`` is a static list of 0-based positions; returns
    (N, len(ks)) in the working dtype (int32, or uint32 when the input is
    uint32 — the float32 sortable-bits path needs the full 32-bit space)."""
    work = jnp.uint32 if flat.dtype == jnp.uint32 else jnp.int32
    x = flat.astype(work)
    ks_arr = jnp.asarray(ks, jnp.int32)[None, :]  # (1, S)
    n = flat.shape[0]
    val = jnp.zeros((n, len(ks)), work)
    np_work = np.uint32 if work == jnp.uint32 else np.int32
    for bit in range(n_bits - 1, -1, -1):
        # answer < val + 2^bit  ⇔  count(x ≤ val + 2^bit − 1) ≥ k+1
        # (val's bits below `bit` are still 0, so the add never overflows);
        # explicit np scalars — 1<<31 cannot weak-type into an int32 lane
        step = np_work(1) << np_work(bit)
        cand = val + (step - np_work(1))
        cnt = jnp.sum(x[:, :, None] <= cand[:, None, :], axis=1,
                      dtype=jnp.int32)
        val = jnp.where(cnt < ks_arr + 1, val + step, val)
    return val


def _f32_sortable(x_f32):
    """float32 → uint32 whose unsigned order equals the floats' numeric
    order (the radix-sort transform): non-negatives set the top bit, negatives
    flip all bits.  NaNs map above +inf — callers must exclude them."""
    import jax

    bits = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    return jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))


def _f32_unsortable(u_u32):
    """Inverse of :func:`_f32_sortable`."""
    import jax

    bits = jnp.where(u_u32 >> 31 == 1, u_u32 ^ jnp.uint32(0x80000000),
                     ~u_u32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def int_clip_bounds(frames, q_lo: float, q_hi: float, n_bits: int = 16):
    """Per-frame ``(lo, hi, fmin, fmax)`` for unsigned-integer frames of any
    bit width (the uint16-capable sibling of :func:`u8_clip_bounds`): lo/hi
    are the numpy-'linear' clip percentiles found by bitwise binary search,
    fmin/fmax the frame min/max clamped into [lo, hi] (= extremes after
    clipping)."""
    n = frames.shape[0]
    flat = frames.reshape(n, -1)
    p = flat.shape[1]
    ks, poss = [], []
    for q in (q_lo, q_hi):
        pos = (p - 1) * (float(q) / 100.0)
        poss.append(pos)
        ks.extend((int(np.floor(pos)), int(np.ceil(pos))))
    stats = _order_stats_bitsearch(flat, ks, n_bits).astype(jnp.float32)

    lo, hi = (_interp_stat(stats, ks, poss, i) for i in range(2))
    vmin = jnp.min(flat, axis=1).astype(jnp.float32)
    vmax = jnp.max(flat, axis=1).astype(jnp.float32)
    return lo, hi, jnp.maximum(vmin, lo), jnp.minimum(vmax, hi)


def _interp_stat(stats_f32, ks, poss, i):
    """numpy-'linear' interpolation between the floor/ceil order statistics
    of percentile ``i`` (columns 2i, 2i+1 of a bit-search result)."""
    lo_k, hi_k = ks[2 * i], ks[2 * i + 1]
    lo_v, hi_v = stats_f32[:, 2 * i], stats_f32[:, 2 * i + 1]
    if hi_k == lo_k:
        return lo_v
    return lo_v + (poss[i] - lo_k) * (hi_v - lo_v)


def float_clip_bounds(frames_f32, q_lo: float, q_hi: float):
    """Per-frame ``(lo, hi, fmin, fmax)`` for NaN-free float32 frames — the
    float sibling of :func:`int_clip_bounds`, keeping float movies fully
    fused on device (no host percentile pass, reference semantics
    unet/predict.py:122-150 extended to float dtypes).

    The same bitwise binary search runs on the order-isomorphic IEEE-754 bit
    image of the data (:func:`_f32_sortable`): 32 compare+sum sweeps find
    the exact floor/ceil order statistics as REAL data values, which are
    mapped back to float and interpolated with numpy's 'linear' rule.
    Exactness: selection is exact; only the final interpolation rounds to
    float32 (numpy interpolates in float64) — beneath the pipelines' uint8
    quantization.  NaNs would sort above +inf and silently corrupt the
    upper percentile, so callers must pre-screen them (Predict gates the
    fused path on a NaN-free host scan)."""
    n = frames_f32.shape[0]
    flat = frames_f32.reshape(n, -1).astype(jnp.float32)
    p = flat.shape[1]
    ks, poss = [], []
    for q in (q_lo, q_hi):
        pos = (p - 1) * (float(q) / 100.0)
        poss.append(pos)
        ks.extend((int(np.floor(pos)), int(np.ceil(pos))))
    stats_u = _order_stats_bitsearch(_f32_sortable(flat), ks, 32)
    stats = _f32_unsortable(stats_u)

    lo, hi = (_interp_stat(stats, ks, poss, i) for i in range(2))
    vmin = jnp.min(flat, axis=1)
    vmax = jnp.max(flat, axis=1)
    return lo, hi, jnp.maximum(vmin, lo), jnp.minimum(vmax, hi)


def u8_clip_bounds(frames_u8, q_lo: float, q_hi: float):
    """Everything the percentile-normalize stage needs from ONE histogram
    pass: per-frame ``(lo, hi, fmin, fmax)`` where lo/hi are the clip
    percentiles and fmin/fmax are the min/max AFTER clipping to [lo, hi]
    (clipping can only pull the extremes inward).

    NOTE: the fused predict paths now use :func:`int_clip_bounds` even for
    uint8 — the bitwise search measured 34% faster on v5e (40.5 vs 54.4 ms
    per 64 MP; ~34 compares/px vs 256) with bit-identical results.  This
    histogram form is kept as the reference implementation and for callers
    needing full ``u8_percentile`` order statistics."""
    n = frames_u8.shape[0]
    flat = frames_u8.reshape(n, -1)
    p = flat.shape[1]
    cum = jnp.cumsum(u8_counts(flat), axis=1)
    lo, hi = _interp_pct(cum, p, q_lo), _interp_pct(cum, p, q_hi)
    vmin = _order_stat(cum, 0)
    vmax = _order_stat(cum, p - 1)
    return lo, hi, jnp.maximum(vmin, lo), jnp.minimum(vmax, hi)
