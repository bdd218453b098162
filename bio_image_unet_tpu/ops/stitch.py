"""On-device patch stitching (scatter-accumulate).

The reference stitches on host with NaN stacks (unet/predict.py:204-229); the
host numpy rewrite lives in predict/tiling.py.  This module moves the
accumulation onto the TPU so the only device→host transfer is the stitched
frame itself (patch sets are overlap-inflated by up to (1+add_tile)² — on a
tunneled/PCIe-attached TPU the transfer is the predict path's main cost).

Kernel choice is MEASURED, not assumed: a Pallas scatter-accumulate kernel
(grid over patches, scalar-prefetch offsets, result plane resident in VMEM)
was built and A/B-timed at 0.14 s vs 0.06 s for the XLA
``dynamic_update_slice`` scan on 4×(1024² from 16×256²) on v5e — full-plane
VMEM read-modify-write loses to XLA's in-place DUS, so the scan is the
shipped implementation (benchmarks/NOTES.md).  Exact non-overlapping grids
skip accumulation entirely via transposes in the fused predict pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _starts_product(starts_per_axis: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    xs, ys = starts_per_axis
    gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
    return gx.ravel().astype(np.int32), gy.ravel().astype(np.int32)


def _stitch_xla(patches, x_starts, y_starts, out_h: int, out_w: int):
    n, th, tw, c = patches.shape

    def body(carry, inp):
        out, cnt = carry
        patch, x0, y0 = inp
        block = lax.dynamic_slice(out, (x0, y0, 0), (th, tw, c))
        out = lax.dynamic_update_slice(out, block + patch, (x0, y0, 0))
        cblock = lax.dynamic_slice(cnt, (x0, y0, 0), (th, tw, c))
        cnt = lax.dynamic_update_slice(cnt, cblock + 1.0, (x0, y0, 0))
        return (out, cnt), None

    init = (jnp.zeros((out_h, out_w, c), jnp.float32),
            jnp.zeros((out_h, out_w, c), jnp.float32))
    (out, cnt), _ = lax.scan(body, init, (patches, x_starts, y_starts))
    return out, cnt


@partial(jax.jit, static_argnames=("out_h", "out_w", "quantize_u8"))
def _stitch_device(patches, x_starts, y_starts, out_h: int, out_w: int,
                   quantize_u8: bool):
    patches = patches.astype(jnp.float32)
    out, cnt = _stitch_xla(patches, x_starts, y_starts, out_h, out_w)
    result = out / jnp.maximum(cnt, 1.0)
    if quantize_u8:
        result = result.astype(jnp.uint8)  # truncation ≙ unet/predict.py:223
    return result


@partial(jax.jit, static_argnames=("n_frames", "out_h", "out_w", "quantize_u8"))
def _stitch_frames_device(patches, x_starts, y_starts, n_frames: int,
                          out_h: int, out_w: int, quantize_u8: bool):
    per = patches.shape[0] // n_frames
    framed = patches.reshape((n_frames, per) + patches.shape[1:]).astype(jnp.float32)

    def one(frame_patches):
        out, cnt = _stitch_xla(frame_patches, x_starts, y_starts, out_h, out_w)
        return out / jnp.maximum(cnt, 1.0)

    result = jax.vmap(one)(framed)
    if quantize_u8:
        result = result.astype(jnp.uint8)
    return result


def stitch_mean_frames_device(patches, n_frames: int, starts_per_axis,
                              out_spatial: Tuple[int, int],
                              quantize_u8: bool = False):
    """Stitch a whole movie's patches in ONE device dispatch: ``patches`` is
    (n_frames·per, th, tw, C) in frame-major grid order; returns the
    (n_frames, H, W, C) stitched stack as a device array.  vmap over frames
    keeps dispatch count independent of movie length — per-frame dispatches
    each pay full round-trip latency on tunneled/remote TPUs."""
    xs, ys = _starts_product(starts_per_axis)
    return _stitch_frames_device(jnp.asarray(patches), jnp.asarray(xs),
                                 jnp.asarray(ys), n_frames,
                                 int(out_spatial[0]), int(out_spatial[1]),
                                 quantize_u8)


def _stitch_xla_3d(patches, z_starts, x_starts, y_starts,
                   out_d: int, out_h: int, out_w: int):
    n, td, th, tw, c = patches.shape

    def body(carry, inp):
        out, cnt = carry
        patch, z0, x0, y0 = inp
        block = lax.dynamic_slice(out, (z0, x0, y0, 0), (td, th, tw, c))
        out = lax.dynamic_update_slice(out, block + patch, (z0, x0, y0, 0))
        cblock = lax.dynamic_slice(cnt, (z0, x0, y0, 0), (td, th, tw, c))
        cnt = lax.dynamic_update_slice(cnt, cblock + 1.0, (z0, x0, y0, 0))
        return (out, cnt), None

    init = (jnp.zeros((out_d, out_h, out_w, c), jnp.float32),
            jnp.zeros((out_d, out_h, out_w, c), jnp.float32))
    (out, cnt), _ = lax.scan(body, init, (patches, z_starts, x_starts, y_starts))
    return out, cnt


@partial(jax.jit, static_argnames=("out_d", "out_h", "out_w", "quantize_u8"))
def _stitch_3d_jit(patches, zs, xs, ys, out_d, out_h, out_w, quantize_u8):
    out, cnt = _stitch_xla_3d(patches.astype(jnp.float32), zs, xs, ys,
                              out_d, out_h, out_w)
    result = out / jnp.maximum(cnt, 1.0)
    return result.astype(jnp.uint8) if quantize_u8 else result


def stitch_mean_device_3d(patches, starts_per_axis, out_spatial,
                          quantize_u8: bool = False):
    """Device-side mean-overlap stitch of a volume's 3D patches
    ((N, td, th, tw, C), grid z-major/x/y order).  One dispatch; only the
    stitched volume returns to the host."""
    zs_a, xs_a, ys_a = starts_per_axis
    gz, gx, gy = np.meshgrid(np.asarray(zs_a), np.asarray(xs_a), np.asarray(ys_a),
                             indexing="ij")
    return _stitch_3d_jit(jnp.asarray(patches),
                          jnp.asarray(gz.ravel().astype(np.int32)),
                          jnp.asarray(gx.ravel().astype(np.int32)),
                          jnp.asarray(gy.ravel().astype(np.int32)),
                          int(out_spatial[0]), int(out_spatial[1]),
                          int(out_spatial[2]), quantize_u8)


def _stitch_weighted_xla(patches, weights, starts, out_spatial):
    """Rank-generic weighted scatter-add: ``starts`` is (N, R) int32 for R
    spatial dims; returns (sum, weight-sum) planes of shape out_spatial+(C,)."""
    n = patches.shape[0]
    tile = patches.shape[1:-1]
    c = patches.shape[-1]
    r = len(tile)

    def body(carry, inp):
        out, wsum = carry
        patch, w, st = inp
        idx = tuple(st[i] for i in range(r)) + (0,)
        sizes = tile + (c,)
        block = lax.dynamic_slice(out, idx, sizes)
        out = lax.dynamic_update_slice(out, block + patch * w, idx)
        wblock = lax.dynamic_slice(wsum, idx, sizes)
        wsum = lax.dynamic_update_slice(wsum, wblock + w, idx)
        return (out, wsum), None

    init = (jnp.zeros(tuple(out_spatial) + (c,), jnp.float32),
            jnp.zeros(tuple(out_spatial) + (c,), jnp.float32))
    (out, wsum), _ = lax.scan(body, init, (patches, weights, starts))
    return out, wsum


def _stitch_factored_xla(patches, axis_factors, grid_idx, starts, out_spatial):
    """Weighted scatter-add where patch p's weight plane is the outer MIN of
    per-axis factor rows: ``w[p] = min_a axis_factors[a][grid_idx[p, a]]``.

    Both weight schemes used here factor this way — the 2D safe-margin mask
    (binary, multi_output_unet/predict.py:259-270) and the 3D linear blend
    ramp (tiling._blend_weights — the sane min-combined rewrite of
    multi_output_unet3d/predict.py:249-273, whose own loops clobber axes and
    never ramp the trailing edge; see _blend_weights' divergence note) —
    so the (N, *tile) weight stack (hundreds of MB for 3D grids of 256³
    tiles) is never materialized or transferred: each scan step rebuilds its
    patch's weights from O(n_a·t_a) factor tables."""
    r = len(out_spatial)
    tile = patches.shape[1:-1]
    c = patches.shape[-1]

    def body(carry, inp):
        out, wsum = carry
        patch, st, gi = inp
        w = None
        for a in range(r):
            fa = axis_factors[a][gi[a]]  # (t_a,)
            shape = [1] * (r + 1)
            shape[a] = tile[a]
            fa = fa.reshape(shape)
            w = fa if w is None else jnp.minimum(w, fa)
        idx = tuple(st[i] for i in range(r)) + (0,)
        sizes = tile + (c,)
        block = lax.dynamic_slice(out, idx, sizes)
        out = lax.dynamic_update_slice(out, block + patch * w, idx)
        wblock = lax.dynamic_slice(wsum, idx, sizes)
        wsum = lax.dynamic_update_slice(wsum, wblock + w, idx)
        return (out, wsum), None

    init = (jnp.zeros(tuple(out_spatial) + (c,), jnp.float32),
            jnp.zeros(tuple(out_spatial) + (c,), jnp.float32))
    (out, wsum), _ = lax.scan(body, init, (patches, starts, grid_idx))
    return out, wsum


@partial(jax.jit, static_argnames=("n_frames", "out_spatial", "fill_mean"))
def _stitch_weighted_frames(patches, weights, starts, n_frames: int,
                            out_spatial, fill_mean: bool):
    per = patches.shape[0] // n_frames
    framed = patches.reshape((n_frames, per) + patches.shape[1:]).astype(jnp.float32)
    fill = jnp.mean(patches.astype(jnp.float32)) if fill_mean else 0.0

    def one(frame_patches):
        out, wsum = _stitch_weighted_xla(frame_patches, weights, starts, out_spatial)
        return jnp.where(wsum > 0, out / jnp.maximum(wsum, 1e-12), fill)

    return jax.vmap(one)(framed)


def stitch_weighted_frames_device(patches, weights, starts_per_axis, n_frames: int,
                                  out_spatial, fill_mean: bool = False):
    """Device-side weighted stitch of frame-major patches (margin or blend
    weights — multi_output_unet/predict.py:234-285,
    multi_output_unet3d/predict.py:203-307).  ``weights`` is one grid's
    (per, *tile, 1) weight stack (shared across frames); uncovered pixels are
    filled with the global patch mean (2D margin semantics) or 0 (3D blend
    semantics)."""
    grids = np.meshgrid(*[np.asarray(s) for s in starts_per_axis], indexing="ij")
    starts = np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)
    return _stitch_weighted_frames(jnp.asarray(patches), jnp.asarray(weights),
                                   jnp.asarray(starts), n_frames,
                                   tuple(int(s) for s in out_spatial), fill_mean)


def stitch_mean_device(patches, starts_per_axis, out_spatial: Tuple[int, int],
                       quantize_u8: bool = False):
    """Device-side mean-overlap stitch of one frame's 2D patches.

    ``patches``: (N, th, tw, C) device or host array in grid order
    (x-major, matching ``predict.tiling.stitch_mean``).  Returns the
    (H, W, C) stitched frame as a device array (uint8 when ``quantize_u8`` —
    the reference's output quantization, minimizing device→host traffic).
    """
    out_h, out_w = int(out_spatial[0]), int(out_spatial[1])
    xs, ys = _starts_product(starts_per_axis)
    return _stitch_device(jnp.asarray(patches), jnp.asarray(xs), jnp.asarray(ys),
                          out_h, out_w, quantize_u8)
