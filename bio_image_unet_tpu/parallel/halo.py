"""Spatial (halo) sharding — context parallelism for convolutions.

For tiles too large for one chip's HBM, the image's H axis is sharded over
the mesh's ``spatial`` axis and each step exchanges ``halo`` boundary rows
with its neighbors via ``jax.lax.ppermute`` (rides ICI on hardware), so a
stack of convolutions computes exactly the same result as the unsharded op
as long as ``halo`` ≥ the half-receptive-field of the applied function.

This is the domain's analog of sequence/context parallelism (SURVEY.md §5
"long-context" row): the reference scales extent purely by host-side tiling
(unet/predict.py:152-182); here the same overlap idea runs *on device,
across devices*.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(x, halo: int, axis_name: str = "spatial", spatial_axis: int = 1):
    """Pad a locally-sharded block with ``halo`` rows from each mesh neighbor.

    ``x`` is the per-device block (N, H_local, ..., C); returns
    (N, H_local + 2·halo, ..., C).  Edge devices receive zero padding
    (conv 'SAME' zero-pad semantics at the global image border).
    Must run inside ``shard_map`` with ``axis_name`` bound.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top = lax.slice_in_dim(x, 0, halo, axis=spatial_axis)
    bottom = lax.slice_in_dim(x, x.shape[spatial_axis] - halo, x.shape[spatial_axis],
                              axis=spatial_axis)

    # neighbor i receives my bottom rows as its top halo and vice versa
    from_above = lax.ppermute(bottom, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = lax.ppermute(top, axis_name, [(i + 1, i) for i in range(n - 1)])

    zeros = jnp.zeros_like(top)
    top_halo = jnp.where(idx == 0, zeros, from_above)
    bottom_halo = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=spatial_axis)


def spatial_shard_apply(
    fn: Callable,
    x,
    mesh: Mesh,
    halo: int,
    spatial_axis: int = 1,
):
    """Apply ``fn`` (a shift-invariant conv stack, e.g. a jitted U-Net forward
    with zero-padding semantics) to ``x`` with its ``spatial_axis`` sharded
    over the mesh's ``spatial`` axis and halo exchange at shard boundaries.

    ``fn`` must be shape-preserving over the spatial axis (SAME padding) and
    have receptive-field half-width ≤ ``halo``.  The result is exactly
    ``crop(fn(zero_pad(x, halo)), halo)`` — i.e. ``fn`` evaluated on the image
    zero-padded by ``halo`` rows, cropped back (verified in
    tests/test_parallel.py).  Interior rows farther than ``halo`` from the
    global border are therefore bit-identical to ``fn(x)``; border rows see a
    zero frame instead of SAME-padding — the same border convention the
    reference's overlapping-tile predictor applies per tile
    (unet/predict.py:163-168 pads tiles rather than images).
    """
    n_spatial = mesh.shape["spatial"]
    h = x.shape[spatial_axis]
    if h % n_spatial != 0:
        raise ValueError(f"spatial extent {h} not divisible by mesh spatial size {n_spatial}")

    spec = [None] * x.ndim
    spec[spatial_axis] = "spatial"
    # on a 2-D (data × spatial) mesh, also shard the batch axis over `data`
    # when it divides: frames then split across data rows while each frame's
    # H splits across the spatial columns — combined DP + context
    # parallelism in one shard_map (halo ppermute stays within a data row)
    n_data = mesh.shape.get("data", 1)
    if (n_data > 1 and spatial_axis != 0 and x.shape[0] % n_data == 0):
        spec[0] = "data"
    in_spec = P(*spec)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=in_spec,
        check_vma=False,
    )
    def sharded(block):
        padded = halo_exchange(block, halo, "spatial", spatial_axis)
        out = fn(padded)
        return lax.slice_in_dim(
            out, halo, out.shape[spatial_axis] - halo, axis=spatial_axis
        )

    return sharded(x)
