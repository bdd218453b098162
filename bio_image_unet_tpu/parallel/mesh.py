"""Mesh construction and sharding helpers.

The TPU-native counterpart of DDP for this workload: batches (training
batches, inference patch batches) are sharded over a 1-D ``data`` mesh axis
and XLA inserts the ``psum``/``all_gather`` collectives over ICI when the
jitted step is annotated with these shardings.  An optional second ``spatial``
axis supports halo-sharded big tiles (see :mod:`.halo`).

No reference counterpart exists (SURVEY.md §2.8: the reference is strictly
single-device) — this subsystem is a new design obligation of the rebuild.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host (pod-slice) initialization: call once per host before any
    jax computation; afterwards ``jax.devices()`` spans the whole slice and
    :func:`get_mesh` builds slice-wide meshes (data-parallel gradients ride
    ICI within a slice, DCN across slices — XLA picks the transport from the
    mesh layout).  Thin wrapper over ``jax.distributed.initialize`` so user
    code has a single entry point for scaling out."""
    import jax

    jax.distributed.initialize(**kwargs)


def get_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh with axes ``('data', 'spatial')``.

    ``n_data=None`` uses all available devices (divided by ``n_spatial``).
    On a single-chip host this degenerates to a 1×1 mesh, so every code path
    (sharded train step, sharded predict) runs unchanged on one device.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    n = n_data * n_spatial
    if n <= 0:  # e.g. n_spatial > device count → n_data floor-divides to 0
        raise ValueError(
            f"mesh {n_data}x{n_spatial} is empty — n_spatial={n_spatial} "
            f"exceeds the {len(devices)} available device(s)"
        )
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (the batch) over ``data``; remaining axes replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of ``k`` that is ≥ ``n`` (≥ k even for n=0)."""
    return max(((n + k - 1) // k) * k, k)


def shard_batch(batch, mesh: Mesh):
    """Pad a host array's leading axis to a multiple of the ``data`` axis size
    (repeating the last element) and device_put with batch sharding.

    Returns ``(sharded_array, n)`` where the caller slices the first ``n``
    rows of any per-sample result.  Padding with a copy of a real sample keeps
    shapes static under jit without NaN-style poison values.
    """
    batch = np.asarray(batch)
    n = batch.shape[0]
    k = mesh.shape["data"]
    n_pad = pad_to_multiple(n, k)
    if n_pad != n:
        pad = np.broadcast_to(batch[-1:], (n_pad - n,) + batch.shape[1:])
        batch = np.concatenate([batch, pad], axis=0)
    arr = jax.device_put(batch, data_sharding(mesh, batch.ndim))
    return arr, n
