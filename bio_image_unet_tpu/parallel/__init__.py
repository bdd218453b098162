"""Device-mesh & sharding runtime — the framework's communication backend.

The reference has no parallelism of any kind (single ``model.to(device)``,
no torch.distributed — see SURVEY.md §2.8); scaling on TPU pods is therefore
a new first-class subsystem of this framework, built the JAX way:

- :mod:`.mesh`  — mesh construction (1-D ``data`` axis default, optional
  ``(data, spatial)`` 2-D mesh), NamedSharding helpers, batch padding.
- :mod:`.halo`  — spatial sharding of oversized tiles with halo exchange via
  ``jax.lax.ppermute`` collectives (this conv workload's analog of context/
  sequence parallelism).

Everything runs identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) for tests and on real TPU slices,
where XLA lays the collectives onto ICI.
"""

from .halo import halo_exchange, spatial_shard_apply
from .mesh import (
    data_sharding,
    get_mesh,
    initialize_distributed,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "initialize_distributed",
    "data_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
    "halo_exchange",
    "spatial_shard_apply",
]
