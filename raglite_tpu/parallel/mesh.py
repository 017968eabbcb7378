"""Device mesh helpers.

The reference's only scale-out is a Postgres server (SURVEY §2.3); here
scale-out is a 1-D JAX device mesh: the index's row axis shards over the
``"data"`` axis and queries replicate, so the distance matmul runs fully
parallel and only the tiny per-shard top-k results cross ICI.
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["index_mesh", "row_sharding", "replicated"]


@lru_cache(maxsize=8)
def index_mesh(num_devices: int = 0) -> Mesh:
    """A 1-D mesh over the first ``num_devices`` local devices (0 = all)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(devices[:n], ("data",))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (index rows) across the mesh."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
