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

__all__ = ["index_mesh", "row_sharding", "replicated", "distributed_init"]


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (DCN) for >1-pod-slice corpora (SURVEY §7.6).

    With no arguments, reads the standard JAX env vars / cluster plugin
    (``jax.distributed.initialize()`` auto-detection).  After this,
    ``jax.devices()`` spans all hosts and :func:`index_mesh` builds a global
    mesh, so the row-sharded index and cross-chip top-k merge
    (parallel/sharded.py) run unchanged over ICI+DCN.  Safe to call twice.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as error:
        if "already" in str(error).lower():
            return  # double-init is safe and expected
        if coordinator_address is None and num_processes is None and process_id is None:
            # Best-effort auto-detection (no explicit cluster requested):
            # degrade to single-host but SAY so.
            import warnings

            warnings.warn(
                f"jax.distributed auto-initialization skipped: {error}", stacklevel=2
            )
            return
        # An EXPLICITLY requested coordinator that fails must FAIL LOUDLY:
        # silently degrading to single-host would index/search a fraction
        # of the corpus with no error.
        raise
    except ValueError:
        if coordinator_address is None and num_processes is None and process_id is None:
            # Auto-detection found no cluster: single-host is a legitimate
            # configuration, not an error.
            return
        raise


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
