"""Worker script for the two-process multi-host (DCN) test.

Each process owns 4 virtual CPU devices; jax.distributed joins them into
one 8-device global mesh over loopback DCN.  The worker builds its LOCAL
shard of a row-sharded index with make_array_from_single_device_arrays,
runs the cross-shard top-k merge (parallel/sharded.py — the ICI/DCN
collective path), and process 0 writes the global result for the test to
compare against a single-process oracle.

Run (by tests/test_multihost.py):
    python tests/multihost_worker.py <process_id> <coordinator> <out.npz>
"""

import os
import sys

process_id = int(sys.argv[1])
coordinator = sys.argv[2]
out_path = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from raglite_tpu.parallel.mesh import distributed_init

distributed_init(coordinator_address=coordinator, num_processes=2, process_id=process_id)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raglite_tpu.parallel.sharded import sharded_topk_search

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

N, D, B, K = 1024, 32, 4, 8
mesh = Mesh(np.asarray(jax.devices()), ("data",))
row_shard = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

# Deterministic global data; each process materializes ONLY its local
# shards (the multi-host data-loading pattern: no host holds the matrix).
rng = np.random.default_rng(0)
rows_global = rng.normal(size=(N, D)).astype(np.float32)
queries = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

per_shard = N // 8
local_arrays = []
for device in mesh.local_devices:
    # Device order within the mesh defines which rows a device owns.
    shard_index = list(mesh.devices.ravel()).index(device)
    block = rows_global[shard_index * per_shard : (shard_index + 1) * per_shard]
    local_arrays.append(jax.device_put(jnp.asarray(block), device))
rows = jax.make_array_from_single_device_arrays((N, D), row_shard, local_arrays)
sqnorm = jax.device_put(jnp.zeros((N,), jnp.float32), NamedSharding(mesh, P("data")))
valid = jax.device_put(jnp.ones((N,), jnp.bool_), NamedSharding(mesh, P("data")))
queries = jax.device_put(queries, rep)

scores, ids = sharded_topk_search(
    rows, sqnorm, valid, queries, None, num_hits=K, metric="cosine", mesh=mesh
)
scores_host = np.asarray(jax.device_get(scores))
ids_host = np.asarray(jax.device_get(ids))

if process_id == 0:
    # Single-host oracle over the same global matrix.
    exact = rng_scores = rows_global @ np.asarray(queries).T  # [N, B]
    order = np.argsort(-exact, axis=0)[:K].T  # [B, K]
    np.savez(out_path, scores=scores_host, ids=ids_host, oracle_ids=order)
    print("WORKER0 OK", flush=True)
else:
    print("WORKER1 OK", flush=True)

jax.distributed.shutdown()
