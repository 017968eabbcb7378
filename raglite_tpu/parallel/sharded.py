"""Sharded index search: per-shard top-k + cross-chip merge.

TPU-native replacement for the reference's "scale via a Postgres server"
story (SURVEY §2.3): the chunk-embedding matrix shards row-wise over the
mesh's ``data`` axis (ICI-connected), each device computes a fused distance
matmul + local top-k over its HBM shard, and only the [B, k] winners are
all-gathered and merged — the cross-chip top-k merge of BASELINE.json.
Per-query communication is O(devices * k * 8 bytes), independent of index
size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["sharded_topk_search"]


@partial(jax.jit, static_argnames=("num_hits", "metric", "mesh"))
def sharded_topk_search(
    rows: jax.Array,  # [N, d] sharded over "data" axis 0
    row_sqnorm: jax.Array,  # [N] sharded
    valid: jax.Array,  # [N] sharded
    queries: jax.Array,  # [B, d] replicated
    row_scale: jax.Array | None = None,  # [N] fp32 sharded (int8 dequant)
    *,
    num_hits: int,
    metric: str,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Global top-``num_hits`` rows per query across all shards.

    Returns (scores [B, K], global row ids [B, K]).
    """
    int8 = rows.dtype == jnp.int8
    if row_scale is None:
        row_scale = jnp.ones((rows.shape[0],), jnp.float32)

    def local_search(rows_blk, sq_blk, valid_blk, q, scale_blk):
        # Fused local distance matmul (MXU) + local top-k.
        if int8:
            q_abs = jnp.max(jnp.abs(q), axis=1)
            q_s = jnp.where(q_abs > 0, q_abs / 127.0, 1.0)
            q_i8 = jnp.clip(jnp.round(q / q_s[:, None]), -127, 127).astype(jnp.int8)
            sims = jnp.einsum("bd,nd->bn", q_i8, rows_blk, preferred_element_type=jnp.int32)
            sims = sims.astype(jnp.float32) * (q_s[:, None] * scale_blk[None, :])
        else:
            sims = jnp.einsum(
                "bd,nd->bn", q.astype(rows_blk.dtype), rows_blk,
                preferred_element_type=jnp.float32,
            )
        if metric == "l2":
            sims = 2.0 * sims - sq_blk[None, :]
        sims = jnp.where(valid_blk[None, :], sims, -jnp.inf)
        k = min(num_hits, sims.shape[1])
        if sims.shape[1] > 131_072:  # see index/dense.py EXACT_TOPK_MAX_ROWS
            s, i = jax.lax.approx_max_k(sims, k, recall_target=0.95)
        else:
            s, i = jax.lax.top_k(sims, k)
        # Translate local row indices to global ids.
        shard = jax.lax.axis_index("data")
        i_global = i + shard * rows_blk.shape[0]
        # Cross-chip merge: gather every shard's k winners (tiny), then a
        # final top-k over the concatenation.
        s_all = jax.lax.all_gather(s, "data", axis=0)  # [n_shards, B, k]
        i_all = jax.lax.all_gather(i_global, "data", axis=0)
        s_flat = jnp.swapaxes(s_all, 0, 1).reshape(q.shape[0], -1)  # [B, n*k]
        i_flat = jnp.swapaxes(i_all, 0, 1).reshape(q.shape[0], -1)
        k_final = min(num_hits, s_flat.shape[1])
        s_best, pos = jax.lax.top_k(s_flat, k_final)
        i_best = jnp.take_along_axis(i_flat, pos, axis=1)
        return s_best, i_best

    try:
        mapped = shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P("data")),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated by the all_gather merge
        )
    except TypeError:  # older jax: the flag was called check_rep
        mapped = shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P("data")),
            out_specs=(P(), P()),
            check_rep=False,
        )
    return mapped(rows, row_sqnorm, valid, queries, row_scale)
