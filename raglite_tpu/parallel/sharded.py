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

__all__ = ["sharded_bm25_topk", "sharded_int4_two_stage", "sharded_topk_search"]


@partial(
    jax.jit,
    static_argnames=(
        "chunks_per_shard", "lcap", "num_hits", "mesh", "masked", "exact_topk"
    ),
)
def sharded_bm25_topk(
    offsets: jax.Array,  # [S, V+1] int32 per-shard CSR offsets, sharded "data"
    post_chunk: jax.Array,  # [S, Pp] int32 LOCAL chunk ordinals, sharded
    post_w: jax.Array,  # [S, Pp] fp32 precomputed Okapi weights, sharded
    mask: jax.Array,  # [S, Cp] bool per-shard chunk mask (or [S, 1] dummy)
    term_ids: jax.Array,  # [B, T] int32 query term ids (pad -1), replicated
    *,
    chunks_per_shard: int,
    lcap: int,
    num_hits: int,
    mesh: Mesh,
    masked: bool = False,
    exact_topk: bool = True,
) -> jax.Array:
    """Sharded keyword/BM25 search: postings partition by chunk ordinal
    range across the mesh's ``data`` axis, each shard scores its local
    postings with the resident BM25 program (ops/bm25.py), and only the
    [B, k] winners cross the ICI — the same merge shape as
    :func:`sharded_topk_search`.  Per-posting weights are computed from
    GLOBAL idf/avg_len at build, so the merged result equals the
    single-device program exactly.

    At the 10M-chunk north star this is what keeps postings HBM per chip
    flat: each of 8 shards holds ~1/8 of the postings (see PARITY.md).
    Replaces the reference's scale-out story of pointing keyword search at
    a Postgres server (/root/reference/src/raglite/_database.py:527-603).

    Returns packed [2, B, k]: fused scores; GLOBAL ordinals (bitcast int32,
    empty slots = S * chunks_per_shard) — one fetch, same contract as
    ``bm25_topk_resident``.
    """
    from raglite_tpu.ops.bm25 import bm25_topk_resident

    n_shards = mesh.shape["data"]
    total_pad = n_shards * chunks_per_shard

    def local(off_blk, pc_blk, pw_blk, m_blk, tids):
        packed = bm25_topk_resident(
            off_blk[0], pc_blk[0], pw_blk[0], m_blk[0], tids,
            num_chunks=chunks_per_shard, lcap=lcap, num_hits=num_hits,
            masked=masked, exact_topk=exact_topk,
        )
        scores = packed[0]  # [B, k]
        ords = jax.lax.bitcast_convert_type(packed[1], jnp.int32)
        shard = jax.lax.axis_index("data")
        valid = (ords < chunks_per_shard) & (scores > 0.0)
        g_ords = jnp.where(valid, ords + shard * chunks_per_shard, total_pad)
        scores = jnp.where(valid, scores, -1.0)
        # Cross-chip merge: only the [B, k] winners ride the ICI.
        s_all = jax.lax.all_gather(scores, "data", axis=0)  # [S, B, k]
        i_all = jax.lax.all_gather(g_ords, "data", axis=0)
        b = tids.shape[0]
        s_flat = jnp.swapaxes(s_all, 0, 1).reshape(b, -1)
        i_flat = jnp.swapaxes(i_all, 0, 1).reshape(b, -1)
        k_final = min(num_hits, s_flat.shape[1])
        s_best, pos = jax.lax.top_k(s_flat, k_final)
        i_best = jnp.take_along_axis(i_flat, pos, axis=1)
        i_best = jnp.where(s_best > 0.0, i_best, total_pad)
        return jnp.stack(
            [s_best, jax.lax.bitcast_convert_type(i_best, jnp.float32)]
        )

    specs = (P("data"), P("data"), P("data"), P("data"), P())
    try:
        mapped = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=P(), check_vma=False
        )
    except TypeError:  # older jax: the flag was called check_rep
        mapped = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=P(), check_rep=False
        )
    return mapped(offsets, post_chunk, post_w, mask, term_ids)


@partial(
    jax.jit,
    static_argnames=("num_hits", "candidates", "metric", "mesh", "num_buckets", "interpret"),
)
def sharded_int4_two_stage(
    packed: jax.Array,  # [Np, d//2] int4-packed rows, sharded over "data"
    scale4: jax.Array,  # [Np] fp32, sharded
    rows: jax.Array,  # [Np, d] full-precision rows (rescore), sharded
    row_scale: jax.Array | None,  # [Np] fp32 (int8 rows), sharded
    row_sqnorm: jax.Array,  # [Np] fp32 (l2), sharded
    valid: jax.Array,  # [Np] bool, sharded
    queries: jax.Array,  # [B, d] fp32, replicated (adapter pre-applied)
    *,
    num_hits: int,
    candidates: int,
    metric: str,
    mesh: Mesh,
    num_buckets: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Multi-chip version of the int4 two-stage latency path: every shard
    runs the int4 Pallas scan + exact rescore over ITS rows, and only each
    shard's [B, K] winners cross the ICI (the same merge shape as
    :func:`sharded_topk_search`).  Per-shard HBM traffic is half the int8
    scan's, so the single-chip p50 win carries to the sharded index.

    Requires shard row counts divisible by ``num_buckets`` (DenseIndex
    aligns capacity to ``INT4_NUM_BUCKETS * num_devices``).
    Returns (scores [B, K], GLOBAL row ids [B, K])."""
    from raglite_tpu.ops.fused_scan import int4_two_stage_block

    if row_scale is None:
        row_scale = jnp.ones((rows.shape[0],), jnp.float32)

    def local(packed_blk, scale4_blk, rows_blk, rscale_blk, sq_blk, valid_blk, q):
        sc, ridx_local = int4_two_stage_block(
            packed_blk, scale4_blk, rows_blk, rscale_blk, sq_blk, valid_blk, q,
            num_hits=num_hits, candidates=candidates, metric=metric,
            num_buckets=num_buckets, interpret=interpret,
        )
        shard = jax.lax.axis_index("data")
        ridx = ridx_local + shard * rows_blk.shape[0]
        # Cross-chip merge: only the [B, k] winners ride the ICI.
        s_all = jax.lax.all_gather(sc, "data", axis=0)
        i_all = jax.lax.all_gather(ridx, "data", axis=0)
        s_flat = jnp.swapaxes(s_all, 0, 1).reshape(q.shape[0], -1)
        i_flat = jnp.swapaxes(i_all, 0, 1).reshape(q.shape[0], -1)
        k_final = min(num_hits, s_flat.shape[1])
        s_best, bpos2 = jax.lax.top_k(s_flat, k_final)
        return s_best, jnp.take_along_axis(i_flat, bpos2, axis=1)

    specs = (P("data"), P("data"), P("data"), P("data"), P("data"), P("data"), P())
    try:
        mapped = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(P(), P()), check_vma=False
        )
    except TypeError:  # older jax: the flag was called check_rep
        mapped = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(P(), P()), check_rep=False
        )
    return mapped(packed, scale4, rows, row_scale, row_sqnorm, valid, queries)


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
