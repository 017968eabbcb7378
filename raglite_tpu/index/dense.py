"""HBM-resident dense vector index.

This is the TPU-native replacement for the reference's HNSW indexes
(DuckDB VSS `USING HNSW`, /root/reference/src/raglite/_database.py:638-643;
pgvector halfvec HNSW, _database.py:564-603).  Instead of a graph traversal
on the host, the index is the chunk-embedding matrix itself, resident in
device HBM:

- rows  [capacity, d]   sub-vector embeddings (bfloat16 by default)
- row_chunk [capacity]  row -> chunk ordinal (multi-vector grouping, host)
- valid [capacity]      tombstone mask (deletes flip bits; compaction
                        rebuilds — replaces `hnsw_compact_index`,
                        _insert.py:270)

Search is exact brute force: one fused (adapter-)matmul + masked top-k on
the MXU.  Exactness means recall@k == 1.0 by construction, versus HNSW's
approximate recall; throughput comes from the hardware (a 10M x 1024 bf16
scan is ~20 GB of HBM traffic, well under 1 ms/query batched).

Mutation model: the canonical copy is a host-side mirror (preallocated,
power-of-two growth); device arrays are refreshed as a single bulk upload
when the mirror changes.  This keeps inserts O(rows) with no per-chunk
device dispatches.  The multi-device variant shards the row axis over the
mesh (parallel/sharded.py).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from raglite_tpu.utils.padding import round_up as _round_up

from raglite_tpu.types import DistanceMetric

if TYPE_CHECKING:
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.store import Store

_LANE = 128  # last-dim tile; row counts padded to this multiple



#: Index sizes up to this use exact top-k; above it, the TPU-accelerated
#: ``approx_max_k`` (recall_target 0.95 per sub-vector hit; with the 4x
#: oversample + multi-vector group-max, measured chunk-level recall@10 is
#: ~0.997 — above HNSW at ef_search=160, the reference's setting).
EXACT_TOPK_MAX_ROWS = 131_072


@partial(jax.jit, static_argnames=("num_hits", "metric", "exact"))
def _dense_search(
    rows: jax.Array,  # [N, d] storage dtype (int8 => row_scale required)
    row_sqnorm: jax.Array,  # [N] fp32 (for l2)
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, d] fp32
    row_scale: jax.Array | None = None,  # [N] fp32 dequant scale (int8 rows)
    *,
    num_hits: int,
    metric: str,
    exact: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fused distance matmul + masked top-k (replaces the reference's
    HNSW traversal + SQL ORDER BY, _search.py:65-141)."""
    if rows.dtype == jnp.int8:
        q_abs = jnp.max(jnp.abs(queries), axis=1)
        q_s = jnp.where(q_abs > 0, q_abs / 127.0, 1.0)
        q_i8 = jnp.clip(jnp.round(queries / q_s[:, None]), -127, 127).astype(jnp.int8)
        sims = jnp.einsum("bd,nd->bn", q_i8, rows, preferred_element_type=jnp.int32)
        sims = sims.astype(jnp.float32) * (q_s[:, None] * row_scale[None, :])
    else:
        q = queries.astype(rows.dtype)
        # [B, N] similarity on the MXU with fp32 accumulation.
        sims = jnp.einsum("bd,nd->bn", q, rows, preferred_element_type=jnp.float32)
    if metric == "l2":
        # Monotone in -||r - q||^2 (query norm is constant per query).
        sims = 2.0 * sims - row_sqnorm[None, :]
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    if exact:
        return jax.lax.top_k(sims, num_hits)  # (scores [B,K], row ids [B,K])
    return jax.lax.approx_max_k(sims, num_hits, recall_target=0.95)


@partial(
    jax.jit, static_argnames=("num_hits", "num_results", "metric", "exact", "bitcast")
)
def _dense_search_chunks_fused(
    rows: jax.Array,
    row_sqnorm: jax.Array,
    valid: jax.Array,
    row_chunk: jax.Array,
    queries: jax.Array,  # [B, d] fp32
    row_scale: jax.Array | None = None,
    adapter: jax.Array | None = None,  # [d, d] query adapter
    *,
    num_hits: int,
    num_results: int,
    metric: str,
    exact: bool,
    bitcast: bool = False,
) -> jax.Array:
    """Single-program latency path: adapter matmul + scan + group-max +
    final ranking in one XLA executable, so a B=1 query costs ONE dispatch
    instead of three (each dispatch is a host->device round-trip on serving
    hosts).  Used for small batches only: at large batch the two-program
    split measured 4x faster (100k vs 26k QPS @B=1024 on v5e — XLA
    schedules the monolith worse there)."""
    if adapter is not None:
        queries = queries @ adapter.T
    scores, idx = _dense_search(
        rows, row_sqnorm, valid, queries, row_scale,
        num_hits=num_hits, metric=metric, exact=exact,
    )
    group = _group_max_topk_bitcast if bitcast else _group_max_topk
    return group(scores, idx, row_chunk, num_results=num_results)


@partial(jax.jit, static_argnames=("num_results",))
def _group_max_topk(
    scores: jax.Array,  # [B, K] descending sub-vector scores
    row_ids: jax.Array,  # [B, K]
    row_chunk: jax.Array,  # [capacity] row -> chunk ordinal (-1 for padding)
    *,
    num_results: int,
) -> jax.Array:
    """On-device multi-vector L-inf aggregation + final chunk ranking.

    Replaces the reference's ``GROUP BY chunk_id, MAX(sim)`` SQL aggregation
    (_search.py:143-152) — and round 1's host-side Python dict loop, which
    cost ~40k dict ops per 1024-batch.  ``scores`` arrive sorted descending
    from top-k, so a chunk's first occurrence carries its max; later
    occurrences are masked with an O(K^2) pairwise comparison (K <= ~160,
    so the [B, K, K] bool intermediate is tiny).

    Returns one packed [2, B, num_results] array (scores; chunk ordinals as
    float32) — a single device->host transfer.
    """
    k = scores.shape[1]
    chunks = row_chunk[row_ids]  # [B, K]
    same = chunks[:, None, :] == chunks[:, :, None]  # [B, K, K]
    tri = jnp.tril(jnp.ones((k, k), bool), k=-1)
    is_repeat = jnp.any(same & tri[None], axis=-1)
    chunk_scores = jnp.where(is_repeat, -jnp.inf, scores)
    final_scores, pos = jax.lax.top_k(chunk_scores, min(num_results, k))
    final_chunks = jnp.take_along_axis(chunks, pos, axis=1)
    # Empty slots (repeat-masked or invalid rows) carry -inf scores; pin
    # their ordinal to -1 so consumers can filter on EITHER field (the
    # documented contract — previously only repeat slots kept a real-looking
    # ordinal).
    final_chunks = jnp.where(jnp.isneginf(final_scores), -1, final_chunks)
    return jnp.stack([final_scores, final_chunks.astype(jnp.float32)])


@partial(
    jax.jit,
    static_argnames=(
        "num_hits", "num_results", "candidates", "metric", "bitcast", "num_buckets", "interpret",
    ),
)
def _int4_two_stage_chunks(
    packed: jax.Array,  # [Np, d//2] int4-packed rows
    scale4: jax.Array,  # [Np] fp32 dequant scale of the nibbles
    rows: jax.Array,  # [Np, d] full-precision rows (int8 or float) for rescore
    row_scale: jax.Array | None,  # [Np] fp32 (int8 rows)
    row_sqnorm: jax.Array,  # [Np] fp32 (l2 metric)
    valid: jax.Array,  # [Np] bool (tombstones AND metadata row mask)
    row_chunk: jax.Array,  # [Np] int32 row -> chunk ordinal
    queries: jax.Array,  # [B, d] fp32
    adapter: jax.Array | None = None,
    *,
    num_hits: int,
    num_results: int,
    candidates: int,
    metric: str,
    bitcast: bool = False,
    num_buckets: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Two-stage latency path as ONE XLA program: int4 Pallas scan over the
    packed copy (half the HBM traffic of the int8 scan) -> top-``candidates``
    -> gather full rows -> exact rescore -> multi-vector group-max.

    Measured on v5e @ 1.25M x 1024: p50 1.23 ms vs 1.87 ms single-stage,
    chunk recall@10 0.994 vs exact even on i.i.d. random vectors (the
    adversarial zero-margin case; real embeddings have larger margins).
    """
    from raglite_tpu.ops.fused_scan import int4_two_stage_block

    if adapter is not None:
        queries = queries @ adapter.T
    sc, ridx = int4_two_stage_block(
        packed, scale4, rows, row_scale, row_sqnorm, valid, queries,
        num_hits=num_hits, candidates=candidates, metric=metric,
        num_buckets=num_buckets, interpret=interpret,
    )
    group = _group_max_topk_bitcast if bitcast else _group_max_topk
    return group(sc, ridx, row_chunk, num_results=num_results)


#: Ordinals above this are not exactly representable in float32; the packed
#: result switches to a bitcast encoding (ORDINAL_BITCAST_THRESHOLD rows is
#: ~16.7M — above the 10M-chunk/shard design point, so the common path keeps
#: its cached executable).
ORDINAL_BITCAST_THRESHOLD = 1 << 24


@partial(jax.jit, static_argnames=("num_results",))
def _group_max_topk_bitcast(
    scores: jax.Array,
    row_ids: jax.Array,
    row_chunk: jax.Array,
    *,
    num_results: int,
) -> jax.Array:
    """:func:`_group_max_topk` with ordinals bitcast into the float32 packed
    array — exact for ALL int32 ordinals (a float32 cast silently corrupts
    ordinals >= 2^24; used automatically for >16.7M-row indexes)."""
    k = scores.shape[1]
    chunks = row_chunk[row_ids]
    same = chunks[:, None, :] == chunks[:, :, None]
    tri = jnp.tril(jnp.ones((k, k), bool), k=-1)
    is_repeat = jnp.any(same & tri[None], axis=-1)
    chunk_scores = jnp.where(is_repeat, -jnp.inf, scores)
    final_scores, pos = jax.lax.top_k(chunk_scores, min(num_results, k))
    final_chunks = jnp.take_along_axis(chunks, pos, axis=1)
    final_chunks = jnp.where(jnp.isneginf(final_scores), -1, final_chunks)  # empty slots
    return jnp.stack(
        [final_scores, jax.lax.bitcast_convert_type(final_chunks.astype(jnp.int32), jnp.float32)]
    )


class DenseIndex:
    """Host-mirrored, device-resident dense index synced from a Store."""

    def __init__(
        self,
        *,
        dim: int,
        dtype: str = "bfloat16",
        metric: DistanceMetric = "cosine",
        num_devices: int = 1,
        use_pallas: bool = True,
        use_int4_stage1: bool = True,
    ) -> None:
        self.dim = dim
        self.metric: DistanceMetric = metric
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.dtype(dtype)
        self.use_pallas = use_pallas
        self.use_int4_stage1 = use_int4_stage1
        import jax as _jax

        self.num_devices = num_devices if num_devices > 0 else len(_jax.devices())
        self.num_rows = 0
        self.capacity = 0
        # Host mirror (canonical).
        self._host_rows = np.zeros((0, dim), dtype=np.float16)
        self._host_valid = np.zeros((0,), dtype=np.bool_)
        self.row_chunk = np.zeros((0,), dtype=np.int64)  # row -> chunk ordinal
        self.chunk_ids: list[str] = []
        # Device copies (refreshed on _dirty).
        self._dev_rows: jax.Array | None = None
        self._dev_sqnorm: jax.Array | None = None
        self._dev_valid: jax.Array | None = None
        self._dev_scale: jax.Array | None = None  # int8 dequant scales
        self._dev_row_chunk: jax.Array | None = None  # row -> chunk ordinal
        self._dev_packed4: jax.Array | None = None  # int4-packed stage-1 copy
        self._dev_scale4: jax.Array | None = None
        self._dirty = True  # full re-upload required (capacity/valid changed)
        self._dev_rows_synced = 0  # rows already on device (append watermark)
        self._synced_version = -1
        import threading

        #: Serializes sync() against concurrent server threads — two
        #: searches after an insert would otherwise both read the same
        #: watermark and double-append the new chunks.
        self._sync_lock = threading.Lock()

    # --- Build / mutate (host mirror) ------------------------------------

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        self._dirty = True  # reallocation invalidates the device arrays
        # Capacity is a multiple of devices x the LARGEST Pallas bucket
        # count (int4 stage-1 uses 4096) so the row axis shards evenly over
        # the mesh AND no kernel path ever pads (a per-query jnp.pad would
        # copy the whole matrix: ~1.3 GB at the design point).  Wastes at
        # most 4095 rows (~4 MB at d=1024 int8).
        from raglite_tpu.ops.fused_scan import INT4_NUM_BUCKETS

        new_cap = _round_up(
            max(needed, 2 * max(self.capacity, 1)), INT4_NUM_BUCKETS * self.num_devices
        )
        rows = np.zeros((new_cap, self.dim), dtype=np.float16)
        rows[: self.num_rows] = self._host_rows[: self.num_rows]
        valid = np.zeros((new_cap,), dtype=np.bool_)
        valid[: self.num_rows] = self._host_valid[: self.num_rows]
        self._host_rows, self._host_valid = rows, valid
        self.capacity = new_cap

    def append_chunks(self, matrices: list[np.ndarray], chunk_ids: list[str]) -> None:
        """Append all sub-vector rows of a batch of chunks in one shot."""
        if not matrices:
            return
        counts = [m.shape[0] for m in matrices]
        total = int(sum(counts))
        base_ord = len(self.chunk_ids)
        self.chunk_ids.extend(chunk_ids)
        self._ensure_capacity(self.num_rows + total)
        stacked = np.concatenate([m.astype(np.float16) for m in matrices], axis=0)
        self._host_rows[self.num_rows : self.num_rows + total] = stacked
        self._host_valid[self.num_rows : self.num_rows + total] = True
        new_row_chunk = np.repeat(base_ord + np.arange(len(counts), dtype=np.int64), counts)
        self.row_chunk = np.concatenate([self.row_chunk, new_row_chunk])
        self.num_rows += total
        # Appends within existing capacity upload incrementally (the
        # _ensure_capacity call above sets _dirty when reallocating).

    def rebuild(self, store: "Store") -> None:
        self.chunk_ids = []
        self.num_rows = self.capacity = 0
        self._host_rows = np.zeros((0, self.dim), dtype=np.float16)
        self._host_valid = np.zeros((0,), dtype=np.bool_)
        self.row_chunk = np.zeros((0,), dtype=np.int64)
        self.append_chunks(
            [store.embeddings[cid] for cid in store.chunk_order], list(store.chunk_order)
        )
        self._apply_tombstones(store)
        self._dirty = True
        self._synced_version = store.version
        self._synced_generation = store.generation

    def _apply_tombstones(self, store: "Store") -> None:
        """Flip the valid bit of every row of a tombstoned chunk — deletes
        are an O(1)-per-row mask update on device, never a rebuild
        (replacing the reference's delete + hnsw_compact_index,
        _delete.py:130-178)."""
        if not store.deleted_chunks:
            self._synced_deleted = 0
            return
        chunk_alive = np.ones(len(self.chunk_ids), dtype=np.bool_)
        deleted = store.deleted_chunks
        for ordinal, cid in enumerate(self.chunk_ids):
            if cid in deleted:
                chunk_alive[ordinal] = False
        new_valid = chunk_alive[self.row_chunk]
        if not np.array_equal(new_valid, self._host_valid[: self.num_rows]):
            self._host_valid[: self.num_rows] = new_valid
            self._valid_dirty = True
        self._synced_deleted = len(deleted)

    def sync(self, store: "Store") -> None:
        """Incremental append when the store only grew; tombstone-mask
        update on deletes; full rebuild only after a compaction (store
        generation bump) or an unrecognized log.  Thread-safe: concurrent
        server requests serialize here."""
        if (
            self._synced_version == store.version
            and getattr(self, "_synced_generation", 0) == store.generation
        ):
            return
        with self._sync_lock:
            self._sync_locked(store)

    def _sync_locked(self, store: "Store") -> None:
        if (
            self._synced_version == store.version
            and getattr(self, "_synced_generation", 0) == store.generation
        ):
            return  # another thread synced while we waited on the lock
        n_known = len(self.chunk_ids)
        if (
            getattr(self, "_synced_generation", 0) == store.generation
            and len(store.chunk_order) >= n_known
            and store.chunk_order[:n_known] == self.chunk_ids
        ):
            new_ids = store.chunk_order[n_known:]
            if new_ids:
                self.append_chunks([store.embeddings[cid] for cid in new_ids], new_ids)
            if len(store.deleted_chunks) != getattr(self, "_synced_deleted", 0):
                self._apply_tombstones(store)
        else:
            self.rebuild(store)
        self._synced_version = store.version
        self._synced_generation = store.generation

    def _refresh_device(self) -> None:
        if self._dev_rows is not None and not self._dirty:
            if self._dev_rows_synced != self.num_rows:
                self._append_to_device()
            if self._dev_rows_synced == self.num_rows:
                if getattr(self, "_valid_dirty", False):
                    self._upload_valid()
                return
        self._full_upload()
        self._valid_dirty = False

    def _upload_valid(self) -> None:
        """Re-ship only the tombstone mask (1 bit/row): deletes never
        re-upload the row matrix."""
        valid_host = np.zeros((self.capacity,), dtype=np.bool_)
        valid_host[: self.num_rows] = self._host_valid[: self.num_rows]
        if self.num_devices > 1:
            from raglite_tpu.parallel.mesh import index_mesh

            mesh = index_mesh(self.num_devices)
            one_d = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
            self._dev_valid = jax.device_put(jnp.asarray(valid_host), one_d)
        else:
            self._dev_valid = jnp.asarray(valid_host)
        self._valid_dirty = False

    def _append_to_device(self) -> None:
        """Upload only rows appended since the last sync: O(new rows)
        transfer + a device-side dynamic_update_slice, instead of
        re-uploading the whole matrix on every insert batch.  This also
        holds for a sharded index: XLA routes the update region to the
        owning shards and the result keeps the row sharding (round 1
        re-shipped the ENTIRE matrix on every multi-device insert)."""
        start, end = self._dev_rows_synced, self.num_rows
        new32 = self._host_rows[start:end].astype(np.float32)
        if self._dtype == jnp.int8:
            from raglite_tpu.ops.fused_scan import quantize_rows_int8

            new_rows, new_scale = quantize_rows_int8(new32)
            deq = new_rows.astype(np.float32) * new_scale[:, None]
            new_sqnorm = (deq**2).sum(axis=1).astype(np.float32)
            self._dev_scale = jax.lax.dynamic_update_slice(
                self._dev_scale, jnp.asarray(new_scale), (start,)
            )
        else:
            new_rows = new32
            new_sqnorm = (new32**2).sum(axis=1).astype(np.float32)
        self._dev_rows = jax.lax.dynamic_update_slice(
            self._dev_rows, jnp.asarray(new_rows, dtype=self._dtype), (start, 0)
        )
        self._dev_sqnorm = jax.lax.dynamic_update_slice(
            self._dev_sqnorm, jnp.asarray(new_sqnorm), (start,)
        )
        self._dev_valid = jax.lax.dynamic_update_slice(
            self._dev_valid, jnp.asarray(self._host_valid[start:end]), (start,)
        )
        self._dev_row_chunk = jax.lax.dynamic_update_slice(
            self._dev_row_chunk,
            jnp.asarray(self.row_chunk[start:end], dtype=jnp.int32),
            (start,),
        )
        self._dev_rows_synced = end
        self._dev_packed4 = None  # stage-1 copy is stale; rebuilt lazily

    def _full_upload(self) -> None:
        host32 = self._host_rows.astype(np.float32)
        if self._dtype == jnp.int8:
            from raglite_tpu.ops.fused_scan import quantize_rows_int8

            rows_host, scale_host = quantize_rows_int8(host32)
            deq = rows_host.astype(np.float32) * scale_host[:, None]
            sqnorm_host = (deq**2).sum(axis=1).astype(np.float32)
        else:
            rows_host, scale_host = host32, None
            sqnorm_host = (host32**2).sum(axis=1).astype(np.float32)
        # Row -> chunk ordinal, padded to capacity with -1 (the on-device
        # group-max filters non-finite scores, so padding never surfaces).
        row_chunk_host = np.full((self.capacity,), -1, dtype=np.int32)
        row_chunk_host[: len(self.row_chunk)] = self.row_chunk
        if self.num_devices > 1:
            from raglite_tpu.parallel.mesh import index_mesh, row_sharding

            mesh = index_mesh(self.num_devices)
            shard = row_sharding(mesh)
            one_d = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
            replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            self._dev_rows = jax.device_put(
                jnp.asarray(rows_host, dtype=self._dtype), shard
            )
            self._dev_sqnorm = jax.device_put(jnp.asarray(sqnorm_host), one_d)
            self._dev_valid = jax.device_put(jnp.asarray(self._host_valid), one_d)
            self._dev_scale = (
                jax.device_put(jnp.asarray(scale_host), one_d)
                if scale_host is not None
                else None
            )
            self._dev_row_chunk = jax.device_put(jnp.asarray(row_chunk_host), replicated)
        else:
            self._dev_rows = jnp.asarray(rows_host, dtype=self._dtype)
            self._dev_sqnorm = jnp.asarray(sqnorm_host)
            self._dev_valid = jnp.asarray(self._host_valid)
            self._dev_scale = jnp.asarray(scale_host) if scale_host is not None else None
            self._dev_row_chunk = jnp.asarray(row_chunk_host)
        self._dirty = False
        self._dev_rows_synced = self.num_rows
        self._dev_packed4 = None  # stage-1 copy is stale; rebuilt lazily

    # --- Search -----------------------------------------------------------

    def _adapter_device(self, adapter: np.ndarray | None) -> jax.Array | None:
        """Cached device copy of the query adapter (re-uploaded only when the
        store's adapter object changes — BASELINE: the adapter is applied as
        an HBM matmul on device, not a host matmul).  The cache keeps a
        reference to the host array and compares with ``is`` — an ``id()``
        key could collide when a freed array's address is recycled."""
        if adapter is None:
            return None
        if isinstance(adapter, jax.Array):
            return adapter
        if getattr(self, "_adapter_host", None) is not adapter:
            self._adapter_host = adapter
            self._adapter_dev = jnp.asarray(np.asarray(adapter, dtype=np.float32))
        return self._adapter_dev

    def device_row_mask(self, row_mask: np.ndarray | jax.Array | None) -> jax.Array | None:
        """Capacity-padded device copy of a row filter mask, cached by
        content digest (up to 4 entries).  Metadata filtering ANDs this into
        the valid-bit mask inside the scan; the HOST mask itself is rebuilt
        per query by the search layer, but within a session the same filter
        yields byte-identical masks — re-uploading ~N bools per call is pure
        host->device waste (measured: a fresh 1.25 MB device_put per filtered
        call costs one blocking RPC and capped the filtered scan at ~9k QPS
        through the dev tunnel vs ~90k unfiltered).  A ``jax.Array`` passes
        through untouched (callers managing residency themselves)."""
        if row_mask is None:
            return None
        if isinstance(row_mask, jax.Array):
            return row_mask
        import hashlib

        mask_np = np.asarray(row_mask, dtype=np.bool_)
        digest = hashlib.blake2b(mask_np.tobytes(), digest_size=16).digest()
        key = (digest, len(mask_np), self.capacity)
        cache: dict = getattr(self, "_row_mask_cache", None) or {}
        hit = cache.get(key)
        if hit is not None:
            return hit
        padded = np.zeros((self.capacity,), dtype=np.bool_)
        padded[: len(mask_np)] = mask_np
        dev = jnp.asarray(padded)
        if len(cache) >= 4:
            cache.pop(next(iter(cache)))
        cache[key] = dev
        self._row_mask_cache = cache
        return dev

    def search(
        self,
        queries: np.ndarray,  # [B, d] fp32 (normalized upstream for cosine)
        *,
        num_hits: int,
        row_mask: np.ndarray | None = None,
        adapter: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top ``num_hits`` sub-vector rows per query.

        Returns (scores [B, K], row_ids [B, K]); masked rows score -inf.
        ``row_mask`` pre-filters rows (metadata filtering as a bitset AND,
        replacing the reference's filter-then-rank SQL plan,
        _search.py:96-141 — on a brute-force scan, pre-filtering is always
        at least as fast, so the 100k crossover heuristic collapses).
        ``adapter`` is the trained query adapter, applied as a device matmul
        before the scan (reference: _search.py:58-62 does it in numpy).
        """
        if self.num_rows == 0:
            b = queries.shape[0]
            return (np.full((b, num_hits), -np.inf), np.zeros((b, num_hits), dtype=np.int64))
        scores, idx = self._scan_device(
            queries, num_hits=num_hits, row_mask=row_mask, adapter=adapter
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx, dtype=np.int64)
        if scores.shape[1] < num_hits:  # pad to requested width
            pad = num_hits - scores.shape[1]
            scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, pad)))
        return scores, idx

    def _scan_device(
        self,
        queries: np.ndarray,
        *,
        num_hits: int,
        row_mask: np.ndarray | None,
        adapter: np.ndarray | None,
        exact: bool | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Fused scan returning DEVICE arrays (scores [B,K], row ids [B,K])
        so downstream aggregation can stay on device."""
        self._refresh_device()
        queries_dev = jnp.asarray(queries, dtype=jnp.float32)
        adapter_dev = self._adapter_device(adapter)
        if adapter_dev is not None:
            queries_dev = queries_dev @ adapter_dev.T
        valid = self._dev_valid
        if row_mask is not None:
            valid = jnp.logical_and(valid, self.device_row_mask(row_mask))
        k = min(num_hits, self.capacity)
        if self.num_devices > 1:
            from raglite_tpu.parallel.mesh import index_mesh
            from raglite_tpu.parallel.sharded import sharded_topk_search

            mesh = index_mesh(self.num_devices)
            k_local = min(k, self.capacity // self.num_devices)
            return sharded_topk_search(
                self._dev_rows,
                self._dev_sqnorm,
                valid,
                queries_dev,
                self._dev_scale,
                num_hits=max(k_local, 1),
                metric=self.metric,
                mesh=mesh,
            )
        if exact is None:
            exact = self.num_rows <= EXACT_TOPK_MAX_ROWS
        if not exact and self._use_fused_kernel(queries.shape[0]):
            from raglite_tpu.ops.fused_scan import fused_scan_topk

            return fused_scan_topk(
                self._dev_rows,
                self._dev_sqnorm,
                valid,
                queries_dev,
                num_hits=k,
                metric=self.metric,
                row_scale=self._dev_scale,
                batch_tile=8,
            )
        return _dense_search(
            self._dev_rows,
            self._dev_sqnorm,
            valid,
            queries_dev,
            self._dev_scale,
            num_hits=k,
            metric=self.metric,
            exact=exact,
        )

    def search_chunks(
        self,
        queries: np.ndarray,  # [B, d] fp32
        *,
        num_hits: int,
        num_results: int,
        row_mask: np.ndarray | None = None,
        adapter: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top ``num_results`` CHUNKS per query: fused scan + on-device
        multi-vector group-max + final ranking, one host fetch.

        Returns (chunk_scores [B, R] fp32, chunk_ordinals [B, R] int64);
        slots past the last real hit have score -inf and ordinal -1.  This
        is the full reference vector_search SQL plan (_search.py:65-152) as
        one device pipeline — the production path `vector_search_batch`
        ships AND the path bench.py measures.
        """
        b = queries.shape[0]
        if self.num_rows == 0:
            return (
                np.full((b, num_results), -np.inf, dtype=np.float32),
                np.full((b, num_results), -1, dtype=np.int64),
            )
        packed = np.asarray(
            self.search_chunks_device(
                queries,
                num_hits=num_hits,
                num_results=num_results,
                row_mask=row_mask,
                adapter=adapter,
            )
        )
        chunk_scores = packed[0]
        if self.num_rows > ORDINAL_BITCAST_THRESHOLD:
            chunk_ordinals = np.ascontiguousarray(packed[1]).view(np.int32).astype(np.int64)
        else:
            chunk_ordinals = packed[1].astype(np.int64)
        chunk_ordinals[~np.isfinite(chunk_scores)] = -1
        if chunk_scores.shape[1] < num_results:
            pad = num_results - chunk_scores.shape[1]
            chunk_scores = np.pad(chunk_scores, ((0, 0), (0, pad)), constant_values=-np.inf)
            chunk_ordinals = np.pad(chunk_ordinals, ((0, 0), (0, pad)), constant_values=-1)
        return chunk_scores, chunk_ordinals

    def search_chunks_device(
        self,
        queries: np.ndarray | jax.Array,
        *,
        num_hits: int,
        num_results: int,
        row_mask: np.ndarray | None = None,
        adapter: np.ndarray | None = None,
        exact: bool | None = None,
    ) -> jax.Array:
        """Device half of :meth:`search_chunks`: returns the packed
        [2, B, num_results] result WITHOUT fetching to the host, so servers
        (and bench.py) can pipeline batches with the transfer overlapped.

        Small batches route through ONE fused XLA program (dispatch-count =
        1 on the latency path); large batches keep the two-program split,
        which XLA schedules 4x faster at B=1024 on v5e.
        """
        batch = queries.shape[0]
        if exact is None:
            exact_resolved = self.num_rows <= EXACT_TOPK_MAX_ROWS
        else:
            exact_resolved = exact
        bitcast = self.num_rows > ORDINAL_BITCAST_THRESHOLD
        if self._use_int4_stage1(batch, exact_resolved):
            from raglite_tpu.ops.fused_scan import INT4_NUM_BUCKETS, INT4_STAGE1_CANDIDATES

            self._refresh_device()
            self._ensure_packed4()
            valid = self._dev_valid
            if row_mask is not None:
                valid = jnp.logical_and(valid, self.device_row_mask(row_mask))
            if self.num_devices > 1:
                from raglite_tpu.parallel.mesh import index_mesh
                from raglite_tpu.parallel.sharded import sharded_int4_two_stage

                queries_dev = jnp.asarray(queries, dtype=jnp.float32)
                adapter_dev = self._adapter_device(adapter)
                if adapter_dev is not None:
                    queries_dev = queries_dev @ adapter_dev.T
                scores, idx = sharded_int4_two_stage(
                    self._dev_packed4,
                    self._dev_scale4,
                    self._dev_rows,
                    self._dev_scale,
                    self._dev_sqnorm,
                    valid,
                    queries_dev,
                    num_hits=min(num_hits, self.capacity),
                    candidates=max(
                        INT4_STAGE1_CANDIDATES, 2 * min(num_hits, self.capacity)
                    ),
                    metric=self.metric,
                    mesh=index_mesh(self.num_devices),
                    num_buckets=INT4_NUM_BUCKETS,
                )
                group = _group_max_topk_bitcast if bitcast else _group_max_topk
                return group(scores, idx, self._dev_row_chunk, num_results=num_results)
            return _int4_two_stage_chunks(
                self._dev_packed4,
                self._dev_scale4,
                self._dev_rows,
                self._dev_scale,
                self._dev_sqnorm,
                valid,
                self._dev_row_chunk,
                jnp.asarray(queries, dtype=jnp.float32),
                self._adapter_device(adapter),
                num_hits=min(num_hits, self.capacity),
                num_results=num_results,
                # Enough candidates that the rescore pool always covers the
                # requested hits with headroom.
                candidates=max(INT4_STAGE1_CANDIDATES, 2 * min(num_hits, self.capacity)),
                metric=self.metric,
                bitcast=bitcast,
                num_buckets=INT4_NUM_BUCKETS,
            )
        if (
            batch <= 32
            and self.num_devices == 1
            and not (not exact_resolved and self._use_fused_kernel(batch))
        ):
            self._refresh_device()
            valid = self._dev_valid
            if row_mask is not None:
                valid = jnp.logical_and(valid, self.device_row_mask(row_mask))
            return _dense_search_chunks_fused(
                self._dev_rows,
                self._dev_sqnorm,
                valid,
                self._dev_row_chunk,
                jnp.asarray(queries, dtype=jnp.float32),
                self._dev_scale,
                self._adapter_device(adapter),
                num_hits=min(num_hits, self.capacity),
                num_results=num_results,
                metric=self.metric,
                exact=exact_resolved,
                bitcast=bitcast,
            )
        scores, idx = self._scan_device(
            queries, num_hits=num_hits, row_mask=row_mask, adapter=adapter, exact=exact
        )
        group = _group_max_topk_bitcast if bitcast else _group_max_topk
        return group(scores, idx, self._dev_row_chunk, num_results=num_results)

    @classmethod
    def from_device_arrays(
        cls,
        rows: jax.Array,  # [N, d] storage dtype, already on device
        row_chunk: jax.Array,  # [N] int32 row -> chunk ordinal
        *,
        row_scale: jax.Array | None = None,  # [N] fp32 (int8 rows)
        valid: jax.Array | None = None,
        metric: DistanceMetric = "cosine",
        num_devices: int = 1,
        use_pallas: bool = True,
        use_int4_stage1: bool = True,
    ) -> "DenseIndex":
        """Search-only index over device-resident arrays (no host mirror).

        Used by bench.py and large-scale serving where the embedding matrix
        is produced on device (e.g. by the sharded encoder) and must not
        round-trip through host RAM.  Mutation APIs require the host mirror
        and are unsupported on an index built this way.
        """
        n, dim = rows.shape
        index = cls(
            dim=dim,
            dtype="int8" if rows.dtype == jnp.int8 else str(rows.dtype),
            metric=metric,
            num_devices=num_devices,
            use_pallas=use_pallas,
            use_int4_stage1=use_int4_stage1,
        )
        index.num_rows = index.capacity = n
        index._dev_rows = rows
        index._dev_scale = row_scale
        index._dev_valid = valid if valid is not None else jnp.ones((n,), jnp.bool_)
        index._dev_row_chunk = row_chunk.astype(jnp.int32)
        # Host mirror of the row->chunk map: metadata-filter callers build
        # row masks from it (a device-built index previously left it EMPTY,
        # silently turning chunk_mask[index.row_chunk] into an all-False
        # row mask — every filtered search returned nothing).
        index.row_chunk = np.asarray(row_chunk, dtype=np.int64)
        if metric == "l2":
            deq = rows.astype(jnp.float32)
            if row_scale is not None:
                deq = deq * row_scale[:, None]
            index._dev_sqnorm = jnp.sum(deq * deq, axis=1)
        else:
            index._dev_sqnorm = jnp.zeros((n,), jnp.float32)
        index.chunk_ids = []
        index._dirty = False
        index._dev_rows_synced = n
        return index

    # --- Checkpoint / resume ----------------------------------------------

    def save(self, path: str) -> None:
        """Persist the index (host mirror + manifest) so reload skips
        re-embedding and re-quantization — the index analogue of the
        reference's "the database is the checkpoint" (SURVEY §5.4)."""
        import json
        from pathlib import Path

        root = Path(path)
        root.mkdir(parents=True, exist_ok=True)
        np.save(root / "rows.npy", self._host_rows[: self.num_rows])
        np.save(root / "valid.npy", self._host_valid[: self.num_rows])
        np.save(root / "row_chunk.npy", self.row_chunk)
        (root / "manifest.json").write_text(
            json.dumps(
                {
                    "dim": self.dim,
                    "metric": self.metric,
                    "dtype": str(np.dtype(self._dtype)) if self._dtype != jnp.bfloat16 else "bfloat16",
                    "num_rows": self.num_rows,
                    "num_devices": self.num_devices,
                    "chunk_ids": self.chunk_ids,
                }
            )
        )

    @classmethod
    def load(cls, path: str, *, num_devices: int | None = None) -> "DenseIndex":
        import json
        from pathlib import Path

        root = Path(path)
        manifest = json.loads((root / "manifest.json").read_text())
        index = cls(
            dim=manifest["dim"],
            dtype=manifest["dtype"],
            metric=manifest["metric"],
            num_devices=num_devices if num_devices is not None else manifest["num_devices"],
        )
        rows = np.load(root / "rows.npy")
        valid = np.load(root / "valid.npy")
        index._ensure_capacity(rows.shape[0])
        index._host_rows[: rows.shape[0]] = rows
        index._host_valid[: valid.shape[0]] = valid
        index.num_rows = int(manifest["num_rows"])
        index.row_chunk = np.load(root / "row_chunk.npy")
        index.chunk_ids = list(manifest["chunk_ids"])
        index._dirty = True
        return index

    def _ensure_packed4(self) -> None:
        """Build (or rebuild) the int4-packed stage-1 copy from the device
        rows, padded to a bucket multiple.  Packing is one elementwise device
        program (~ms at 1.25M rows), so a full repack per insert batch is
        cheap relative to the upload; the copy adds d/2 bytes/row of HBM
        (+50% over int8 storage)."""
        if self._dev_packed4 is None:
            from raglite_tpu.ops.fused_scan import INT4_NUM_BUCKETS, pack_rows_int4

            packed, scale4 = pack_rows_int4(self._dev_rows, self._dev_scale)
            target = _round_up(packed.shape[0], INT4_NUM_BUCKETS)
            if target != packed.shape[0]:  # direct from_device_arrays indexes
                packed = jnp.pad(packed, ((0, target - packed.shape[0]), (0, 0)))
                scale4 = jnp.pad(scale4, (0, target - scale4.shape[0]), constant_values=1.0)
            if self.num_devices > 1:
                from raglite_tpu.parallel.mesh import index_mesh, row_sharding

                mesh = index_mesh(self.num_devices)
                one_d = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
                packed = jax.device_put(packed, row_sharding(mesh))
                scale4 = jax.device_put(scale4, one_d)
            self._dev_packed4, self._dev_scale4 = packed, scale4

    def _use_int4_stage1(self, batch: int, exact: bool) -> bool:
        """Two-stage int4 routing: latency-bound small batches on indexes
        large enough that approximate search is already the routing (the
        rescore keeps chunk recall ~0.998; `exact=True` bypasses).  TPU-only:
        the Pallas kernel is the point (halved HBM traffic).  Multi-device
        indexes route through the sharded variant (parallel/sharded.py)."""
        from raglite_tpu.ops.fused_scan import INT4_NUM_BUCKETS

        return (
            self.use_int4_stage1
            and not exact
            and batch <= 32
            # d/2 must stay a 128-lane multiple for the packed blocks to be
            # tile-legal (dims like 384 fall back to the single-stage scan).
            and self.dim % 256 == 0
            and jax.default_backend() == "tpu"
            and self.num_rows > EXACT_TOPK_MAX_ROWS
            # Only the SHARDED path needs whole-bucket alignment per shard;
            # single-device packs/pads at build time, so arbitrary
            # from_device_arrays sizes keep the two-stage routing.
            and (
                self.num_devices == 1
                or self.capacity % (INT4_NUM_BUCKETS * self.num_devices) == 0
            )
        )

    def _use_fused_kernel(self, batch: int) -> bool:
        """Pallas fused scan on real TPU for latency-bound small batches on
        large indexes; the pure-XLA program otherwise.  Measured crossover
        on v5e @ 1.25M x 1024 int8: Pallas 1.85 ms vs XLA 2.85 ms at B=1,
        XLA 105k vs Pallas 73k QPS at B=1024 (see config.use_pallas)."""
        from raglite_tpu.ops.fused_scan import DEFAULT_NUM_BUCKETS

        return (
            self.use_pallas
            and batch <= 32
            and jax.default_backend() == "tpu"
            and self.num_rows >= 16 * DEFAULT_NUM_BUCKETS
        )

    def rows_for_chunk(self, chunk_ordinal: int) -> np.ndarray:
        return np.flatnonzero(self.row_chunk == chunk_ordinal)


@lru_cache(maxsize=8)
def _index_for_store(
    store_path: str,
    dim: int,
    dtype: str,
    metric: str,
    num_devices: int,
    use_pallas: bool,
    use_int4_stage1: bool,
) -> DenseIndex:
    return DenseIndex(
        dim=dim,
        dtype=dtype,
        metric=metric,
        num_devices=num_devices,
        use_pallas=use_pallas,
        use_int4_stage1=use_int4_stage1,
    )


def dense_index_from_config(config: "RAGLiteConfig") -> DenseIndex:
    """Cached device index per (store, embedder geometry)."""
    from raglite_tpu.models.encoder import embedding_dim
    from raglite_tpu.store import store_from_config

    index = _index_for_store(
        config.store_path,
        embedding_dim(config),
        config.embedding_dtype,
        config.vector_search_distance_metric,
        config.num_devices,
        config.use_pallas,
        config.use_int4_stage1,
    )
    index.sync(store_from_config(config))
    return index
