"""Inverted keyword index with on-device BM25 scoring.

Replaces DuckDB's FTS extension index (PRAGMA create_fts_index,
/root/reference/src/raglite/_database.py:606-619) and Postgres tsvector GIN
(_database.py:564-575).  Postings build incrementally on the host (a C++
builder can slot in behind the same interface); scoring runs on device
(ops/bm25.py).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from raglite_tpu.utils.padding import round_up as _round_up

from raglite_tpu.ops.bm25 import K1, bm25_idf, bm25_topk, bm25_topk_resident

if TYPE_CHECKING:
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.store import Store

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens (the reference strips punctuation into an
    OR-query the same way, _search.py:183-189)."""
    return _WORD_RE.findall(text.lower())



class KeywordIndex:
    """Host postings + device-side scoring.

    The postings build runs in the first-party C++ builder
    (native/postings.cpp — the replacement for DuckDB's C++ FTS build)
    when the native library compiles; otherwise a pure-Python dict build
    with identical behavior.
    """

    #: Dead-chunk fraction above which the postings fully rebuild.  Below
    #: it, deletes are handled by masking dead ordinals at query time —
    #: O(postings touched) per query instead of the reference's full FTS
    #: rebuild on EVERY mutation (_insert.py:268-272, _delete.py:130-178).
    #: idf/avg_len drift from dead postings is bounded by this fraction and
    #: snaps back exactly at rebuild.
    REBUILD_DEAD_FRACTION = 0.3

    #: Device-resident postings: terms with more postings than this
    #: contribute only their LCAP highest-impact postings (impact-ordered
    #: early termination; only stopword-class terms truncate).  Rounded up
    #: to the 128-lane multiple at build.
    RESIDENT_LCAP = 8192
    #: Queries with more unique terms fall back to the host-gather path.
    RESIDENT_MAX_TERMS = 32

    def __init__(self) -> None:
        import threading

        self._sync_lock = threading.Lock()  # see DenseIndex._sync_lock
        self.chunk_ids: list[str] = []
        #: term -> {chunk ordinal -> tf} (Python fallback path)
        self._postings: dict[str, dict[int, int]] = {}
        self.doc_len: list[int] = []
        self._synced_version = -1
        self._native = None
        self._csr: dict | None = None  # exported CSR cache (native path)
        self._ordinal: dict[str, int] = {}  # chunk id -> postings ordinal
        self._dead: set[int] = set()  # ALL tombstoned ordinals (masked at query)
        #: tombstoned ordinals whose postings still exist (tombstoned since
        #: the last rebuild) — only these drive the rebuild threshold;
        #: ordinals rebuilt-with-empty-bodies carry no postings to drop.
        self._stale_dead: set[int] = set()
        self._alive_mask: np.ndarray | None = None  # cache over self._dead
        #: device-resident postings (None = not built / invalidated by adds)
        self._res: dict | None = None
        self.use_resident = True
        try:
            from raglite_tpu.native import NativePostingsBuilder, native_available

            if native_available():
                self._native = NativePostingsBuilder()
        except Exception:  # pragma: no cover - toolchain missing
            self._native = None

    # --- Build ----------------------------------------------------------

    def _add_chunk(self, chunk_id: str, text: str) -> None:
        ordinal = len(self.chunk_ids)
        self.chunk_ids.append(chunk_id)
        self._ordinal[chunk_id] = ordinal
        self._res = None  # postings changed: resident arrays rebuild lazily
        if self._native is not None:
            self._native.add_chunk(text)
            self._csr = None
            self.doc_len.append(0)  # real value lives in the native builder
            return
        tokens = tokenize(text)
        self.doc_len.append(len(tokens))
        for token in tokens:
            bucket = self._postings.setdefault(token, {})
            bucket[ordinal] = bucket.get(ordinal, 0) + 1

    def rebuild(self, store: "Store") -> None:
        self.chunk_ids = []
        self._postings = {}
        self.doc_len = []
        self._ordinal = {}
        self._alive_mask = None
        self._res = None
        if self._native is not None:
            from raglite_tpu.native import NativePostingsBuilder

            self._native = NativePostingsBuilder()
            self._csr = None
        for cid in store.chunk_order:
            self._add_chunk(cid, self._chunk_body(store, cid))
        # Tombstoned ordinals re-add with EMPTY bodies (slot alignment with
        # store.chunk_order), so their postings are gone: nothing is stale.
        self._dead = {
            self._ordinal[cid] for cid in store.deleted_chunks if cid in self._ordinal
        }
        self._stale_dead = set()
        self._synced_version = store.version

    @staticmethod
    def _chunk_body(store: "Store", cid: str) -> str:
        """Tombstoned chunks keep their ordinal slot with an empty body (so
        posting ordinals stay aligned with chunk_order); their record is
        gone from store.chunks after a delete."""
        chunk = store.chunks.get(cid)
        return chunk.body if chunk is not None else ""

    def sync(self, store: "Store") -> None:
        if self._synced_version == store.version:
            return
        with self._sync_lock:
            self._sync_locked(store)

    def _sync_locked(self, store: "Store") -> None:
        if self._synced_version == store.version:
            return  # another thread synced while we waited
        if len(store.chunk_order) >= len(self.chunk_ids) and (
            store.chunk_order[: len(self.chunk_ids)] == self.chunk_ids
        ):
            # Incremental: append new chunks, tombstone deleted ordinals.
            for cid in store.chunk_order[len(self.chunk_ids) :]:
                self._add_chunk(cid, self._chunk_body(store, cid))
            new_dead = {
                self._ordinal[cid]
                for cid in store.deleted_chunks
                if cid in self._ordinal
            } - self._dead
            if new_dead:
                self._dead |= new_dead
                self._stale_dead |= new_dead
                self._alive_mask = None
                # Drop dead doc lengths so avg_len tracks the live corpus
                # (the CSR export re-zeroes them on refresh), THEN refresh
                # the resident weights from the updated lengths.
                for ordinal in new_dead:
                    if ordinal < len(self.doc_len):
                        self.doc_len[ordinal] = 0
                self._refresh_resident_weights()
            # Stale (still-posted) dead chunks are masked per query until
            # they become a large fraction of the LIVE corpus, THEN one
            # amortized rebuild drops them (and corrects the bounded idf
            # drift) — versus the reference's full FTS rebuild on every
            # mutation (_delete.py:130-178).
            alive_count = max(len(self.chunk_ids) - len(self._dead), 1)
            if len(self._stale_dead) > self.REBUILD_DEAD_FRACTION * alive_count:
                self.rebuild(store)
            else:
                self._synced_version = store.version
        else:
            # Prefix changed (compaction reordered ordinals): full rebuild.
            self.rebuild(store)

    def _alive(self) -> np.ndarray | None:
        """Bool mask over ordinals, False where tombstoned (None = all alive)."""
        if not self._dead:
            return None
        if self._alive_mask is None or self._alive_mask.size != len(self.chunk_ids):
            mask = np.ones(len(self.chunk_ids), dtype=bool)
            mask[np.fromiter(self._dead, dtype=np.int64, count=len(self._dead))] = False
            self._alive_mask = mask
        return self._alive_mask

    # --- Device-resident postings ---------------------------------------

    def _host_csr(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict[str, int] | None]:
        """(offsets[V+1] i64, chunks[P] i32, tf[P] i32, term->id or None).

        Native path: the cached C++ CSR export (query lookup stays in the
        C++ dictionary).  Python path: a CSR built from the postings dict
        plus an explicit term->id map.
        """
        if self._native is not None:
            if self._csr is None:
                self._csr = self._native.export()
                self.doc_len = [int(x) for x in self._csr["doc_len"]]
                for ordinal in self._dead:
                    if ordinal < len(self.doc_len):
                        self.doc_len[ordinal] = 0
            csr = self._csr
            return csr["offsets"], csr["chunks"], csr["tf"], None
        terms = list(self._postings)
        term_id = {t: i for i, t in enumerate(terms)}
        counts = np.asarray([len(self._postings[t]) for t in terms], np.int64)
        offsets = np.zeros(len(terms) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        chunks = np.zeros(int(offsets[-1]), np.int32)
        tf = np.zeros(int(offsets[-1]), np.int32)
        for i, t in enumerate(terms):
            bucket = self._postings[t]
            lo = int(offsets[i])
            chunks[lo : lo + len(bucket)] = np.fromiter(bucket.keys(), np.int32, len(bucket))
            tf[lo : lo + len(bucket)] = np.fromiter(bucket.values(), np.int32, len(bucket))
        return offsets, chunks, tf, term_id

    def _resident_n_pad(self) -> int:
        """Corpus-axis pad bucket: ~12.5% geometric steps so inserts reuse
        compiles (the scatter width is a static shape)."""
        n = len(self.chunk_ids)
        step = max(4096, 1 << max(int(n).bit_length() - 4, 0))
        return _round_up(max(n, 1), step)

    def _ensure_resident(self) -> dict | None:
        """Build (lazily) the device-resident postings: CSR offsets plus,
        per posting, the chunk ordinal and its PRECOMPUTED Okapi weight
        ``idf·tf·(K1+1)/(tf+K1·len_norm)`` — every term-frequency/idf/
        length factor is known at build time, so query-time scoring is pure
        weight summation.  Over-cap terms keep their top-impact postings
        (truncated at build).  Queries then upload term ids only
        (ops/bm25.py bm25_topk_resident)."""
        if not self.use_resident or not self.chunk_ids:
            return None
        if self._res is not None:
            return self._res
        with self._sync_lock:
            if self._res is not None:
                return self._res
            offsets, chunks, tf, term_id = self._host_csr()
            n = len(self.chunk_ids)
            n_pad = self._resident_n_pad()
            df = np.diff(offsets)
            idf = bm25_idf(df.astype(np.float64), n).astype(np.float32)
            doc_len = np.asarray(self.doc_len, np.float32)
            alive_len = doc_len > 0
            avg_len = max(float(doc_len[alive_len].mean()), 1.0) if alive_len.any() else 1.0
            len_norm = (1.0 - 0.75) + 0.75 * doc_len / avg_len
            if len(chunks):
                # Truncate over-cap terms to their top-impact postings AT
                # BUILD (impact-ordered early termination; only
                # stopword-class terms lose postings).  idf keeps the full
                # pre-truncation df, matching the host path.
                term_of = np.repeat(np.arange(len(df), dtype=np.int64), df)
                impact = (
                    idf[term_of]
                    * tf
                    * (K1 + 1.0)
                    / np.maximum(tf + K1 * len_norm[chunks], 1e-9)
                )
                order = np.lexsort((-impact, term_of))
                chunks, tf, term_of = chunks[order], tf[order], term_of[order]
                rank = np.arange(len(chunks), dtype=np.int64) - offsets[term_of]
                keep = rank < self.RESIDENT_LCAP
                chunks, tf, term_of = chunks[keep], tf[keep], term_of[keep]
                df = np.bincount(term_of, minlength=len(df)).astype(np.int64)
                offsets = np.zeros(len(df) + 1, np.int64)
                np.cumsum(df, out=offsets[1:])
                idf_post = idf[term_of]
            else:
                idf_post = np.zeros((0,), np.float32)
            lcap = _round_up(min(int(df.max()) if len(df) else 1, self.RESIDENT_LCAP), 128)
            # dynamic_slice reads [lo, lo+lcap); pad the resident arrays so
            # slices at the tail never clamp (clamping would misalign them).
            slice_pad = 1 << max(int(lcap) - 1, 1).bit_length()
            chunk_dev = np.full(len(chunks) + slice_pad, n_pad, np.int32)
            chunk_dev[: len(chunks)] = chunks
            res = {
                "offsets": jnp.asarray(offsets.astype(np.int32)),
                "chunk": jnp.asarray(chunk_dev),
                "term_id": term_id,
                "df_host": df.astype(np.int64),
                # host copies for weight recomputation after deletes
                "host_chunks": chunks.astype(np.int64),
                "host_tf": tf.astype(np.float32),
                "host_idf_post": idf_post.astype(np.float32),
                "slice_pad": int(slice_pad),
                "dummy_mask": jnp.zeros((1,), bool),
                "lcap": int(lcap),
                "n_pad": int(n_pad),
                "version": (len(self.chunk_ids), len(self._dead)),
            }
            self._res = res
            self._refresh_resident_weights()
            return self._res

    def _refresh_resident_weights(self) -> None:
        """(Re)compute + upload the per-posting weights — at build, and
        after deletes (which change avg_len and zero dead chunks' weights;
        the postings/offsets themselves stay resident).  avg_len
        re-averages over live chunks, matching the host path exactly."""
        if self._res is None:
            return
        res = self._res
        chunks = res["host_chunks"]
        tf = res["host_tf"]
        n_pad = res["n_pad"]
        len_norm = self._len_norm(n_pad)
        w = (
            res["host_idf_post"]
            * tf
            * (K1 + 1.0)
            / np.maximum(tf + K1 * len_norm[chunks].astype(np.float32), 1e-9)
        )
        alive = self._alive()
        if alive is not None:
            w = np.where(alive[chunks], w, 0.0)
        w_dev = np.zeros(len(chunks) + res["slice_pad"], np.float32)
        w_dev[: len(chunks)] = w
        res["w"] = jnp.asarray(w_dev)
        res["host_w"] = w.astype(np.float32)
        res.pop("sharded", None)  # per-shard weights re-derive lazily

    def _resident_term_ids(self, queries: list[str]) -> np.ndarray | None:
        """[B, T] int32 unique term ids per query (pad -1), or None when a
        query exceeds RESIDENT_MAX_TERMS unique known terms."""
        res = self._res
        rows = []
        for q in queries:
            if self._native is not None:
                ids = np.unique(self._native.tokenize_lookup(q))
                ids = ids[ids >= 0]
            else:
                term_id = res["term_id"]
                seen = dict.fromkeys(tokenize(q))
                ids = np.asarray(
                    [term_id[t] for t in seen if t in term_id], np.int32
                )
            if len(ids) > self.RESIDENT_MAX_TERMS:
                return None
            rows.append(ids)
        t_max = max((len(r) for r in rows), default=0)
        t_pad = 4
        while t_pad < t_max:
            t_pad *= 2
        out = np.full((len(queries), t_pad), -1, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    def resident_prepare(self, queries: list[str]) -> np.ndarray | None:
        """Build the resident arrays if needed and return the [B, T] term-id
        matrix for ``queries``, or None when the resident path can't serve
        them (disabled, empty index, or a query over RESIDENT_MAX_TERMS)."""
        if self._ensure_resident() is None:
            return None
        return self._resident_term_ids(queries)

    def resident_device_mask(self, chunk_mask: np.ndarray | None) -> tuple[jnp.ndarray, bool]:
        """(device mask, masked flag) for the resident kernel's metadata
        filter route.  Weights already encode alive/dead; a metadata filter
        adds a per-posting mask gather inside the kernel."""
        res = self._res
        if chunk_mask is None:
            return res["dummy_mask"], False
        n = len(self.chunk_ids)
        m = np.zeros(res["n_pad"], bool)
        m[:n] = chunk_mask[:n]
        return jnp.asarray(m), True

    def resident_block_device(
        self,
        block: np.ndarray,  # [b, T] int32 term ids (pad -1), b <= 256
        *,
        num_hits: int,
        mask: jnp.ndarray,
        masked: bool,
    ) -> "jnp.ndarray":
        """One <=256-query block through the resident BM25 device program,
        returning the packed [2, b_pad, k] DEVICE array (no host fetch) —
        the building block the fused hybrid path chains into device RRF.
        Winners are approx_max_k output: UNORDERED; consumers sort by
        (score desc, ordinal asc)."""
        res = self._res
        b_pad = 1
        while b_pad < len(block):
            b_pad *= 2
        if b_pad != len(block):
            block = np.pad(
                block, ((0, b_pad - len(block)), (0, 0)), constant_values=-1
            )
        # Adaptive postings width: pad the per-term slice fetch to the
        # max (truncated) df among THIS block's terms, pow2 bucket —
        # tail queries fetch/sort 4-64x fewer slots than the global cap.
        valid = block[block >= 0]
        max_df = int(res["df_host"][valid].max()) if valid.size else 1
        lcap_b = 128
        while lcap_b < max_df:
            lcap_b *= 2
        return bm25_topk_resident(
            res["offsets"], res["chunk"], res["w"], mask,
            jnp.asarray(block),
            num_chunks=res["n_pad"], lcap=lcap_b, num_hits=num_hits,
            masked=masked,
        )

    # --- Sharded postings (multi-chip) ------------------------------------

    def _ensure_sharded(self, n_shards: int) -> dict | None:
        """Partition the resident postings by chunk ordinal range into
        ``n_shards`` per-shard CSRs (VERDICT r3 task #7): shard s owns
        chunks [s*C, (s+1)*C), each posting keeps its GLOBAL Okapi weight
        (idf/avg_len are corpus statistics), so per-shard scoring + ICI
        merge equals the single-device program exactly
        (parallel/sharded.py:sharded_bm25_topk).  Replaces the reference's
        Postgres scale-out (_database.py:527-603)."""
        res = self._ensure_resident()
        if res is None:
            return None
        cached = res.get("sharded")
        if cached is not None and cached["n_shards"] == n_shards:
            return cached
        chunks = res["host_chunks"]  # impact-ordered within each term
        w = res["host_w"]
        df = res["df_host"]
        vocab = len(df)
        term_of = np.repeat(np.arange(vocab, dtype=np.int64), df)
        c = _round_up(-(-res["n_pad"] // n_shards), 256)
        shard_of = chunks // c  # chunks < n_pad <= n_shards*C
        # Stable sort groups postings by (shard, term), preserving the
        # impact order within each group (truncation already happened
        # globally, so shard postings are exact partitions of the
        # single-device postings).
        order = np.lexsort((term_of, shard_of))
        sh_s, t_s, c_s, w_s = shard_of[order], term_of[order], chunks[order], w[order]
        counts = np.zeros((n_shards, vocab), np.int64)
        np.add.at(counts, (sh_s, t_s), 1)
        offsets = np.zeros((n_shards, vocab + 1), np.int64)
        np.cumsum(counts, axis=1, out=offsets[:, 1:])
        lcap = _round_up(
            min(int(counts.max()) if counts.size else 1, self.RESIDENT_LCAP), 128
        )
        shard_tot = counts.sum(axis=1)
        p_pad = int(shard_tot.max() if len(shard_tot) else 0) + (
            1 << max(int(lcap) - 1, 1).bit_length()
        )
        pc = np.full((n_shards, p_pad), c, np.int32)  # pad = local sentinel C
        pw = np.zeros((n_shards, p_pad), np.float32)
        start = np.concatenate([[0], np.cumsum(shard_tot)])
        for s in range(n_shards):
            seg = slice(int(start[s]), int(start[s + 1]))
            pc[s, : int(shard_tot[s])] = (c_s[seg] - s * c).astype(np.int32)
            pw[s, : int(shard_tot[s])] = w_s[seg]
        sharded = {
            "offsets": jnp.asarray(offsets.astype(np.int32)),
            "chunk": jnp.asarray(pc),
            "w": jnp.asarray(pw),
            "C": int(c),
            "lcap": int(lcap),
            "n_shards": n_shards,
            "dummy_mask": jnp.zeros((n_shards, 1), bool),
            "postings_per_shard": [int(x) for x in shard_tot],
        }
        res["sharded"] = sharded
        return sharded

    def sharded_search_batch(
        self,
        queries: list[str],
        *,
        num_hits: int,
        mesh,
        chunk_mask: np.ndarray | None = None,
    ) -> list[tuple[list[str], list[float]]] | None:
        """Batched BM25 over postings sharded across ``mesh``'s ``data``
        axis; output contract matches :meth:`search_batch` (None when the
        resident path can't serve the batch)."""
        from raglite_tpu.parallel.sharded import sharded_bm25_topk

        n = len(self.chunk_ids)
        if not queries:
            return []
        if n == 0:
            return [([], []) for _ in queries]
        sharded = self._ensure_sharded(mesh.shape["data"])
        if sharded is None:
            return None
        term_ids = self._resident_term_ids(queries)
        if term_ids is None:
            return None
        c = sharded["C"]
        n_shards = sharded["n_shards"]
        if chunk_mask is not None:
            m = np.zeros(n_shards * c, bool)
            m[:n] = chunk_mask[:n]
            mask = jnp.asarray(m.reshape(n_shards, c))
            masked = True
        else:
            mask = sharded["dummy_mask"]
            masked = False
        k = min(num_hits, n)
        results: list[tuple[list[str], list[float]]] = []
        for blk_start in range(0, len(queries), 256):
            block = term_ids[blk_start : blk_start + 256]
            b_pad = 1
            while b_pad < len(block):
                b_pad *= 2
            if b_pad != len(block):
                block = np.pad(
                    block, ((0, b_pad - len(block)), (0, 0)), constant_values=-1
                )
            packed = np.asarray(
                sharded_bm25_topk(
                    sharded["offsets"], sharded["chunk"], sharded["w"], mask,
                    jnp.asarray(block),
                    chunks_per_shard=c, lcap=sharded["lcap"], num_hits=k,
                    mesh=mesh, masked=masked,
                )
            )
            scores_b = packed[0]
            ordinals_b = np.ascontiguousarray(packed[1]).view(np.int32)
            for b in range(min(256, len(queries) - blk_start)):
                order = np.lexsort((ordinals_b[b], -scores_b[b]))
                sc, od = scores_b[b][order], ordinals_b[b][order]
                hits = (sc > 0.0) & (od < n)
                results.append(
                    (
                        [self.chunk_ids[int(o)] for o in od[hits]],
                        [float(s) for s in sc[hits]],
                    )
                )
        return results

    def _resident_search(
        self,
        queries: list[str],
        *,
        num_hits: int,
        chunk_mask: np.ndarray | None,
    ) -> list[tuple[list[str], list[float]]] | None:
        """All queries through the resident device program, or None to fall
        back to the host-gather path (resident disabled / too many terms)."""
        res = self._ensure_resident()
        if res is None:
            return None
        term_ids = self._resident_term_ids(queries)
        if term_ids is None:
            return None
        n = len(self.chunk_ids)
        mask, masked = self.resident_device_mask(chunk_mask)
        k = min(num_hits, n)
        results: list[tuple[list[str], list[float]]] = []
        for start in range(0, len(queries), 256):
            packed = np.asarray(  # ONE device fetch: [2, B, k]
                self.resident_block_device(
                    term_ids[start : start + 256],
                    num_hits=k, mask=mask, masked=masked,
                )
            )
            scores_b = packed[0]
            ordinals_b = packed[1].view(np.int32)
            for b in range(min(256, len(queries) - start)):
                # approx_max_k's winners are unordered: sort by score desc,
                # ordinal asc (top_k's tie order).
                order = np.lexsort((ordinals_b[b], -scores_b[b]))
                sc, od = scores_b[b][order], ordinals_b[b][order]
                hits = (sc > 0.0) & (od < n)
                results.append(
                    (
                        [self.chunk_ids[int(o)] for o in od[hits]],
                        [float(s) for s in sc[hits]],
                    )
                )
        return results

    # --- Search ---------------------------------------------------------

    def _gather_postings(
        self, query: str, chunk_mask: np.ndarray | None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side postings gather for one query's terms: returns
        (chunk ordinals [P], tf [P], idf [P]), metadata-mask applied."""
        n = len(self.chunk_ids)
        rows_chunk: list[np.ndarray] = []
        rows_tf: list[np.ndarray] = []
        rows_idf: list[np.ndarray] = []
        if self._native is not None:
            if self._csr is None:
                self._csr = self._native.export()
                self.doc_len = [int(x) for x in self._csr["doc_len"]]
                for ordinal in self._dead:  # dead chunks leave avg_len
                    if ordinal < len(self.doc_len):
                        self.doc_len[ordinal] = 0
            csr = self._csr
            term_ids = np.unique(self._native.tokenize_lookup(query))
            for tid in term_ids:
                lo, hi = int(csr["offsets"][tid]), int(csr["offsets"][tid + 1])
                if hi == lo:
                    continue
                rows_chunk.append(csr["chunks"][lo:hi])
                rows_tf.append(csr["tf"][lo:hi].astype(np.float32))
                rows_idf.append(np.full(hi - lo, bm25_idf(np.asarray(hi - lo), n)))
        else:
            terms = list(dict.fromkeys(tokenize(query)))
            for term in terms:
                bucket = self._postings.get(term)
                if not bucket:
                    continue
                ords = np.fromiter(bucket.keys(), dtype=np.int32, count=len(bucket))
                tfs = np.fromiter(bucket.values(), dtype=np.float32, count=len(bucket))
                rows_chunk.append(ords)
                rows_tf.append(tfs)
                rows_idf.append(np.full(len(bucket), bm25_idf(np.asarray(len(bucket)), n)))
        if not rows_chunk:
            empty = np.zeros((0,), dtype=np.float32)
            return np.zeros((0,), dtype=np.int32), empty, empty
        chunk = np.concatenate(rows_chunk).astype(np.int32)
        tf = np.concatenate(rows_tf).astype(np.float32)
        idf = np.concatenate(rows_idf).astype(np.float32)
        alive = self._alive()
        if alive is not None:  # tombstoned chunks never score
            keep = alive[chunk]
            chunk, tf, idf = chunk[keep], tf[keep], idf[keep]
        if chunk_mask is not None:
            keep = chunk_mask[chunk]
            chunk, tf, idf = chunk[keep], tf[keep], idf[keep]
        return chunk, tf, idf

    def _len_norm(self, n_pad: int) -> np.ndarray:
        doc_len = np.asarray(self.doc_len, dtype=np.float32)
        # Tombstoned chunks keep their ordinal slot with length 0; averaging
        # over them would halve avg_len after mass deletes and then snap back
        # at compaction, shifting BM25's long-vs-short ranking with no corpus
        # change (DuckDB FTS recomputes avgdl over remaining rows only).
        alive = doc_len > 0
        avg_len = max(float(doc_len[alive].mean()), 1.0) if alive.any() else 1.0
        len_norm = (1.0 - 0.75) + 0.75 * doc_len / avg_len
        return np.pad(len_norm, (0, n_pad - len(doc_len)), constant_values=1.0)

    def search(
        self,
        query: str,
        *,
        num_hits: int,
        chunk_mask: np.ndarray | None = None,
    ) -> tuple[list[str], list[float]]:
        """BM25 top hits (reference: keyword_search, _search.py:156-230).

        Gathers the query terms' postings on the host, scores + ranks on
        device.  ``chunk_mask`` applies metadata pre-filtering.
        """
        n = len(self.chunk_ids)
        if n == 0:
            return [], []
        resident = self._resident_search(
            [query], num_hits=num_hits, chunk_mask=chunk_mask
        )
        if resident is not None:
            return resident[0]
        chunk, tf, idf = self._gather_postings(query, chunk_mask)
        if chunk.size == 0:
            return [], []
        # Pad both the posting axis and the chunk axis to bucketed sizes so
        # the jitted scorer compiles once per bucket, not once per corpus
        # size (inserts would otherwise trigger a recompile per search).
        p_pad = _round_up(len(chunk), 512)
        n_pad = _round_up(n, 256)
        chunk = np.pad(chunk, (0, p_pad - len(chunk)), constant_values=n_pad)  # paddings drop
        tf = np.pad(tf, (0, p_pad - len(tf)))
        idf = np.pad(idf, (0, p_pad - len(idf)))
        len_norm = self._len_norm(n_pad)
        k = min(num_hits, n)
        scores, ordinals = bm25_topk(
            jnp.asarray(chunk),
            jnp.asarray(tf),
            jnp.asarray(idf),
            jnp.asarray(len_norm),
            num_chunks=n_pad,
            num_hits=k,
        )
        scores = np.asarray(scores)
        ordinals = np.asarray(ordinals)
        hits = (scores > 0.0) & (ordinals < n)  # drop padded chunk ordinals
        return (
            [self.chunk_ids[int(o)] for o in ordinals[hits]],
            [float(s) for s in scores[hits]],
        )

    def search_batch(
        self,
        queries: list[str],
        *,
        num_hits: int,
        chunk_mask: np.ndarray | None = None,
    ) -> list[tuple[list[str], list[float]]]:
        """[B]-batched BM25: all queries' postings gather on the host, then
        ONE segment-sum + top_k device program scores every query (the
        round-1 gap: hybrid_search_batch looped keyword search per query).
        """
        n = len(self.chunk_ids)
        if n == 0 or not queries:
            return [([], []) for _ in queries]
        resident = self._resident_search(
            queries, num_hits=num_hits, chunk_mask=chunk_mask
        )
        if resident is not None:
            return resident
        gathered = [self._gather_postings(q, chunk_mask) for q in queries]
        total = sum(g[0].size for g in gathered)
        if total == 0:
            return [([], []) for _ in queries]
        chunk = np.concatenate([g[0] for g in gathered])
        tf = np.concatenate([g[1] for g in gathered])
        idf = np.concatenate([g[2] for g in gathered])
        qid = np.repeat(
            np.arange(len(queries), dtype=np.int32), [g[0].size for g in gathered]
        )
        p_pad = _round_up(total, 512)
        n_pad = _round_up(n, 256)
        pad = p_pad - total
        chunk = np.pad(chunk, (0, pad), constant_values=n_pad)
        qid = np.pad(qid, (0, pad))  # padding scores land on query 0's pad row
        tf = np.pad(tf, (0, pad))
        idf = np.pad(idf, (0, pad))
        from raglite_tpu.ops.bm25 import bm25_topk_batch

        k = min(num_hits, n)
        scores_b, ordinals_b = bm25_topk_batch(
            jnp.asarray(chunk),
            jnp.asarray(qid),
            jnp.asarray(tf),
            jnp.asarray(idf),
            jnp.asarray(self._len_norm(n_pad)),
            num_chunks=n_pad,
            batch=len(queries),
            num_hits=k,
        )
        scores_b = np.asarray(scores_b)
        ordinals_b = np.asarray(ordinals_b)
        results: list[tuple[list[str], list[float]]] = []
        for b in range(len(queries)):
            hits = (scores_b[b] > 0.0) & (ordinals_b[b] < n)
            results.append(
                (
                    [self.chunk_ids[int(o)] for o in ordinals_b[b][hits]],
                    [float(s) for s in scores_b[b][hits]],
                )
            )
        return results


@lru_cache(maxsize=8)
def _keyword_index_for_path(store_path: str) -> KeywordIndex:
    return KeywordIndex()


def keyword_index_from_config(config: "RAGLiteConfig") -> KeywordIndex:
    from raglite_tpu.store import store_from_config

    index = _keyword_index_for_path(config.store_path)
    index.sync(store_from_config(config))
    return index
