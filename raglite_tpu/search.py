"""Vector / keyword / hybrid search, retrieval, and reranking.

Counterpart of /root/reference/src/raglite/_search.py.  The SQL query plans
become device programs:

- ``vector_search``: query embed → adapter matmul → fused distance matmul +
  top-k over the HBM index (index/dense.py) → multi-vector L-inf (group max)
  aggregation on the oversampled candidate set.
- ``keyword_search``: on-device BM25 over postings (index/keyword.py).
- Metadata filtering is a bitset AND inside the scan.  The reference's
  100k-row pre-vs-post-filter crossover (_search.py:96-141) collapses on
  TPU: a mask in the fused scan is always at least as fast, so filtering is
  always "filter-then-rank".
- ``rerank_chunks``: token-level late-interaction MaxSim on device
  (ops/maxsim.py) selected per language, instead of ONNX cross-encoders.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from itertools import groupby
from typing import Any

import numpy as np

from raglite_tpu.config import RAGLiteConfig
from raglite_tpu.documents import Chunk, ChunkSpan, adapt_metadata
from raglite_tpu.embed import embed_queries, embed_strings
from raglite_tpu.index.dense import dense_index_from_config
from raglite_tpu.index.keyword import keyword_index_from_config
from raglite_tpu.ops.maxsim import maxsim_rank
from raglite_tpu.store import store_from_config
from raglite_tpu.types import BasicSearchMethod, ChunkId, FloatVector, MetadataFilter
from raglite_tpu.utils.lang import detect_language

logger = logging.getLogger(__name__)

__all__ = [
    "vector_search",
    "keyword_search",
    "keyword_search_batch",
    "hybrid_search",
    "hybrid_search_batch",
    "vector_search_batch",
    "reciprocal_rank_fusion",
    "retrieve_chunks",
    "retrieve_chunk_spans",
    "rerank_chunks",
    "search_and_rerank_chunks",
    "search_and_rerank_chunk_spans",
]


def _chunk_mask(store, metadata_filter: MetadataFilter) -> np.ndarray:
    """Boolean mask over chunk ordinals matching the metadata filter,
    computed from the store's incremental per-(field,value) ordinal
    postings in O(matching) — not an O(corpus) scan (reference plans
    filters in SQL, _search.py:96-141)."""
    return store.chunk_mask_for_filter(metadata_filter)


def corrected_num_hits(oversample: int, num_results: int, config: "RAGLiteConfig") -> int:
    """Oversampled sub-vector hit count, normalized by chunk size
    (reference: _search.py:66-67) — the ONE copy of the heuristic shared by
    query-time search and query-adapter training."""
    corrected = oversample * config.chunk_max_size / 2048
    return max(1, round(corrected)) * max(num_results, 10)


def vector_search(
    query: str | FloatVector,
    *,
    num_results: int = 3,
    oversample: int = 4,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> tuple[list[ChunkId], list[float]]:
    """Exact vector search over the HBM index (reference: _search.py:36-153).

    Ranks chunks by the L-inf norm over their multi-vector similarities
    (group max over sub-vectors), computed on the oversampled top sub-vector
    hits, matching the reference's GROUP BY chunk_id MAX(sim) aggregation
    (_search.py:143-152).
    """
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    metadata_filter = adapt_metadata(metadata_filter)
    if config.self_query and isinstance(query, str):
        from raglite_tpu.extract import self_query_filter

        metadata_filter = {**self_query_filter(query, config=config), **(metadata_filter or {})}
    # Embed the query (reference: _search.py:54-56).
    from raglite_tpu.utils.trace import phase

    with phase("search.embed_query"):
        query_embedding = (
            embed_strings([query], config=config)[0, :].astype(np.float32)
            if isinstance(query, str)
            else np.ravel(np.asarray(query, dtype=np.float32))
        )
    # The query adapter is applied as a device (HBM) matmul inside
    # index.search (reference does it in numpy, _search.py:58-62).
    adapter = (
        store.index_metadata.get("query_adapter")
        if config.vector_search_query_adapter
        else None
    )
    index = dense_index_from_config(config)
    if index.num_rows == 0:
        return [], []
    # Oversampled sub-vector hit count (reference: _search.py:66-67).
    num_hits = corrected_num_hits(oversample, num_results, config)
    row_mask = None
    if metadata_filter:
        cmask = _chunk_mask(store, metadata_filter)
        if not cmask.any():
            return [], []
        row_mask = cmask[index.row_chunk]
    # Fused scan + on-device multi-vector group-max aggregation
    # (reference: :143-152) + final ranking: one device program, one fetch.
    with phase("search.dense_scan"):
        chunk_scores, chunk_ordinals = index.search_chunks(
            query_embedding[None, :],
            num_hits=min(num_hits, index.num_rows),
            num_results=num_results,
            row_mask=row_mask,
            adapter=adapter,
        )
    # Upper bound mirrors the keyword side: TPU padded-tile kernels can
    # surface a padding slot's ordinal with a finite score on tiny corpora.
    keep = (chunk_ordinals[0] >= 0) & (chunk_ordinals[0] < len(index.chunk_ids))
    return (
        [index.chunk_ids[o] for o in chunk_ordinals[0][keep]],
        [float(s) for s in chunk_scores[0][keep]],
    )


def vector_search_batch(
    queries: list[str],
    *,
    num_results: int = 3,
    oversample: int = 4,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> list[tuple[list[ChunkId], list[float]]]:
    """Batched :func:`vector_search`: one [B, N] fused device scan for B
    queries instead of B single-query dispatches — the throughput path for
    offline evaluation and serving (no reference analogue; its SQL engine
    executes per-query)."""
    config = config or RAGLiteConfig()
    if not queries:
        return []
    if config.self_query:
        # Self-query extracts a per-query LLM metadata filter — inherently
        # per-query work, so fall back to single-query calls rather than
        # silently dropping the filter on the batch path.
        return [
            vector_search(
                query, num_results=num_results, oversample=oversample,
                metadata_filter=metadata_filter, config=config,
            )
            for query in queries
        ]
    store = store_from_config(config)
    embeddings = embed_queries(queries, config=config).astype(np.float32)
    adapter = (
        store.index_metadata.get("query_adapter")
        if config.vector_search_query_adapter
        else None
    )
    index = dense_index_from_config(config)
    if index.num_rows == 0:
        return [([], []) for _ in queries]
    num_hits = corrected_num_hits(oversample, num_results, config)
    row_mask = None
    metadata_filter = adapt_metadata(metadata_filter)
    if metadata_filter:
        cmask = _chunk_mask(store, metadata_filter)
        if not cmask.any():
            return [([], []) for _ in queries]
        row_mask = cmask[index.row_chunk]
    chunk_scores, chunk_ordinals = index.search_chunks(
        embeddings,
        num_hits=min(num_hits, index.num_rows),
        num_results=num_results,
        row_mask=row_mask,
        adapter=adapter,
    )
    results: list[tuple[list[ChunkId], list[float]]] = []
    for b in range(len(queries)):
        keep = (chunk_ordinals[b] >= 0) & (chunk_ordinals[b] < len(index.chunk_ids))
        results.append(
            (
                [index.chunk_ids[o] for o in chunk_ordinals[b][keep]],
                [float(s) for s in chunk_scores[b][keep]],
            )
        )
    return results


def keyword_search(
    query: str,
    *,
    num_results: int = 3,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> tuple[list[ChunkId], list[float]]:
    """BM25 keyword search on device (reference: _search.py:156-230)."""
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    metadata_filter = adapt_metadata(metadata_filter)
    if config.self_query:
        from raglite_tpu.extract import self_query_filter

        metadata_filter = {**self_query_filter(query, config=config), **(metadata_filter or {})}
    index = keyword_index_from_config(config)
    # Tombstoned chunks are masked twice over: the keyword index masks its
    # own dead ordinals (and amortizes postings rebuilds at >30% dead,
    # KeywordIndex._sync_locked); the store's alive mask covers any sync
    # lag.  The dense index masks via its device valid bits.
    chunk_mask = _chunk_mask(store, metadata_filter) if metadata_filter else store.alive_mask()
    ids, scores = index.search(query, num_hits=num_results, chunk_mask=chunk_mask)
    return ids[:num_results], scores[:num_results]


def keyword_search_batch(
    queries: list[str],
    *,
    num_results: int = 3,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> list[tuple[list[ChunkId], list[float]]]:
    """Batched BM25: one segment-sum + top_k device program scores all B
    queries (ops/bm25.py:bm25_topk_batch; no reference analogue — its SQL
    engine executes per query)."""
    config = config or RAGLiteConfig()
    if config.self_query:
        # Per-query LLM filter extraction: fall back to single-query calls
        # (matching keyword_search semantics) instead of dropping filters.
        return [
            keyword_search(
                query, num_results=num_results,
                metadata_filter=metadata_filter, config=config,
            )
            for query in queries
        ]
    store = store_from_config(config)
    metadata_filter = adapt_metadata(metadata_filter)
    index = keyword_index_from_config(config)
    chunk_mask = _chunk_mask(store, metadata_filter) if metadata_filter else store.alive_mask()
    results = index.search_batch(queries, num_hits=num_results, chunk_mask=chunk_mask)
    return [(ids[:num_results], scores[:num_results]) for ids, scores in results]


def reciprocal_rank_fusion(
    rankings: list[list[ChunkId]], *, k: int = 60, weights: list[float] | None = None
) -> tuple[list[ChunkId], list[float]]:
    """Weighted RRF (reference: _search.py:233-254)."""
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        msg = "The number of weights must match the number of rankings."
        raise ValueError(msg)
    score: defaultdict[str, float] = defaultdict(float)
    for ranking, weight in zip(rankings, weights):
        for i, chunk_id in enumerate(ranking):
            score[chunk_id] += weight / (k + i)
    if not score:
        return [], []
    ranked = sorted(score.items(), key=lambda kv: kv[1], reverse=True)
    return [cid for cid, _ in ranked], [s for _, s in ranked]


def _hybrid_fused_batch(  # noqa: PLR0913
    queries: list[str],
    *,
    num_results: int,
    oversample: int,
    vector_search_weight: float,
    keyword_search_weight: float,
    metadata_filter: MetadataFilter | None,
    config: RAGLiteConfig,
) -> list[tuple[list[ChunkId], list[float]]] | None:
    """Device-fused hybrid search: dense scan + resident BM25 + weighted RRF
    chained into device programs with ONE host fetch per <=256-query block
    (the reference fuses on the host with a Python dict loop,
    /root/reference/src/raglite/_search.py:233-280; round 3 kept that loop
    and it was the measured hybrid latency floor).

    Returns None when the fused path cannot serve the batch (resident
    postings disabled, a query over RESIDENT_MAX_TERMS unique terms) — the
    caller falls back to the two-fetch host-RRF path, which handles every
    input.  Output matches the host oracle exactly (ops/rrf.py documents the
    rank/tie parity argument).
    """
    from raglite_tpu.index.dense import ORDINAL_BITCAST_THRESHOLD
    from raglite_tpu.ops.rrf import rrf_fuse_topk

    store = store_from_config(config)
    dense = dense_index_from_config(config)
    kw = keyword_index_from_config(config)
    n = len(kw.chunk_ids)
    if dense.num_rows == 0 or n == 0:
        return [([], []) for _ in queries]
    # Both indexes sync from the same store immediately above, so their
    # ordinal spaces are both prefix-aligned copies of store.chunk_order;
    # equal lengths imply identical id lists (an O(n) list compare per call
    # would cost more than the search).  RAGLITE_TPU_DEBUG_ALIGN=1 upgrades
    # this to the full compare: if a future index ever syncs differently,
    # the fusion would silently return wrong ids.
    if len(dense.chunk_ids) != n:
        return None
    if os.environ.get("RAGLITE_TPU_DEBUG_ALIGN") and dense.chunk_ids != kw.chunk_ids:
        raise AssertionError(
            "dense/keyword index ordinal spaces diverged: fused hybrid would "
            "map ordinals to wrong chunk ids"
        )
    term_ids = kw.resident_prepare(queries)
    if term_ids is None:
        return None
    embeddings = embed_queries(queries, config=config).astype(np.float32)
    adapter = (
        store.index_metadata.get("query_adapter")
        if config.vector_search_query_adapter
        else None
    )
    cmask = None
    if metadata_filter:
        cmask = _chunk_mask(store, metadata_filter)
        if not cmask.any():
            return [([], []) for _ in queries]
    kw_mask, masked = kw.resident_device_mask(cmask)
    row_mask = cmask[dense.row_chunk] if cmask is not None else None
    # Per-side candidate depth and the dense sub-vector oversample match the
    # host path (hybrid_search -> vector_search with its default oversample).
    k_each = oversample * num_results
    num_hits = corrected_num_hits(4, k_each, config)
    bitcast = dense.num_rows > ORDINAL_BITCAST_THRESHOLD
    results: list[tuple[list[ChunkId], list[float]]] = []
    for start in range(0, len(queries), 256):
        b = min(256, len(queries) - start)
        # Both sides pad the block to the same pow2 so their [2, B, k]
        # results align and every shape bucket compiles once.
        b_pad = 1
        while b_pad < b:
            b_pad *= 2
        q_block = embeddings[start : start + b]
        if b_pad != b:
            q_block = np.pad(q_block, ((0, b_pad - b), (0, 0)))
        dense_packed = dense.search_chunks_device(
            q_block,
            num_hits=min(num_hits, dense.num_rows),
            num_results=min(k_each, n),
            row_mask=row_mask,
            adapter=adapter,
        )
        kw_packed = kw.resident_block_device(
            term_ids[start : start + b],
            num_hits=min(k_each, n),
            mask=kw_mask,
            masked=masked,
        )
        fused = rrf_fuse_topk(
            dense_packed,
            kw_packed,
            num_chunks=n,
            num_results=num_results,
            w_dense=vector_search_weight,
            w_kw=keyword_search_weight,
            dense_bitcast=bitcast,
        )
        packed = np.asarray(fused)  # ONE fetch for the whole block
        scores_b = packed[0]
        ords_b = np.ascontiguousarray(packed[1]).view(np.int32)
        for i in range(b):
            # ops/rrf.py pins empty/out-of-range slots to -1; the upper bound
            # here is belt-and-braces so a kernel regression degrades to a
            # short result list instead of a host IndexError.
            keep = (ords_b[i] >= 0) & (ords_b[i] < n)
            results.append(
                (
                    [kw.chunk_ids[int(o)] for o in ords_b[i][keep]],
                    [float(s) for s in scores_b[i][keep]],
                )
            )
    return results


def hybrid_search(  # noqa: PLR0913
    query: str,
    *,
    num_results: int = 3,
    oversample: int = 2,
    vector_search_weight: float = 0.75,
    keyword_search_weight: float = 0.25,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> tuple[list[ChunkId], list[float]]:
    """Vector + keyword search fused with RRF (reference: _search.py:257-280).

    The common path runs entirely on device — dense scan, resident BM25,
    and weighted RRF chained into device programs with one host fetch
    (:func:`_hybrid_fused_batch`); the host-RRF fallback covers inputs the
    resident postings can't serve.
    """
    config = config or RAGLiteConfig()
    metadata_filter = adapt_metadata(metadata_filter)
    fused_config = config
    if config.self_query:
        from dataclasses import replace

        from raglite_tpu.extract import self_query_filter

        # Merge the LLM-extracted filter up front so the fused path (and the
        # fallback searches below) see it exactly once.
        metadata_filter = {**self_query_filter(query, config=config), **(metadata_filter or {})}
        fused_config = replace(config, self_query=False)
        config = fused_config
    fused = _hybrid_fused_batch(
        [query],
        num_results=num_results,
        oversample=oversample,
        vector_search_weight=vector_search_weight,
        keyword_search_weight=keyword_search_weight,
        metadata_filter=metadata_filter,
        config=fused_config,
    )
    if fused is not None:
        return fused[0]
    vs_ids, _ = vector_search(
        query, num_results=oversample * num_results, metadata_filter=metadata_filter, config=config
    )
    ks_ids, _ = keyword_search(
        query, num_results=oversample * num_results, metadata_filter=metadata_filter, config=config
    )
    ids, scores = reciprocal_rank_fusion(
        [vs_ids, ks_ids], weights=[vector_search_weight, keyword_search_weight]
    )
    return ids[:num_results], scores[:num_results]


def hybrid_search_batch(  # noqa: PLR0913
    queries: list[str],
    *,
    num_results: int = 3,
    oversample: int = 2,
    vector_search_weight: float = 0.75,
    keyword_search_weight: float = 0.25,
    metadata_filter: MetadataFilter | None = None,
    config: RAGLiteConfig | None = None,
) -> list[tuple[list[ChunkId], list[float]]]:
    """Batched :func:`hybrid_search`: dense scan + resident BM25 + device
    RRF chained per 256-query block with one host fetch each (fused path);
    the fallback runs the two batched halves and fuses on the host."""
    config = config or RAGLiteConfig()
    if not queries:
        return []
    if not config.self_query:
        fused = _hybrid_fused_batch(
            queries,
            num_results=num_results,
            oversample=oversample,
            vector_search_weight=vector_search_weight,
            keyword_search_weight=keyword_search_weight,
            metadata_filter=adapt_metadata(metadata_filter),
            config=config,
        )
        if fused is not None:
            return fused
    vector_results = vector_search_batch(
        queries,
        num_results=oversample * num_results,
        metadata_filter=metadata_filter,
        config=config,
    )
    keyword_results = keyword_search_batch(
        queries,
        num_results=oversample * num_results,
        metadata_filter=metadata_filter,
        config=config,
    )
    results: list[tuple[list[ChunkId], list[float]]] = []
    for (vs_ids, _), (ks_ids, _) in zip(vector_results, keyword_results):
        ids, scores = reciprocal_rank_fusion(
            [vs_ids, ks_ids], weights=[vector_search_weight, keyword_search_weight]
        )
        results.append((ids[:num_results], scores[:num_results]))
    return results


def retrieve_chunks(
    chunk_ids: list[ChunkId], *, config: RAGLiteConfig | None = None
) -> list[Chunk]:
    """Fetch chunks by id, preserving input order (reference: _search.py:283-299)."""
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    chunks = [c for cid in chunk_ids if (c := store.get_chunk(cid)) is not None]
    return chunks


def retrieve_chunk_spans(
    chunk_ids: list[ChunkId] | list[Chunk],
    *,
    neighbors: tuple[int, ...] | None = (-1, 1),
    config: RAGLiteConfig | None = None,
) -> list[ChunkSpan]:
    """Group chunks (plus neighbors) into contiguous spans, ranked by the
    aggregate reciprocal rank of their seed chunks (reference: _search.py:302-361)."""
    if not chunk_ids:
        return []
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    chunks: list[Chunk] = (
        retrieve_chunks(chunk_ids, config=config)  # type: ignore[arg-type]
        if all(isinstance(c, str) for c in chunk_ids)
        else [store.get_chunk(c.id) or c for c in chunk_ids]  # type: ignore[union-attr]
    )
    chunk_id_to_score = {chunk.id: 1 / (i + 1) for i, chunk in enumerate(chunks)}
    if neighbors:
        extended = list(chunks)
        for chunk in chunks:
            extended.extend(store.neighbor_chunks(chunk, tuple(neighbors)))
        chunks = extended
    unique_chunks = sorted(set(chunks), key=lambda c: (c.document_id, c.index))
    spans: list[ChunkSpan] = []
    for _, group in groupby(unique_chunks, key=lambda c: c.document_id):
        seq: list[Chunk] = []
        for chunk in group:
            if not seq or chunk.index == seq[-1].index + 1:
                seq.append(chunk)
            else:
                spans.append(ChunkSpan(chunks=seq))
                seq = [chunk]
        spans.append(ChunkSpan(chunks=seq))
    spans.sort(
        key=lambda span: sum(chunk_id_to_score.get(c.id, 0.0) for c in span.chunks),
        reverse=True,
    )
    return spans


def _rank_with_chunklet_maxsim(
    query: str, chunks: list[Chunk], config: RAGLiteConfig
) -> list[Chunk]:
    """Device late-interaction rerank over the chunks' multi-vector matrices.

    These are the SAME chunklet sub-vectors the dense scan's group-max
    already ranked, so this ranker cannot add information beyond re-scoring
    a fused/reversed candidate list against the dense signal — it is the
    cheap fallback for encoders without token-level outputs (and the r3
    default, measured quality-NEUTRAL in IRBENCH_r03)."""
    query_matrix = embed_strings([query], config=config).astype(np.float32)
    matrices = []
    for chunk in chunks:
        try:
            matrices.append(chunk.embedding_matrix.astype(np.float32))
        except ValueError:
            matrices.append(np.zeros((1, query_matrix.shape[1]), dtype=np.float32))
    order, _ = maxsim_rank(query_matrix, matrices)
    return [chunks[int(i)] for i in order]


def _l2_rows(matrix: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    return (matrix / np.maximum(norms, 1e-12)).astype(np.float32)


# Token matrices are recomputed at rerank time (the candidate set is tiny —
# oversample*num_results), then cached by content-hash chunk id so repeated
# queries over a warm corpus skip the encode entirely.  ~32 chunks x ~512
# tokens x 512 dims x 4 B = 32 MB at the cap.
_TOKEN_MATRIX_CACHE: "dict[tuple[str, str], np.ndarray]" = {}
_TOKEN_MATRIX_CACHE_CAP = 1024


def _rank_with_token_maxsim(
    query: str, chunks: list[Chunk], config: RAGLiteConfig
) -> list[Chunk]:
    """True ColBERT-style late-interaction rerank: query-token x
    candidate-token MaxSim over the candidates' raw text.

    Unlike the chunklet ranker above, the token matrices are a genuinely NEW
    signal at rerank time — per-token similarities the pooled chunklet
    vectors destroyed — which is what lets rerank improve on the dense
    ranking (the role of the reference's cross-encoders,
    /root/reference/src/raglite/_search.py:364-397, whose test asserts rank
    improvement, tests/test_rerank.py:43-70).  Candidate token embeddings
    are recomputed in one batched encode (models/encoder.py:
    embed_token_level_batch) and cached by content-hash chunk id; scoring is
    one fused device program (ops/maxsim.py)."""
    from raglite_tpu.models.encoder import encoder_from_config

    encoder = encoder_from_config(config)
    if not getattr(encoder, "supports_token_embeddings", False):
        return _rank_with_chunklet_maxsim(query, chunks, config)
    if hasattr(encoder, "rerank_maxsim"):
        # Fused on-device path: encode + L2 + MaxSim in one program per
        # candidate tile, fetching only [C] scores — the host-matrix path
        # below moves the full [C, T, d] hidden states host<->device twice
        # (measured 2.6 s per 32 long candidates through the dev tunnel vs
        # ~tens of ms fused).
        scores = encoder.rerank_maxsim(query, [str(chunk) for chunk in chunks])
        order = np.argsort(-scores, kind="stable")
        return [chunks[int(i)] for i in order]
    # Touch hits (re-insert to refresh recency) BEFORE eviction runs below:
    # the cache is insertion-ordered, so without the touch a chunk cached by
    # an earlier query keeps its old position and can be evicted by this
    # call's own inserts right before the lookup at the bottom.
    for chunk in chunks:
        key = (config.embedder, chunk.id)
        if key in _TOKEN_MATRIX_CACHE:
            _TOKEN_MATRIX_CACHE[key] = _TOKEN_MATRIX_CACHE.pop(key)
    missing = [
        chunk
        for chunk in chunks
        if (config.embedder, chunk.id) not in _TOKEN_MATRIX_CACHE
    ]
    if missing:
        texts = [str(chunk) for chunk in missing]
        if hasattr(encoder, "embed_token_level_batch"):
            mats = encoder.embed_token_level_batch(texts)
        else:
            mats = [encoder.embed_token_level(t) for t in texts]
        for chunk, matrix in zip(missing, mats):
            if matrix.shape[0] == 0:
                matrix = np.zeros((1, encoder.dim), dtype=np.float32)
            _TOKEN_MATRIX_CACHE[(config.embedder, chunk.id)] = _l2_rows(matrix)
    # Gather BEFORE eviction so a candidate list larger than the cap can
    # never evict its own entries out from under the lookup.
    candidate_matrices = [
        _TOKEN_MATRIX_CACHE[(config.embedder, chunk.id)] for chunk in chunks
    ]
    while len(_TOKEN_MATRIX_CACHE) > _TOKEN_MATRIX_CACHE_CAP:
        _TOKEN_MATRIX_CACHE.pop(next(iter(_TOKEN_MATRIX_CACHE)))
    query_matrix = encoder.embed_token_level(query)
    if query_matrix.shape[0] == 0:
        return chunks
    order, _ = maxsim_rank(_l2_rows(query_matrix), candidate_matrices)
    return [chunks[int(i)] for i in order]


def _blend_with_retrieval_order(
    retrieval: "list[Chunk]", reranked: "list[Chunk]", blend: float, *, k: int = 60
) -> "list[Chunk]":
    """Reciprocal-rank fusion of the reranker's order with the incoming
    retrieval order (``config.reranker_blend``; same k=60 as hybrid RRF).

    blend=0 returns the reranker's order untouched, blend=1 the retrieval
    order; ties (identical fused scores) resolve to the reranker's order
    (stable sort over ``reranked``)."""
    if blend <= 0.0 or len(reranked) <= 1:
        return reranked
    if blend >= 1.0:
        return list(retrieval)
    score: dict[str, float] = {
        c.id: (1.0 - blend) / (k + r) for r, c in enumerate(reranked)
    }
    for r, c in enumerate(retrieval):
        score[c.id] = score.get(c.id, 0.0) + blend / (k + r)
    return sorted(reranked, key=lambda c: -score[c.id])


def rerank_chunks(
    query: str, chunk_ids: list[ChunkId] | list[Chunk], *, config: RAGLiteConfig | None = None
) -> list[Chunk]:
    """Rerank chunks by relevance (reference: _search.py:364-397).

    The reranker is selected per language from ``config.reranker``.
    Built-ins (both fused device programs, ops/maxsim.py):

    - ``"maxsim"`` — token-level ColBERT-style late interaction over the
      candidates' raw text (the default; adds a genuinely new per-token
      signal, like the reference's cross-encoders);
    - ``"maxsim_chunklet"`` — MaxSim over the stored chunklet sub-vector
      matrices (cheaper; no re-encode; also the automatic fallback when the
      encoder has no token-level outputs).

    Callables with a ``rank(query=..., docs=...)`` method (the
    ``rerankers`` package interface) are also supported.
    """
    config = config or RAGLiteConfig()
    chunks: list[Chunk] = (
        retrieve_chunks(chunk_ids, config=config)  # type: ignore[arg-type]
        if all(isinstance(c, str) for c in chunk_ids)
        else list(chunk_ids)  # type: ignore[arg-type]
    )
    if not config.reranker or not chunks:
        return chunks
    reranker: Any = config.reranker
    if isinstance(reranker, dict):
        langs = {detect_language(str(chunk)) for chunk in chunks}
        langs.add(detect_language(query))
        lang = next(iter(langs)) if len(langs) == 1 else None
        reranker = reranker.get(lang) if lang and lang in reranker else reranker.get("other")
    if not reranker:
        return chunks
    if reranker == "maxsim":
        ranked = _rank_with_token_maxsim(query, chunks, config)
    elif reranker == "maxsim_chunklet":
        ranked = _rank_with_chunklet_maxsim(query, chunks, config)
    elif hasattr(reranker, "rank"):
        results = reranker.rank(query=query, docs=[str(chunk) for chunk in chunks])
        ranked = [chunks[result.doc_id] for result in results.results]
    elif callable(reranker):
        ranked = list(reranker(query, chunks))
    else:
        msg = f"unsupported reranker {reranker!r}"
        raise ValueError(msg)
    return _blend_with_retrieval_order(chunks, ranked, config.reranker_blend)


def search_and_rerank_chunks(  # noqa: PLR0913
    query: str,
    *,
    num_results: int = 8,
    oversample: int = 4,
    search: BasicSearchMethod = hybrid_search,
    config: RAGLiteConfig | None = None,
    metadata_filter: MetadataFilter | None = None,
) -> list[Chunk]:
    """Oversampled search + rerank + truncate (reference: _search.py:400-415)."""
    chunk_ids, _ = search(
        query, num_results=oversample * num_results, metadata_filter=metadata_filter, config=config
    )
    return rerank_chunks(query, chunk_ids, config=config)[:num_results]


def search_and_rerank_chunk_spans(  # noqa: PLR0913
    query: str,
    *,
    num_results: int = 8,
    oversample: int = 4,
    neighbors: tuple[int, ...] | None = (-1, 1),
    search: BasicSearchMethod = hybrid_search,
    config: RAGLiteConfig | None = None,
    metadata_filter: MetadataFilter | None = None,
) -> list[ChunkSpan]:
    """Search, rerank, and collate into spans (reference: _search.py:418-433)."""
    chunk_ids, _ = search(
        query, num_results=oversample * num_results, metadata_filter=metadata_filter, config=config
    )
    chunks = rerank_chunks(query, chunk_ids, config=config)[:num_results]
    return retrieve_chunk_spans(chunks, neighbors=neighbors, config=config)
