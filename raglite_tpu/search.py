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
- ``rerank_chunks``: late-interaction MaxSim on device (ops/maxsim.py)
  selected per language, instead of ONNX cross-encoders.
"""

from __future__ import annotations

import logging
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
    keep = chunk_ordinals[0] >= 0
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
        keep = chunk_ordinals[b] >= 0
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
    """Vector + keyword search fused with RRF (reference: _search.py:257-280)."""
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
    """Batched :func:`hybrid_search`: the dense half runs as one fused
    device scan for all queries (vector_search_batch), the keyword half as
    one batched BM25 program (keyword_search_batch); only the tiny RRF fuse
    stays on the host."""
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


def _rank_with_maxsim(query: str, chunks: list[Chunk], config: RAGLiteConfig) -> list[Chunk]:
    """Device late-interaction rerank over the chunks' multi-vector matrices."""
    query_matrix = embed_strings([query], config=config).astype(np.float32)
    matrices = []
    for chunk in chunks:
        try:
            matrices.append(chunk.embedding_matrix.astype(np.float32))
        except ValueError:
            matrices.append(np.zeros((1, query_matrix.shape[1]), dtype=np.float32))
    order, _ = maxsim_rank(query_matrix, matrices)
    return [chunks[int(i)] for i in order]


def rerank_chunks(
    query: str, chunk_ids: list[ChunkId] | list[Chunk], *, config: RAGLiteConfig | None = None
) -> list[Chunk]:
    """Rerank chunks by relevance (reference: _search.py:364-397).

    The reranker is selected per language from ``config.reranker``; the
    built-in "maxsim" reranker runs on device, while callables with a
    ``rank(query=..., docs=...)`` method (the ``rerankers`` package
    interface) are also supported.
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
        return _rank_with_maxsim(query, chunks, config)
    if hasattr(reranker, "rank"):
        results = reranker.rank(query=query, docs=[str(chunk) for chunk in chunks])
        return [chunks[result.doc_id] for result in results.results]
    if callable(reranker):
        return list(reranker(query, chunks))
    msg = f"unsupported reranker {reranker!r}"
    raise ValueError(msg)


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
