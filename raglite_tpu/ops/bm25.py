"""On-device BM25 scoring.

The reference delegates keyword search to DuckDB's FTS extension
(`fts_main_chunk.match_bm25`, /root/reference/src/raglite/_search.py:203-225)
or Postgres ``ts_rank`` (_search.py:176-201).  Here the inverted index lives
as flat postings arrays and scoring is one jitted device program: per-posting
Okapi BM25 contributions scatter-add (segment-sum) into a dense per-chunk
score vector, followed by ``top_k``.

Okapi parameters k1=1.2, b=0.75 (DuckDB FTS defaults).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K1 = 1.2
B = 0.75

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "bm25_idf",
    "bm25_scores_batch",
    "bm25_topk_batch",
    "bm25_topk_resident",
]


def bm25_idf(df: np.ndarray, num_chunks: int) -> np.ndarray:
    """Robertson–Sparck Jones idf with the +1 floor (Lucene/DuckDB variant)."""
    return np.log(1.0 + (num_chunks - df + 0.5) / (df + 0.5))


@partial(jax.jit, static_argnames=("num_chunks",))
def bm25_scores(
    posting_chunk: jax.Array,  # [P] int32 chunk ordinal per posting (padded with num_chunks)
    posting_tf: jax.Array,  # [P] fp32 term frequency (0 for padding)
    posting_idf: jax.Array,  # [P] fp32 idf of the posting's term
    len_norm: jax.Array,  # [num_chunks] fp32: (1 - b) + b * len/avg_len
    *,
    num_chunks: int,
) -> jax.Array:
    """Dense BM25 scores [num_chunks] for one query's gathered postings."""
    denom = posting_tf + K1 * len_norm[jnp.minimum(posting_chunk, num_chunks - 1)]
    contrib = posting_idf * posting_tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
    return jax.ops.segment_sum(contrib, posting_chunk, num_segments=num_chunks + 1)[:-1]


@partial(jax.jit, static_argnames=("num_chunks", "batch"))
def bm25_scores_batch(
    posting_chunk: jax.Array,  # [P] int32 chunk ordinal (padding: num_chunks)
    posting_query: jax.Array,  # [P] int32 query index per posting
    posting_tf: jax.Array,  # [P] fp32 (0 for padding)
    posting_idf: jax.Array,  # [P] fp32
    len_norm: jax.Array,  # [num_chunks] fp32
    *,
    num_chunks: int,
    batch: int,
) -> jax.Array:
    """Dense BM25 scores [batch, num_chunks] for B queries' postings in ONE
    2-D scatter-add.  This is the [B]-batched device scoring round-1 lacked
    (hybrid_search_batch looped keyword search per query on the host).

    A flat segment id (query * (num_chunks+1) + chunk) would overflow int32
    at ~2^31 / corpus-size queries — at the 10M-chunk design point that is
    batch ≈ 215, silently zeroing those queries' scores; the 2-D scatter
    has no such cliff."""
    denom = posting_tf + K1 * len_norm[jnp.minimum(posting_chunk, num_chunks - 1)]
    contrib = posting_idf * posting_tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
    scores = jnp.zeros((batch, num_chunks + 1), jnp.float32)
    scores = scores.at[posting_query, posting_chunk].add(contrib)
    return scores[:, :num_chunks]


@partial(jax.jit, static_argnames=("num_chunks", "batch", "num_hits"))
def bm25_topk_batch(
    posting_chunk: jax.Array,
    posting_query: jax.Array,
    posting_tf: jax.Array,
    posting_idf: jax.Array,
    len_norm: jax.Array,
    *,
    num_chunks: int,
    batch: int,
    num_hits: int,
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores_batch(
        posting_chunk, posting_query, posting_tf, posting_idf, len_norm,
        num_chunks=num_chunks, batch=batch,
    )
    return jax.lax.top_k(scores, num_hits)


@partial(jax.jit, static_argnames=("num_chunks", "lcap", "num_hits", "exact_topk"))
def bm25_topk_resident(
    offsets: jax.Array,  # [V+1] int32 CSR term offsets (device-resident)
    post_chunk: jax.Array,  # [P] int32 chunk ordinal per posting (resident)
    post_tf: jax.Array,  # [P] fp32 term frequency (resident)
    idf: jax.Array,  # [V] fp32 per-term idf (resident)
    len_norm: jax.Array,  # [num_chunks] fp32 (resident)
    mask: jax.Array,  # [num_chunks] bool: alive AND optional metadata filter
    term_ids: jax.Array,  # [B, T] int32 query term ids, padded with -1
    *,
    num_chunks: int,
    lcap: int,
    num_hits: int,
    exact_topk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Device-resident BM25: postings stay in HBM; a query uploads ONLY its
    term ids [B, T] (a few hundred bytes).

    Round-3 redesign: the gather-on-host path shipped every query batch's
    postings host->device (~16 MB per 256-query batch — 1 s through the dev
    tunnel, and on production hosts still PCIe traffic + per-batch-size
    recompiles from the ragged postings pad).  Here the gather itself runs
    on device from the CSR offsets: idx = offsets[term] + arange(lcap),
    masked at the term's df.  Terms with df > lcap contribute their lcap
    highest-IMPACT postings only (the build sorts each term's postings by
    Okapi impact, descending), the classic impact-ordered early-termination
    — only stopword-class terms truncate, and their per-posting impact is
    idf-floored.  All shapes are static: one compile per (B, T) bucket.

    ``exact_topk=False`` ranks with the TPU's hardware ``approx_max_k``
    (recall_target=0.99, measured ~2x faster than full top_k at 625k
    chunks); the host caller re-sorts the k winners so output ordering
    matches the exact program.
    """
    batch, T = term_ids.shape
    t = jnp.maximum(term_ids, 0)
    lo = offsets[t]  # [B, T]
    df = offsets[t + 1] - lo
    take = jnp.minimum(df, lcap)
    ar = jnp.arange(lcap, dtype=jnp.int32)
    in_range = (ar[None, None, :] < take[..., None]) & (term_ids >= 0)[..., None]
    idx = jnp.where(in_range, lo[..., None] + ar[None, None, :], 0)
    chunk = post_chunk[idx]  # [B, T, L]
    tfv = post_tf[idx]
    ln = len_norm[jnp.minimum(chunk, num_chunks - 1)]
    contrib = idf[t][..., None] * tfv * (K1 + 1.0) / jnp.maximum(tfv + K1 * ln, 1e-9)
    live = in_range & mask[jnp.minimum(chunk, num_chunks - 1)]
    contrib = jnp.where(live, contrib, 0.0)
    # One 2-D scatter-add into [B, num_chunks+1]; masked entries land on the
    # sink row num_chunks.
    rows = jnp.broadcast_to(jnp.arange(batch, dtype=jnp.int32)[:, None, None], chunk.shape)
    cols = jnp.where(live, chunk, num_chunks)
    scores = jnp.zeros((batch, num_chunks + 1), jnp.float32)
    scores = scores.at[rows, cols].add(contrib)[:, :num_chunks]
    if exact_topk:
        return jax.lax.top_k(scores, num_hits)
    return jax.lax.approx_max_k(scores, num_hits, recall_target=0.99)


@partial(jax.jit, static_argnames=("num_chunks", "num_hits"))
def bm25_topk(
    posting_chunk: jax.Array,
    posting_tf: jax.Array,
    posting_idf: jax.Array,
    len_norm: jax.Array,
    *,
    num_chunks: int,
    num_hits: int,
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores(
        posting_chunk, posting_tf, posting_idf, len_norm, num_chunks=num_chunks
    )
    return jax.lax.top_k(scores, num_hits)
