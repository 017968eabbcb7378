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

__all__ = ["bm25_scores", "bm25_topk", "bm25_idf", "bm25_scores_batch", "bm25_topk_batch"]


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
