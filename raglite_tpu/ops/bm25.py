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


@partial(
    jax.jit,
    static_argnames=("num_chunks", "lcap", "num_hits", "exact_topk", "masked"),
)
def bm25_topk_resident(
    offsets: jax.Array,  # [V+1] int32 CSR offsets over (truncated) postings
    post_chunk: jax.Array,  # [P+pad] int32 chunk ordinal per posting (HBM)
    post_w: jax.Array,  # [P+pad] fp32 PRECOMPUTED Okapi weight per posting
    mask: jax.Array,  # [num_chunks] bool (metadata filter) or [1] dummy
    term_ids: jax.Array,  # [B, T] int32 query term ids, padded with -1
    *,
    num_chunks: int,
    lcap: int,  # power-of-two postings width >= max df among the terms
    num_hits: int,
    exact_topk: bool = False,
    masked: bool = False,
) -> jax.Array:  # [2, B, k]: scores; ordinals (bitcast int32)
    """Device-resident BM25: postings stay in HBM; a query uploads ONLY its
    term ids [B, T] (a few hundred bytes).

    Round-3 redesign, arrived at by measurement at 625k chunks / 7.5M
    postings on v5e (B=256 tail queries, T=4):

    - The host-gather path shipped every batch's postings host->device
      (~16 MB / 1 s through the dev tunnel) and recompiled per ragged pad.
    - A [B, N] scatter-add on device serialized: 314 QPS end-to-end.
    - A flat device gather `post[lo + arange]` is lowered as 8.4M-element
      random gather: 51 ms (the gather, not the sort, dominated).
    - A T-way sorted-list merge via vectorized binary search was 10x WORSE
      (1.8 s): per-element take_along_axis steps are the slowest primitive
      of all on TPU.

    What ships: the per-posting Okapi weight ``w = idf * tf * (K1+1) /
    (tf + K1 * len_norm[chunk])`` is fully determined at BUILD time, so it
    is precomputed and resident — query time reads NO tf/idf/len_norm at
    all.  Each (query, term) fetches its contiguous postings slice with
    ``lax.map``-chained ``dynamic_slice`` DMAs (x8 unrolled; 7.9 ms vs the
    35.7 ms flat gather), then one [B, T*lcap] bitonic sort groups chunk
    ids and a segmented Hillis-Steele scan (segments <= T, so
    ceil(log2(T)) exact shift-adds) sums duplicate chunks; ``approx_max_k``
    ranks.  Over-cap terms were truncated to their highest-impact postings
    at build (impact-ordered early termination — only stopword-class terms
    lose postings, and deletes re-zero their weights on refresh).

    ``masked=True`` additionally gathers a [num_chunks] bool metadata
    filter per posting (the filtered-search path; costs one random gather).
    ``exact_topk=False`` ranks with the TPU's hardware ``approx_max_k``
    (recall_target=0.99); the host caller re-sorts the k winners so output
    ordering matches the exact program.
    """
    batch, T = term_ids.shape
    t = jnp.maximum(term_ids, 0)
    lo = offsets[t]  # [B, T]
    df = offsets[t + 1] - lo
    take = jnp.where(term_ids >= 0, jnp.minimum(df, lcap), 0)
    flat_lo = lo.reshape(-1)
    flat_take = take.reshape(-1)
    pad = (-flat_lo.shape[0]) % 8
    if pad:
        zero = jnp.zeros((pad,), jnp.int32)
        flat_lo = jnp.concatenate([flat_lo, zero])
        flat_take = jnp.concatenate([flat_take, zero])
    ar = jnp.arange(lcap, dtype=jnp.int32)

    def fetch8(args):
        los, takes = args
        ks, ws = [], []
        for i in range(8):
            c = jax.lax.dynamic_slice(post_chunk, (los[i],), (lcap,))
            w = jax.lax.dynamic_slice(post_w, (los[i],), (lcap,))
            valid = ar < takes[i]
            ks.append(jnp.where(valid, c, jnp.int32(num_chunks)))
            ws.append(jnp.where(valid, w, 0.0))
        return jnp.stack(ks), jnp.stack(ws)

    keys, vals = jax.lax.map(fetch8, (flat_lo.reshape(-1, 8), flat_take.reshape(-1, 8)))
    keys = keys.reshape(-1, lcap)[: batch * T].reshape(batch, T * lcap)
    vals = vals.reshape(-1, lcap)[: batch * T].reshape(batch, T * lcap)
    if masked:
        ok = mask[jnp.minimum(keys, num_chunks - 1)] & (keys < num_chunks)
        vals = jnp.where(ok, vals, 0.0)
    keys, vals = jax.lax.sort((keys, vals), dimension=-1, num_keys=1)
    step = 1
    while step < T:
        same = keys[:, step:] == keys[:, :-step]
        vals = vals.at[:, step:].add(jnp.where(same, vals[:, :-step], 0.0))
        step *= 2
    is_end = jnp.concatenate(
        [keys[:, 1:] != keys[:, :-1], jnp.ones((batch, 1), bool)], axis=-1
    )
    scores = jnp.where(is_end & (keys < num_chunks), vals, -1.0)
    k = min(num_hits, T * lcap)
    if exact_topk:
        top_scores, pos = jax.lax.top_k(scores, k)
    else:
        top_scores, pos = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    top_keys = jnp.take_along_axis(keys, pos, axis=-1)
    ordinals = jnp.where(top_scores > 0.0, top_keys, num_chunks)
    # Pack (scores, ordinals) into ONE array so the host needs a single
    # device fetch (each fetch is a full RPC round trip through the dev
    # tunnel, and a PCIe D2H on production hosts).
    return jnp.stack(
        [top_scores, jax.lax.bitcast_convert_type(ordinals, jnp.float32)]
    )


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
