"""On-device weighted reciprocal-rank fusion.

The reference fuses its vector and keyword rankings with a host-side Python
dict loop (`reciprocal_rank_fusion`, /root/reference/src/raglite/_search.py:
233-254).  Round 3 kept that loop: `hybrid_search` ran TWO device programs,
fetched both packed results, materialized ~2*oversample*k id strings per
query, and fused on the host — the measured hybrid floor.  Here the fusion
is one jitted device program over the two candidate (ordinal, rank) sets, so
a hybrid batch costs ONE host fetch of the final packed [2, B, k] result.

Rank semantics match the host oracle exactly:

- the dense list arrives descending from top_k with -inf/-1 empty slots at
  the tail, so valid entries' positions ARE their compacted ranks;
- the keyword list arrives as (possibly unordered) approx_max_k winners and
  is sorted (score desc, ordinal asc) on device — the same lexsort the host
  path applies — after which invalid (score<=0) slots sink to the tail and
  valid positions are compacted ranks;
- fused score = w_d/(K+rank_d) + w_k/(K+rank_k), with chunks present in only
  one list contributing only that term;
- final top_k tie-breaking: dense-section entries precede keyword-only
  entries, matching the host dict's insertion order under Python's stable
  sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["rrf_fuse_topk"]


@partial(
    jax.jit,
    static_argnames=("num_chunks", "num_results", "rrf_k", "dense_bitcast"),
)
def rrf_fuse_topk(
    dense_packed: jax.Array,  # [2, B, K1] from DenseIndex.search_chunks_device
    kw_packed: jax.Array,  # [2, B, K2] from bm25_topk_resident
    *,
    num_chunks: int,
    num_results: int,
    w_dense: float = 0.75,
    w_kw: float = 0.25,
    rrf_k: int = 60,
    dense_bitcast: bool = False,
) -> jax.Array:
    """Fuse two packed candidate sets with weighted RRF, on device.

    Returns one packed [2, B, num_results] array: fused scores and chunk
    ordinals (bitcast int32; -1 for empty slots) — a single device->host
    transfer for the whole hybrid batch (replaces the reference's host RRF,
    _search.py:233-280).
    """
    d_scores = dense_packed[0]  # [B, K1] descending, -inf empties at tail
    if dense_bitcast:
        d_ord = jax.lax.bitcast_convert_type(dense_packed[1], jnp.int32)
    else:
        d_ord = dense_packed[1].astype(jnp.int32)  # exact below 2^24
    k_scores_raw = kw_packed[0]
    k_ord_raw = jax.lax.bitcast_convert_type(kw_packed[1], jnp.int32)
    # Host-lexsort parity: score desc, ordinal asc; invalid slots sink.
    neg, k_ord = jax.lax.sort((-k_scores_raw, k_ord_raw), dimension=-1, num_keys=2)
    k_scores = -neg
    # Both sides are guarded against out-of-range ordinals, not just -1
    # empties: TPU approx_max_k / padded-tile kernels can surface a padding
    # slot's index with a finite score, and an unguarded ordinal would be
    # fused and then crash the host id lookup.
    d_valid = (d_ord >= 0) & (d_ord < num_chunks)
    k_valid = (k_scores > 0.0) & (k_ord >= 0) & (k_ord < num_chunks)
    k1 = d_ord.shape[1]
    k2 = k_ord.shape[1]
    d_contrib = jnp.where(
        d_valid, w_dense / (rrf_k + jnp.arange(k1, dtype=jnp.float32))[None, :], 0.0
    )
    k_contrib = jnp.where(
        k_valid, w_kw / (rrf_k + jnp.arange(k2, dtype=jnp.float32))[None, :], 0.0
    )
    # [B, K1, K2] candidate-set join: tiny (K <= ~64 per side).
    match = (
        (d_ord[:, :, None] == k_ord[:, None, :])
        & d_valid[:, :, None]
        & k_valid[:, None, :]
    )
    dense_total = d_contrib + jnp.sum(
        jnp.where(match, k_contrib[:, None, :], 0.0), axis=-1
    )
    k_matched = jnp.any(match, axis=1)  # [B, K2]
    fused_d = jnp.where(d_valid, dense_total, -jnp.inf)
    fused_k = jnp.where(k_valid & ~k_matched, k_contrib, -jnp.inf)
    scores_cat = jnp.concatenate([fused_d, fused_k], axis=1)  # [B, K1+K2]
    ords_cat = jnp.concatenate([d_ord, k_ord], axis=1)
    top_scores, pos = jax.lax.top_k(scores_cat, min(num_results, k1 + k2))
    top_ords = jnp.take_along_axis(ords_cat, pos, axis=1)
    top_ords = jnp.where(jnp.isneginf(top_scores), -1, top_ords)
    return jnp.stack(
        [top_scores, jax.lax.bitcast_convert_type(top_ords, jnp.float32)]
    )
