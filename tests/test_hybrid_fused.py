"""Device-fused hybrid search vs the host RRF oracle.

The fused path (search._hybrid_fused_batch + ops/rrf.py:rrf_fuse_topk) chains
the dense scan, resident BM25, and weighted RRF into device programs with one
host fetch; these tests pin its output to the host `reciprocal_rank_fusion`
oracle (reference semantics: /root/reference/src/raglite/_search.py:233-280).
"""

import numpy as np
import pytest

from raglite_tpu.search import reciprocal_rank_fusion


def _host_oracle(d_ords, k_scores, k_ords, n, num_results, w_d=0.75, w_k=0.25):
    """Compose the host-path result from raw candidate sets.

    Dense: positions are ranks (descending top_k output, -1 empties).
    Keyword: approx_max_k winners are unordered; the host path sorts by
    (score desc, ordinal asc) then filters score>0 & ordinal<n.
    """
    d_ids = [int(o) for o in d_ords if o >= 0]
    order = np.lexsort((k_ords, -k_scores))
    k_ids = [int(k_ords[i]) for i in order if k_scores[i] > 0.0 and k_ords[i] < n]
    ids, scores = reciprocal_rank_fusion(
        [[str(i) for i in d_ids], [str(i) for i in k_ids]], weights=[w_d, w_k]
    )
    return [int(i) for i in ids[:num_results]], scores[:num_results]


def _pack(d_scores, d_ords, k_scores, k_ords):
    import jax.lax
    import jax.numpy as jnp

    dense_packed = jnp.stack(
        [jnp.asarray(d_scores, jnp.float32), jnp.asarray(d_ords, jnp.float32)]
    )
    kw_packed = jnp.stack(
        [
            jnp.asarray(k_scores, jnp.float32),
            jax.lax.bitcast_convert_type(
                jnp.asarray(k_ords, jnp.int32), jnp.float32
            ),
        ]
    )
    return dense_packed, kw_packed


def test_rrf_kernel_matches_host_oracle_random() -> None:
    """Random candidate sets with overlap, empties, and unordered keyword
    winners: device RRF == host dict-loop oracle, ids and scores."""
    from raglite_tpu.ops.rrf import rrf_fuse_topk

    rng = np.random.default_rng(0)
    n, b, k1, k2, num_results = 500, 7, 12, 10, 8
    d_scores = np.sort(rng.normal(size=(b, k1)).astype(np.float32), axis=1)[:, ::-1]
    d_ords = np.stack([rng.choice(n, size=k1, replace=False) for _ in range(b)])
    # Blank a tail of each dense list (empty slots from group-max).
    for i in range(b):
        cut = rng.integers(3, k1 + 1)
        d_scores[i, cut:] = -np.inf
        d_ords[i, cut:] = -1
    k_scores = rng.uniform(0.1, 5.0, size=(b, k2)).astype(np.float32)
    # Half the keyword ordinals overlap the dense list (the interesting case).
    k_ords = np.stack([rng.choice(n, size=k2, replace=False) for _ in range(b)])
    for i in range(b):
        take = [o for o in d_ords[i] if o >= 0][: k2 // 2]
        k_ords[i, : len(take)] = take
        # approx_max_k winners are UNORDERED: shuffle.
        perm = rng.permutation(k2)
        k_ords[i] = k_ords[i][perm]
        k_scores[i] = k_scores[i][perm]
        # Invalidate a couple of slots (score<=0, ordinal=n_pad).
        k_scores[i, rng.integers(0, k2)] = 0.0
    fused = np.asarray(
        rrf_fuse_topk(
            *_pack(d_scores, d_ords, k_scores, k_ords),
            num_chunks=n,
            num_results=num_results,
        )
    )
    got_scores = fused[0]
    got_ords = np.ascontiguousarray(fused[1]).view(np.int32)
    for i in range(b):
        want_ids, want_scores = _host_oracle(
            d_ords[i], k_scores[i], k_ords[i], n, num_results
        )
        keep = got_ords[i] >= 0
        assert list(got_ords[i][keep]) == want_ids, i
        np.testing.assert_allclose(got_scores[i][keep], want_scores, rtol=1e-5)


def test_rrf_kernel_empty_sides() -> None:
    """One side empty: fusion degrades to the other side's weighted ranks."""
    from raglite_tpu.ops.rrf import rrf_fuse_topk

    n, k1, k2 = 100, 6, 6
    d_scores = np.full((1, k1), -np.inf, np.float32)
    d_ords = np.full((1, k1), -1, np.int64)
    k_scores = np.asarray([[3.0, 2.0, 1.0, 0.0, 0.0, 0.0]], np.float32)
    k_ords = np.asarray([[5, 9, 2, n, n, n]], np.int32)
    fused = np.asarray(
        rrf_fuse_topk(*_pack(d_scores, d_ords, k_scores, k_ords), num_chunks=n, num_results=4)
    )
    ords = np.ascontiguousarray(fused[1]).view(np.int32)[0]
    keep = ords >= 0
    assert list(ords[keep]) == [5, 9, 2]
    np.testing.assert_allclose(
        fused[0][0][keep], [0.25 / 60, 0.25 / 61, 0.25 / 62], rtol=1e-5
    )
    # Both sides empty -> all slots empty.
    fused2 = np.asarray(
        rrf_fuse_topk(
            *_pack(d_scores, d_ords, np.zeros((1, k2), np.float32), np.full((1, k2), n, np.int32)),
            num_chunks=n,
            num_results=4,
        )
    )
    assert (np.ascontiguousarray(fused2[1]).view(np.int32)[0] == -1).all()


def test_rrf_kernel_keyword_tie_order() -> None:
    """Equal keyword scores break ties by ordinal asc (host lexsort parity);
    chunks in both lists keep the dense tie-break position."""
    from raglite_tpu.ops.rrf import rrf_fuse_topk

    n = 50
    d_scores = np.asarray([[2.0, 1.0]], np.float32)
    d_ords = np.asarray([[7, 3]], np.int64)
    k_scores = np.asarray([[1.5, 1.5, 1.5, 0.0]], np.float32)
    k_ords = np.asarray([[9, 3, 1, n]], np.int32)
    fused = np.asarray(
        rrf_fuse_topk(*_pack(d_scores, d_ords, k_scores, k_ords), num_chunks=n, num_results=5)
    )
    ords = np.ascontiguousarray(fused[1]).view(np.int32)[0]
    keep = ords >= 0
    want_ids, want_scores = _host_oracle(d_ords[0], k_scores[0], k_ords[0], n, 5)
    assert list(ords[keep]) == want_ids
    np.testing.assert_allclose(fused[0][0][keep], want_scores, rtol=1e-5)


def test_hybrid_fused_matches_host_compose(raglite_test_config) -> None:
    """End-to-end: the fused device path reproduces the explicitly composed
    host path (vector_search_batch + keyword_search_batch + host RRF) on the
    golden corpus — ids exactly, scores to fp32."""
    from raglite_tpu.search import (
        _hybrid_fused_batch,
        keyword_search_batch,
        vector_search_batch,
    )

    queries = [
        "How does Einstein define simultaneity?",
        "length of moving rods",
        "velocity of light in empty space",
    ]
    num_results, oversample = 4, 2
    fused = _hybrid_fused_batch(
        queries,
        num_results=num_results,
        oversample=oversample,
        vector_search_weight=0.75,
        keyword_search_weight=0.25,
        metadata_filter=None,
        config=raglite_test_config,
    )
    assert fused is not None, "fused path unexpectedly unavailable"
    vector_results = vector_search_batch(
        queries, num_results=oversample * num_results, config=raglite_test_config
    )
    keyword_results = keyword_search_batch(
        queries, num_results=oversample * num_results, config=raglite_test_config
    )
    for q, (ids_f, scores_f), (vs_ids, _), (ks_ids, _) in zip(
        queries, fused, vector_results, keyword_results
    ):
        want_ids, want_scores = reciprocal_rank_fusion(
            [vs_ids, ks_ids], weights=[0.75, 0.25]
        )
        assert ids_f == want_ids[:num_results], q
        np.testing.assert_allclose(scores_f, want_scores[:num_results], rtol=1e-5)


def test_hybrid_fused_metadata_filter(raglite_test_config) -> None:
    from raglite_tpu.search import hybrid_search

    hit_ids, _ = hybrid_search(
        "simultaneity",
        num_results=3,
        metadata_filter={"topic": "Physics"},
        config=raglite_test_config,
    )
    assert hit_ids
    miss_ids, _ = hybrid_search(
        "simultaneity",
        num_results=3,
        metadata_filter={"topic": "Cooking"},
        config=raglite_test_config,
    )
    assert miss_ids == []


def test_hybrid_fused_wide_query_falls_back(raglite_test_config) -> None:
    """A query over RESIDENT_MAX_TERMS unique terms drops to the host-RRF
    fallback inside hybrid_search — results still correct."""
    from raglite_tpu.index.keyword import keyword_index_from_config
    from raglite_tpu.search import _hybrid_fused_batch, hybrid_search

    from raglite_tpu.index.keyword import tokenize
    from raglite_tpu.store import store_from_config

    kw = keyword_index_from_config(raglite_test_config)
    # Only KNOWN unique terms count toward the cap, so build the wide query
    # from corpus vocabulary (works on both the native and Python postings).
    store = store_from_config(raglite_test_config)
    vocab: dict[str, None] = {}
    for chunk in store.chunks.values():
        vocab.update(dict.fromkeys(tokenize(chunk.body)))
        if len(vocab) > kw.RESIDENT_MAX_TERMS + 5:
            break
    wide = " ".join(list(vocab)[: kw.RESIDENT_MAX_TERMS + 5])
    assert (
        _hybrid_fused_batch(
            [wide],
            num_results=3,
            oversample=2,
            vector_search_weight=0.75,
            keyword_search_weight=0.25,
            metadata_filter=None,
            config=raglite_test_config,
        )
        is None
    )
    ids, scores = hybrid_search(wide, num_results=3, config=raglite_test_config)
    assert len(ids) == len(scores)


def test_rrf_kernel_out_of_range_dense_ordinals() -> None:
    """A padded-kernel slot can surface an out-of-range dense ordinal with a
    FINITE score (observed on the TPU backend with tiny corpora); the fusion
    must drop it rather than hand the host an id lookup past the end."""
    from raglite_tpu.ops.rrf import rrf_fuse_topk

    n = 10
    d_scores = np.asarray([[3.0, 2.5, 2.0, 1.5]], np.float32)
    d_ords = np.asarray([[4, n, 7, n + 5]], np.int64)  # two padding leaks
    k_scores = np.asarray([[1.0, 0.8, 0.0]], np.float32)
    k_ords = np.asarray([[4, n + 3, n]], np.int32)  # one leak, one empty
    fused = np.asarray(
        rrf_fuse_topk(*_pack(d_scores, d_ords, k_scores, k_ords), num_chunks=n, num_results=6)
    )
    ords = np.ascontiguousarray(fused[1]).view(np.int32)[0]
    keep = ords >= 0
    surviving = list(ords[keep])
    assert all(0 <= o < n for o in surviving), surviving
    # Ranks compact AROUND the dropped slots (positions are ranks as
    # delivered by the producing kernels), so 4 keeps rank 0 and 7 rank 2;
    # expected fused order: 4 (dense rank0 + kw rank0), then 7.
    assert surviving == [4, 7], surviving
