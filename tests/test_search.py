"""Search tests (reference: tests/test_search.py)."""

import numpy as np
import pytest

from raglite_tpu import (
    RAGLiteConfig,
    hybrid_search,
    keyword_search,
    reciprocal_rank_fusion,
    rerank_chunks,
    retrieve_chunk_spans,
    retrieve_chunks,
    vector_search,
)

SEARCHES = [vector_search, keyword_search, hybrid_search]


@pytest.mark.parametrize("search", SEARCHES, ids=lambda f: f.__name__)
def test_search_finds_simultaneity(search, raglite_test_config: RAGLiteConfig) -> None:
    """The golden corpus query hits the right section (reference asserts
    'Definition of Simultaneity' appears, tests/test_search.py:49-52)."""
    query = "How does Einstein define simultaneity?"
    chunk_ids, scores = search(query, num_results=5, config=raglite_test_config)
    assert len(chunk_ids) == len(scores) > 0
    assert all(isinstance(cid, str) for cid in chunk_ids)
    assert all(isinstance(s, float) for s in scores)
    chunks = retrieve_chunks(chunk_ids, config=raglite_test_config)
    texts = [str(c) for c in chunks]
    assert any("simultaneity" in t.lower() for t in texts)


def test_vector_search_scores_sorted(raglite_test_config: RAGLiteConfig) -> None:
    _, scores = vector_search("relative motion of magnet and conductor", num_results=8, config=raglite_test_config)
    assert scores == sorted(scores, reverse=True)


def test_search_no_results_query(raglite_test_config: RAGLiteConfig) -> None:
    ids, scores = keyword_search("zzzqqqxyzzy unknownword", num_results=3, config=raglite_test_config)
    assert ids == []


def test_search_empty_database(tmp_path) -> None:
    config = RAGLiteConfig(store_path=str(tmp_path / "empty"), embedder="hash:256")
    for search in SEARCHES:
        ids, scores = search("anything", num_results=3, config=config)
        assert ids == [] and scores == []


def test_metadata_filter(raglite_test_config: RAGLiteConfig) -> None:
    """Filter that matches everything vs. one that matches nothing
    (reference: tests/test_search.py:63-127)."""
    hit_ids, _ = vector_search(
        "simultaneity",
        num_results=3,
        metadata_filter={"topic": "Physics"},
        config=raglite_test_config,
    )
    assert hit_ids
    miss_ids, _ = vector_search(
        "simultaneity",
        num_results=3,
        metadata_filter={"topic": "Cooking"},
        config=raglite_test_config,
    )
    assert miss_ids == []
    # List-valued filters are any-of.
    any_ids, _ = vector_search(
        "simultaneity",
        num_results=3,
        metadata_filter={"topic": ["Cooking", "Physics"]},
        config=raglite_test_config,
    )
    assert any_ids == hit_ids


def test_rrf_weights() -> None:
    ids, scores = reciprocal_rank_fusion([["a", "b"], ["b", "c"]], weights=[0.75, 0.25])
    assert ids[0] == "b"  # appears in both rankings
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="weights"):
        reciprocal_rank_fusion([["a"]], weights=[1.0, 2.0])
    assert reciprocal_rank_fusion([[], []]) == ([], [])


def test_retrieve_chunks_preserves_order(raglite_test_config: RAGLiteConfig) -> None:
    ids, _ = vector_search("simultaneity", num_results=4, config=raglite_test_config)
    chunks = retrieve_chunks(ids, config=raglite_test_config)
    assert [c.id for c in chunks] == ids
    assert all(c.document is not None for c in chunks)
    assert retrieve_chunks([], config=raglite_test_config) == []


def test_retrieve_chunk_spans(raglite_test_config: RAGLiteConfig) -> None:
    ids, _ = vector_search("definition of simultaneity", num_results=3, config=raglite_test_config)
    spans = retrieve_chunk_spans(ids, config=raglite_test_config)
    assert spans
    for span in spans:
        indexes = [c.index for c in span.chunks]
        assert indexes == list(range(indexes[0], indexes[0] + len(indexes)))
        assert span.document is not None
    # Spans include neighbor chunks of the seeds.
    seed_count = len(set(ids))
    assert sum(len(s.chunks) for s in spans) >= seed_count


def test_rerank_chunks(raglite_test_config: RAGLiteConfig) -> None:
    query = "How does Einstein define simultaneity?"
    ids, _ = hybrid_search(query, num_results=10, config=raglite_test_config)
    reranked = rerank_chunks(query, ids, config=raglite_test_config)
    assert {c.id for c in reranked} == set(ids)
    # Rerank accepts chunks as input too.
    chunks = retrieve_chunks(ids, config=raglite_test_config)
    reranked2 = rerank_chunks(query, chunks, config=raglite_test_config)
    assert {c.id for c in reranked2} == set(ids)


def test_vector_search_accepts_embedding(raglite_test_config: RAGLiteConfig) -> None:
    from raglite_tpu.embed import embed_strings

    q = embed_strings(["simultaneity of events"], config=raglite_test_config)[0]
    ids, scores = vector_search(np.asarray(q), num_results=3, config=raglite_test_config)
    assert ids and scores


def test_vector_search_batch_matches_single(raglite_test_config) -> None:
    """Batched search returns the same ranked chunks as per-query calls."""
    from raglite_tpu import vector_search, vector_search_batch

    queries = [
        "How does Einstein define simultaneity?",
        "What happens to moving clocks?",
        "velocity of light in empty space",
    ]
    batched = vector_search_batch(queries, num_results=5, config=raglite_test_config)
    assert len(batched) == len(queries)
    for query, (ids_b, scores_b) in zip(queries, batched):
        ids_s, scores_s = vector_search(query, num_results=5, config=raglite_test_config)
        assert ids_b == ids_s, query
        import numpy as np

        np.testing.assert_allclose(scores_b, scores_s, rtol=1e-4)


def test_hybrid_search_batch_matches_single(raglite_test_config) -> None:
    from raglite_tpu import hybrid_search, hybrid_search_batch

    queries = ["simultaneity of events", "length of moving rods"]
    batched = hybrid_search_batch(queries, num_results=4, config=raglite_test_config)
    for query, (ids_b, scores_b) in zip(queries, batched):
        ids_s, scores_s = hybrid_search(query, num_results=4, config=raglite_test_config)
        # Batched and single scans can reorder near-ties deep in the
        # oversampled candidate list, which perturbs RRF ranks: require the
        # same top hit and strong overlap rather than identical order.
        assert ids_b[0] == ids_s[0], query
        assert len(set(ids_b) & set(ids_s)) >= len(ids_s) - 1, query


def test_keyword_search_batch_matches_single(raglite_test_config) -> None:
    """One batched BM25 device program must reproduce per-query results
    (ops/bm25.py:bm25_topk_batch vs bm25_topk)."""
    from raglite_tpu.search import keyword_search, keyword_search_batch

    queries = [
        "simultaneity of events",
        "velocity of light in a moving frame",
        "rigid body coordinates",
    ]
    batched = keyword_search_batch(queries, num_results=5, config=raglite_test_config)
    for query, (ids_b, scores_b) in zip(queries, batched):
        ids_s, scores_s = keyword_search(query, num_results=5, config=raglite_test_config)
        assert ids_b == ids_s, query
        import numpy as np

        np.testing.assert_allclose(scores_b, scores_s, rtol=1e-5)


def test_bm25_batch_no_flat_id_overflow() -> None:
    """2-D scatter scoring: large corpus x batch must not wrap int32 (the
    flat-segment-id formulation zeroed queries past batch ~215 at 10M
    chunks). Simulated with a huge num_chunks padding and a tiny posting
    set pointing at real chunks."""
    import jax.numpy as jnp
    import numpy as np

    from raglite_tpu.ops.bm25 import bm25_scores_batch

    num_chunks = 10_000_128
    batch = 300  # flat ids would reach 3e9 > int32
    # Two postings for the last query, pointing at chunk 7.
    posting_chunk = jnp.asarray([7, 7], dtype=jnp.int32)
    posting_query = jnp.asarray([batch - 1, batch - 1], dtype=jnp.int32)
    tf = jnp.asarray([2.0, 1.0], jnp.float32)
    idf = jnp.asarray([1.5, 1.5], jnp.float32)
    len_norm = jnp.ones((num_chunks,), jnp.float32)
    scores = np.asarray(bm25_scores_batch(
        posting_chunk, posting_query, tf, idf, len_norm,
        num_chunks=num_chunks, batch=batch,
    )[batch - 1, 7])
    assert scores > 0.0


# --- Device-resident BM25 (postings stay in HBM; queries upload term ids) --


def _zipf_keyword_index(n_chunks=1200, vocab=300, seed=0):
    from raglite_tpu.index.keyword import KeywordIndex

    rng = np.random.default_rng(seed)
    index = KeywordIndex()
    for i in range(n_chunks):
        words = " ".join(
            f"w{t}" for t in rng.integers(0, vocab, size=rng.integers(5, 50))
        )
        index._add_chunk(f"c{i}", words)
    queries = [
        " ".join(f"w{t}" for t in rng.integers(0, vocab, size=4)) for _ in range(17)
    ]
    return index, queries


def test_resident_bm25_matches_host_gather() -> None:
    """The HBM-resident CSR program (ops/bm25.py:bm25_topk_resident) must
    reproduce the host-gather path exactly: same ids, same scores — single
    query, batch, metadata mask, and after deletes."""
    index, queries = _zipf_keyword_index()
    n = len(index.chunk_ids)

    index.use_resident = True
    res = index.search_batch(queries, num_hits=10)
    index.use_resident = False
    host = index.search_batch(queries, num_hits=10)
    for (r_ids, r_scores), (h_ids, h_scores) in zip(res, host):
        assert r_ids == h_ids
        np.testing.assert_allclose(r_scores, h_scores, rtol=1e-4)

    mask = np.zeros(n, bool)
    mask[::3] = True
    index.use_resident = True
    r1 = index.search(queries[0], num_hits=10, chunk_mask=mask)
    index.use_resident = False
    h1 = index.search(queries[0], num_hits=10, chunk_mask=mask)
    assert r1[0] == h1[0]
    np.testing.assert_allclose(r1[1], h1[1], rtol=1e-4)

    # Deletes flip mask bits + zero doc lengths (the sync path's effect).
    dead = set(range(0, n, 7))
    index._dead |= dead
    index._alive_mask = None
    for ordinal in dead:
        index.doc_len[ordinal] = 0
    index.use_resident = True
    index._refresh_resident_weights()
    r2 = index.search_batch(queries[:5], num_hits=10)
    index.use_resident = False
    h2 = index.search_batch(queries[:5], num_hits=10)
    for (r_ids, r_scores), (h_ids, h_scores) in zip(r2, h2):
        assert r_ids == h_ids
        np.testing.assert_allclose(r_scores, h_scores, rtol=1e-3)


def test_resident_bm25_wide_query_falls_back() -> None:
    """A query with more unique terms than RESIDENT_MAX_TERMS silently uses
    the host-gather path — same results, no crash."""
    index, _ = _zipf_keyword_index(n_chunks=300)
    wide = " ".join(f"w{t}" for t in range(index.RESIDENT_MAX_TERMS + 5))
    index.use_resident = True
    r = index.search(wide, num_hits=10)
    index.use_resident = False
    h = index.search(wide, num_hits=10)
    assert r[0] == h[0]
    np.testing.assert_allclose(r[1], h[1], rtol=1e-4)


def test_resident_bm25_lcap_truncation_keeps_top_impact() -> None:
    """Terms with df > LCAP keep only their LCAP highest-impact postings
    (impact-ordered early termination).  For a single-term query, impact
    order IS score order, so the top-k under truncation must equal the
    exact top-k whenever k <= LCAP."""
    from raglite_tpu.index.keyword import KeywordIndex

    rng = np.random.default_rng(1)
    index = KeywordIndex()
    # 'stop' appears in every chunk with varying tf and lengths.
    for i in range(600):
        body = " ".join(["stop"] * int(rng.integers(1, 6)))
        body += " " + " ".join(f"w{t}" for t in rng.integers(0, 50, size=rng.integers(3, 30)))
        index._add_chunk(f"c{i}", body)
    index.RESIDENT_LCAP = 128  # instance override: df(stop)=600 > 128
    index.use_resident = True
    r_ids, r_scores = index.search("stop", num_hits=10)
    index.use_resident = False
    h_ids, h_scores = index.search("stop", num_hits=10)
    assert r_ids == h_ids
    np.testing.assert_allclose(r_scores, h_scores, rtol=1e-4)
