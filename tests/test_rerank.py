"""Reranker tests (reference: tests/test_rerank.py)."""

import numpy as np

from raglite_tpu import RAGLiteConfig, hybrid_search, rerank_chunks, retrieve_chunks
from raglite_tpu.ops.maxsim import maxsim_rank


def _kendall_tau(a: list, b: list) -> float:
    """Kendall rank correlation between two orderings of the same items."""
    index_b = {x: i for i, x in enumerate(b)}
    n = len(a)
    concordant = discordant = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = index_b[a[i]] - index_b[a[j]]
            if d < 0:
                concordant += 1
            else:
                discordant += 1
    total = concordant + discordant
    return (concordant - discordant) / total if total else 0.0


def test_maxsim_identity_ranking() -> None:
    """A candidate equal to the query ranks first."""
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    distractors = [rng.normal(size=(3, 32)).astype(np.float32) for _ in range(5)]
    cands = [*distractors[:2], q.copy(), *distractors[2:]]
    order, scores = maxsim_rank(q, cands)
    assert order[0] == 2
    assert scores[0] >= scores[-1]


def test_maxsim_empty() -> None:
    order, scores = maxsim_rank(np.zeros((2, 8), np.float32), [])
    assert order.size == 0


def test_rerank_improves_pathological_order(raglite_test_config: RAGLiteConfig) -> None:
    """Reranking a reversed candidate list correlates better with the
    original relevance order than the reversed list does
    (reference: tests/test_rerank.py:43-70)."""
    query = "How does Einstein define simultaneity?"
    ids, _ = hybrid_search(query, num_results=10, config=raglite_test_config)
    chunks = retrieve_chunks(ids, config=raglite_test_config)
    reversed_chunks = list(reversed(chunks))
    reranked = rerank_chunks(query, reversed_chunks, config=raglite_test_config)
    tau_reversed = _kendall_tau([c.id for c in reversed_chunks], ids)
    tau_reranked = _kendall_tau([c.id for c in reranked], ids)
    assert tau_reranked > tau_reversed


def test_rerank_disabled_passthrough(raglite_test_config: RAGLiteConfig) -> None:
    import dataclasses

    config = dataclasses.replace(raglite_test_config, reranker=None)
    ids, _ = hybrid_search("simultaneity", num_results=5, config=config)
    chunks = rerank_chunks("simultaneity", ids, config=config)
    assert [c.id for c in chunks] == ids


def test_language_detection() -> None:
    from raglite_tpu.utils.lang import detect_language

    assert detect_language("The quick brown fox jumps over the lazy dog and the cat") == "en"
    assert detect_language("Der schnelle braune Fuchs springt über den faulen Hund und die Katze") == "de"
    assert detect_language("12345 67890") == "other"
