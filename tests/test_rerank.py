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


def _make_chunk(body: str, index: int = 0):
    from raglite_tpu.documents import Chunk

    return Chunk(
        id=f"synthetic-{index}-{hash(body) & 0xFFFF:04x}",
        document_id="doc-synthetic",
        index=index,
        headings="",
        body=body,
    )


def test_token_maxsim_recovers_diluted_exact_match() -> None:
    """Token-level MaxSim is a NEW signal vs pooled vectors: a long chunk
    containing the exact query terms among heavy noise beats a short
    near-miss chunk under token MaxSim, while pooled cosine (what the dense
    scan and the chunklet ranker consume) prefers the near-miss — the
    information the VERDICT r3 review found the chunklet ranker cannot add."""
    import numpy as np

    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.models.encoder import encoder_from_config
    from raglite_tpu.search import _rank_with_token_maxsim

    config = RAGLiteConfig(embedder="hash:256", llm="echo")
    query = "simultaneity definition"
    noise = " ".join(f"filler{i} lorem ipsum dolor" for i in range(40))
    diluted_exact = _make_chunk(f"{noise} simultaneity definition {noise}", 0)
    near_miss = _make_chunk("simultaneous defined", 1)
    # Pooled cosine prefers the short near-miss (the premise of the test).
    encoder = encoder_from_config(config)
    pooled = encoder.embed([query, diluted_exact.body, near_miss.body])
    pooled /= np.linalg.norm(pooled, axis=1, keepdims=True)
    assert pooled[0] @ pooled[2] > pooled[0] @ pooled[1]
    reranked = _rank_with_token_maxsim(query, [near_miss, diluted_exact], config)
    assert reranked[0].id == diluted_exact.id


def test_token_maxsim_cache_hit_stable() -> None:
    """A second rerank over cached token matrices returns the same order."""
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.search import _rank_with_token_maxsim

    config = RAGLiteConfig(embedder="hash:256", llm="echo")
    chunks = [
        _make_chunk("the velocity of light in empty space", 0),
        _make_chunk("a completely unrelated paragraph about cooking pasta", 1),
        _make_chunk("", 2),  # empty body exercises the zero-token guard
    ]
    first = _rank_with_token_maxsim("speed of light", list(chunks), config)
    second = _rank_with_token_maxsim("speed of light", list(chunks), config)
    assert [c.id for c in first] == [c.id for c in second]
    assert first[0].index == 0


def test_chunklet_reranker_selectable(raglite_test_config: "RAGLiteConfig") -> None:
    """reranker="maxsim_chunklet" routes to the stored-sub-vector ranker."""
    import dataclasses

    config = dataclasses.replace(
        raglite_test_config, reranker={"en": "maxsim_chunklet", "other": "maxsim_chunklet"}
    )
    ids, _ = hybrid_search("simultaneity", num_results=5, config=config)
    chunks = rerank_chunks("simultaneity", ids, config=config)
    assert sorted(c.id for c in chunks) == sorted(ids)


def test_reranker_blend_fuses_orders() -> None:
    """config.reranker_blend rank-fuses the reranker's order with the
    incoming retrieval order: 0 = reranker verbatim (default), 1 = retrieval
    order, intermediate = RRF where agreement between the two orders wins."""
    import dataclasses

    from raglite_tpu.config import RAGLiteConfig

    chunks = [_make_chunk(f"body number {i}", i) for i in range(3)]
    a, b, c = chunks

    def fixed_reranker(query, cands):  # retrieval [a,b,c] -> reranker [b,c,a]
        by_id = {x.id: x for x in cands}
        return [by_id[b.id], by_id[c.id], by_id[a.id]]

    base = RAGLiteConfig(embedder="hash:256", llm="echo", reranker=fixed_reranker)
    out0 = rerank_chunks("q", list(chunks), config=base)
    assert [x.id for x in out0] == [b.id, c.id, a.id]
    cfg1 = dataclasses.replace(base, reranker_blend=1.0)
    out1 = rerank_chunks("q", list(chunks), config=cfg1)
    assert [x.id for x in out1] == [a.id, b.id, c.id]
    # RRF at blend=0.5: b is top-rerank + 2nd-retrieval (most agreement),
    # a is top-retrieval but last-rerank, c trails both lists.
    cfg_half = dataclasses.replace(base, reranker_blend=0.5)
    out_half = rerank_chunks("q", list(chunks), config=cfg_half)
    assert [x.id for x in out_half] == [b.id, a.id, c.id]


def test_language_detection() -> None:
    from raglite_tpu.utils.lang import detect_language

    assert detect_language("The quick brown fox jumps over the lazy dog and the cat") == "en"
    assert detect_language("Der schnelle braune Fuchs springt über den faulen Hund und die Katze") == "de"
    assert detect_language("12345 67890") == "other"


def test_token_maxsim_cache_eviction_keeps_current_candidates(monkeypatch) -> None:
    """Regression: a chunk cached by an EARLIER query must not be evicted by
    the current call's own inserts (insertion-ordered cache without a touch
    dropped old-position hits right before the lookup -> KeyError)."""
    import raglite_tpu.search as search_mod
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.search import _rank_with_token_maxsim

    config = RAGLiteConfig(embedder="hash:256", llm="echo")
    monkeypatch.setattr(search_mod, "_TOKEN_MATRIX_CACHE_CAP", 4)
    monkeypatch.setattr(search_mod, "_TOKEN_MATRIX_CACHE", {})
    old = [_make_chunk(f"an old paragraph about topic {i}", i) for i in range(4)]
    _rank_with_token_maxsim("topic", list(old), config)  # caches all four
    fresh = [_make_chunk(f"a brand new paragraph number {i}", 10 + i) for i in range(4)]
    # old[0] is a HIT at the oldest cache position; the four misses push the
    # cache past the cap, which (pre-fix) evicted old[0] before the lookup.
    reranked = _rank_with_token_maxsim("old paragraph", [old[0], *fresh], config)
    assert sorted(c.id for c in reranked) == sorted(c.id for c in [old[0], *fresh])
    assert reranked[0].id == old[0].id


def test_fused_device_maxsim_matches_host_path() -> None:
    """TransformerEncoder.rerank_maxsim (on-device fused encode+MaxSim,
    scores-only fetch) is numerically equivalent to the host-matrix path
    (embed_token_level_batch + ops/maxsim.maxsim_rank)."""
    import numpy as np

    from raglite_tpu.models.encoder import TransformerEncoder
    from raglite_tpu.ops.maxsim import maxsim_rank
    from raglite_tpu.search import _l2_rows

    enc = TransformerEncoder("tiny", seed=3)
    query = "the speed of light in vacuum"
    texts = [
        "light propagates with a definite velocity in empty space",
        "a recipe for sourdough bread with a long fermentation",
        "velocity of light",
        "",  # empty candidate exercises the all-pad row
        "clocks synchronised by exchanging light signals " * 20,  # long
    ]
    fused = enc.rerank_maxsim(query, texts)
    mats = enc.embed_token_level_batch(texts)
    mats = [
        _l2_rows(m) if m.shape[0] else np.zeros((1, enc.dim), np.float32) for m in mats
    ]
    order, host_scores = maxsim_rank(_l2_rows(enc.embed_token_level(query)), mats)
    host_by_idx = np.empty(len(texts), np.float32)
    host_by_idx[order] = host_scores
    np.testing.assert_allclose(fused, host_by_idx, rtol=2e-3, atol=2e-3)
    assert list(np.argsort(-fused, kind="stable")) == list(order)


def test_fused_rerank_device_cache_skips_reencode() -> None:
    """Warm reranks must not re-encode cached candidates: the second call
    with the same texts runs ONLY the score program (the candidate encode is
    the dominant cold-rerank cost), and returns identical scores."""
    import numpy as np

    from raglite_tpu.models.encoder import TransformerEncoder

    enc = TransformerEncoder("tiny", seed=3)
    texts = ["light propagates in empty space", "sourdough bread", "velocity of light"]
    cold = enc.rerank_maxsim("speed of light", texts)
    encode_calls = []
    real_encode = enc._rerank_encode

    def counting_encode(*args, **kwargs):
        encode_calls.append(1)
        return real_encode(*args, **kwargs)

    enc._rerank_encode = counting_encode
    warm = enc.rerank_maxsim("speed of light", texts)
    # Exactly one encode: the QUERY (candidates come from the device cache).
    assert len(encode_calls) == 1
    np.testing.assert_array_equal(cold, warm)
    # A new candidate triggers exactly one more (candidate) encode.
    enc.rerank_maxsim("speed of light", [*texts, "a brand new candidate"])
    assert len(encode_calls) == 3


def test_fused_rerank_cache_evicts_to_cap(monkeypatch) -> None:
    from raglite_tpu.models.encoder import TransformerEncoder

    enc = TransformerEncoder("tiny", seed=3)
    enc._ensure_rerank_programs()
    enc._rerank_cache_cap = 4
    enc.rerank_maxsim("q", [f"candidate number {i}" for i in range(9)])
    assert len(enc._rerank_cache) == 4
    # The SURVIVORS are the most recent candidates, and they still score.
    scores = enc.rerank_maxsim("q", [f"candidate number {i}" for i in range(5, 9)])
    assert scores.shape == (4,)
