"""Semantic chunking tests (reference: tests/test_split_chunks.py)."""

import numpy as np
import pytest

from raglite_tpu.chunks import split_chunks


def _embeddings(n: int, d: int = 32, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=1, keepdims=True)


def test_single_chunklet() -> None:
    chunks, groups = split_chunks(["hello world"], _embeddings(1))
    assert chunks == ["hello world"]
    assert len(groups) == 1
    assert groups[0].shape[0] == 1


def test_empty() -> None:
    chunks, groups = split_chunks([], _embeddings(0))
    assert chunks == []


def test_oversize_chunklet_rejected() -> None:
    with pytest.raises(ValueError, match="max_size"):
        split_chunks(["x" * 100], _embeddings(1), max_size=50)


def test_zero_norm_embedding_rejected() -> None:
    emb = np.zeros((2, 8), dtype=np.float32)
    with pytest.raises(ValueError, match="zero norm"):
        split_chunks(["aa", "bb"], emb, max_size=100)


def test_small_doc_single_chunk() -> None:
    chunklets = ["short one. ", "short two. "]
    chunks, groups = split_chunks(chunklets, _embeddings(2), max_size=2048)
    assert chunks == ["short one. short two. "]
    assert groups[0].shape[0] == 2


def test_max_size_and_embedding_alignment() -> None:
    chunklets = ["x" * 300 for _ in range(10)]
    emb = _embeddings(10)
    chunks, groups = split_chunks(chunklets, emb, max_size=1000)
    assert all(len(c) <= 1000 for c in chunks)
    assert "".join(chunks) == "".join(chunklets)
    assert sum(g.shape[0] for g in groups) == 10
    # Embedding groups align with the chunk partition.
    offset = 0
    for chunk, group in zip(chunks, groups):
        assert len(chunk) == 300 * group.shape[0]
        np.testing.assert_array_equal(group, emb[offset : offset + group.shape[0]])
        offset += group.shape[0]


def test_semantic_cut_preference() -> None:
    """Cuts land where adjacent chunklets are dissimilar."""
    rng = np.random.default_rng(1)
    topic_a = rng.normal(size=32)
    topic_b = rng.normal(size=32)
    emb = np.stack(
        [topic_a + 0.1 * rng.normal(size=32) for _ in range(3)]
        + [topic_b + 0.1 * rng.normal(size=32) for _ in range(3)]
    ).astype(np.float32)
    chunklets = ["a" * 400] * 3 + ["b" * 400] * 3
    chunks, _ = split_chunks(chunklets, emb, max_size=1300)
    # The topic switch (after 3 chunklets = 1200 chars) is a cut point.
    assert any(len(c) == 1200 and set(c) == {"a"} for c in chunks)
