"""Embedding tests (reference: tests/test_embed.py)."""

import numpy as np
import pytest

from raglite_tpu import RAGLiteConfig
from raglite_tpu.embed import (
    embed_strings,
    embed_strings_with_late_chunking,
    embed_strings_without_late_chunking,
    embedding_type,
)

CFG = RAGLiteConfig(store_path=":memory:", embedder="hash:256")


def test_embedding_invariants() -> None:
    """Shape, dtype fp16, unit norm (reference: tests/test_embed.py:13-26)."""
    sentences = ["First sentence here. ", "Second sentence there. ", "Third one now.\n"]
    emb = embed_strings(sentences, config=CFG)
    assert emb.shape == (3, 256)
    assert emb.dtype == np.float16
    np.testing.assert_allclose(
        np.linalg.norm(emb.astype(np.float32), axis=1), 1.0, atol=1e-2
    )


def test_late_chunking_type() -> None:
    assert embedding_type(config=CFG) == "late_chunking"


def test_empty_input() -> None:
    assert embed_strings([], config=CFG).shape == (0, 256)


def test_similar_sentences_similar_embeddings() -> None:
    emb = embed_strings(
        ["the quick brown fox jumps", "the quick brown fox leaps", "completely unrelated topic"],
        config=CFG,
    ).astype(np.float32)
    sim = emb @ emb.T
    assert sim[0, 1] > sim[0, 2]
    assert sim[0, 1] > 0.5


def test_late_chunking_uses_context() -> None:
    """Late-chunked embeddings of a sentence differ depending on surrounding
    context (the entire point of late chunking, _embed.py:16-141)."""
    target = "It was heavy. "
    ctx_a = ["The anvil fell on the floor. ", target]
    ctx_b = ["The feather floated down. ", target]
    emb_a = embed_strings_with_late_chunking(ctx_a, config=CFG).astype(np.float32)[1]
    emb_b = embed_strings_with_late_chunking(ctx_b, config=CFG).astype(np.float32)[1]
    # Same sentence without context:
    solo = embed_strings_without_late_chunking([target], config=CFG).astype(np.float32)[0]
    assert np.dot(emb_a, emb_b) > 0.4  # same sentence, related embeddings
    # Hash encoder tokens are context-free, so context enters only through
    # segment pooling allocation; embeddings should still be close to solo.
    assert np.dot(emb_a, solo) > 0.3


def test_long_document_segmentation() -> None:
    """Documents longer than the encoder window are segmented with preamble
    context and still produce one embedding per sentence."""
    from raglite_tpu.models.encoder import HashEncoder, _make_encoder

    sentences = [f"Sentence number {i} with content words. " for i in range(400)]
    emb = embed_strings_with_late_chunking(sentences, config=CFG)
    assert emb.shape == (400, 256)
    assert np.all(np.isfinite(emb.astype(np.float32)))


def test_flax_encoder_path() -> None:
    cfg = RAGLiteConfig(store_path=":memory:", embedder="flax:tiny")
    emb = embed_strings(["hello world", "goodbye world"], config=cfg)
    assert emb.shape[0] == 2
    assert emb.dtype == np.float16
    np.testing.assert_allclose(
        np.linalg.norm(emb.astype(np.float32), axis=1), 1.0, atol=1e-2
    )


def test_transformer_encoder_end_to_end_insert_search(tmp_path) -> None:
    """Late-chunking insert + search through the JAX transformer encoder
    (the production embedding path; reference embeds via llama.cpp bge-m3)."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents, vector_search

    config = RAGLiteConfig(
        store_path=str(tmp_path / "kb"), embedder="flax:tiny", llm="echo"
    )
    doc = Document.from_text(
        "# Photons\n\n" + "Photons are quanta of light with momentum. " * 60
    )
    insert_documents([doc], config=config)
    ids, scores = vector_search("quanta of light", num_results=3, config=config)
    assert ids and all(s == s for s in scores)  # finite scores, hits returned
