"""Embedding tests (reference: tests/test_embed.py)."""

import numpy as np
import pytest

from raglite_tpu import RAGLiteConfig
from raglite_tpu.embed import (
    embed_queries,
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


def test_embed_queries_independent() -> None:
    """A batch of unrelated queries must embed exactly as each query would
    alone — late chunking must never pool token embeddings across queries
    (regression: embed_strings treated the batch as one document's sentence
    stream, zeroing some rows via largest-remainder allocation)."""
    queries = ["apple", "banana", "what is the speed of light?"]
    batch = embed_queries(queries, config=CFG).astype(np.float32)
    np.testing.assert_allclose(np.linalg.norm(batch, axis=1), 1.0, atol=1e-2)
    for i, q in enumerate(queries):
        solo = embed_strings([q], config=CFG).astype(np.float32)[0]
        assert float(batch[i] @ solo) > 0.999, f"query {i} diverges from solo embedding"


def test_vector_search_batch_matches_single(tmp_path) -> None:
    """The shipped batch API must rank like per-query vector_search
    (regression: batched query embeddings were contaminated)."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents, vector_search
    from raglite_tpu.search import vector_search_batch

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    doc = Document.from_text(
        "# Fruit\n\nApples are red or green fruit that grow on trees. " * 8
        + "\n\n# Light\n\nThe speed of light in vacuum is a universal constant. " * 8
        + "\n\n# Music\n\nA violin has four strings tuned in perfect fifths. " * 8
    )
    insert_documents([doc], config=config)
    queries = ["red or green fruit", "speed of light constant", "violin strings"]
    batched = vector_search_batch(queries, num_results=3, config=config)
    for q, (ids_b, _) in zip(queries, batched):
        ids_s, _ = vector_search(q, num_results=3, config=config)
        assert ids_b[0] == ids_s[0], f"batch top hit diverges for {q!r}"


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


def test_flax_batched_token_level_matches_single() -> None:
    """The bucketed batch token-level path must reproduce the per-segment
    forward exactly (it feeds late chunking on the insert path)."""
    from raglite_tpu.models.encoder import _make_encoder

    enc = _make_encoder("flax:tiny")
    texts = ["short one", "a rather longer segment with many more words in it", "", "mid size text"]
    batched = enc.embed_token_level_batch(texts)
    for text, b in zip(texts, batched):
        solo = enc.embed_token_level(text)
        assert b.shape == solo.shape
        np.testing.assert_allclose(b, solo, rtol=2e-3, atol=2e-3)


def test_flax_late_chunking_long_document() -> None:
    """Late chunking through the batched transformer path: one embedding per
    sentence, finite, unit-norm."""
    cfg = RAGLiteConfig(store_path=":memory:", embedder="flax:tiny")
    sentences = [f"Sentence number {i} speaks of photons and momenta. " for i in range(40)]
    emb = embed_strings_with_late_chunking(sentences, config=cfg)
    assert emb.shape[0] == 40
    assert np.all(np.isfinite(emb.astype(np.float32)))
    np.testing.assert_allclose(
        np.linalg.norm(emb.astype(np.float32), axis=1), 1.0, atol=1e-2
    )


def test_insert_uses_batched_token_level_path(tmp_path) -> None:
    """Transformer-encoder ingestion must flow through
    embed_token_level_batch (bucketed [B, T] forwards), never the per-
    segment single-text path — the TPU ingestion-throughput guarantee
    (VERDICT r3 task #6; reference hot loop: _embed.py:16-141)."""
    from raglite_tpu import Document, insert_documents
    from raglite_tpu.models import encoder as encoder_mod

    cfg = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="flax:tiny", llm="echo")
    enc = encoder_mod.encoder_from_config(cfg)
    calls = {"batch": 0, "single": 0}
    orig_batch = type(enc).embed_token_level_batch
    orig_single = type(enc).embed_token_level

    def counting_batch(self, texts):
        calls["batch"] += 1
        return orig_batch(self, texts)

    def counting_single(self, text):
        calls["single"] += 1
        return orig_single(self, text)

    type(enc).embed_token_level_batch = counting_batch
    type(enc).embed_token_level = counting_single
    try:
        docs = [
            Document.from_text(
                f"# Doc {i}\n\n" + f"Paragraph about topic {i} with several sentences. " * 30
            )
            for i in range(3)
        ]
        insert_documents(docs, config=cfg)
    finally:
        type(enc).embed_token_level_batch = orig_batch
        type(enc).embed_token_level = orig_single
    assert calls["batch"] >= 1, "insert bypassed the batched encoder path"
    assert calls["single"] == 0, "insert fell back to per-segment encodes"
