"""Query adapter tests (reference: tests/test_query_adapter.py)."""

import dataclasses

import numpy as np
import pytest

from raglite_tpu import Document, RAGLiteConfig, insert_documents, vector_search
from raglite_tpu.documents import Eval
from raglite_tpu.query_adapter import update_query_adapter
from raglite_tpu.store import store_from_config


@pytest.fixture(scope="module")
def adapter_config(tmp_path_factory) -> RAGLiteConfig:
    config = RAGLiteConfig(
        store_path=str(tmp_path_factory.mktemp("qa")), embedder="hash:128", llm="echo"
    )
    docs = [
        Document.from_text(
            f"# Topic {i}\n\n" + " ".join(f"Fact {i}-{j} about subject {i} and its details." for j in range(12)),
            filename=f"doc{i}.md",
        )
        for i in range(6)
    ]
    insert_documents(docs, config=config)
    store = store_from_config(config)
    # Synthesize evals: each question targets one document's chunks.
    for i, doc in enumerate(docs):
        chunk_ids = [cid for cid in store.chunk_order if store.chunks[cid].document_id == doc.id]
        chunks = [store.get_chunk(cid) for cid in chunk_ids]
        ev = Eval.from_chunks(
            question=f"What are the facts about subject {i}?",
            contexts=chunks,
            ground_truth=f"Facts about subject {i}.",
        )
        store.add_evals([ev])
    return config


def test_update_query_adapter_shape_and_finiteness(adapter_config: RAGLiteConfig) -> None:
    """Adapter is a finite d x d matrix (reference: tests/test_query_adapter.py:12-40)."""
    A = update_query_adapter(config=adapter_config)
    assert A.shape == (128, 128)
    assert np.all(np.isfinite(A))
    # Cosine metric -> orthogonal adapter.
    np.testing.assert_allclose(A @ A.T, np.eye(128), atol=1e-3)
    # Adapter is persisted and picked up by vector_search.
    store = store_from_config(adapter_config)
    assert "query_adapter" in store.index_metadata


def test_adapter_trains_and_applies(adapter_config: RAGLiteConfig) -> None:
    A = update_query_adapter(config=adapter_config)
    # Orthogonal (cosine metric -> Procrustes rotation)…
    np.testing.assert_allclose(A @ A.T, np.eye(A.shape[0]), atol=1e-3)
    plain = dataclasses.replace(adapter_config, vector_search_query_adapter=False)
    q = "What are the facts about subject 3?"
    ids_adapted, scores_adapted = vector_search(q, num_results=5, config=adapter_config)
    ids_plain, scores_plain = vector_search(q, num_results=5, config=plain)
    assert ids_adapted and ids_plain
    assert np.isfinite(scores_adapted).all()
    # NOTE: when the NNLS targets land on the queries themselves (margins
    # already satisfied), the CORRECT adapter is near-identity and scores
    # may match the plain search — asserting "scores differ" here would
    # re-demand the fp32-SVD scrambling bug this suite regression-guards.


def test_update_query_adapter_requires_evals(tmp_path) -> None:
    config = RAGLiteConfig(store_path=str(tmp_path / "noevals"), embedder="hash:128")
    insert_documents([Document.from_text("Just one document here. ", filename="d.md")], config=config)
    with pytest.raises(ValueError, match="insert_evals"):
        update_query_adapter(config=config)


def test_update_query_adapter_requires_documents(tmp_path) -> None:
    config = RAGLiteConfig(store_path=str(tmp_path / "nodocs"), embedder="hash:128")
    with pytest.raises(ValueError, match="insert_documents"):
        update_query_adapter(config=config)


def test_procrustes_near_identity_when_targets_match_queries() -> None:
    """When targets ~= queries (NNLS found the margins already satisfied),
    the cosine adapter must be a NEAR-IDENTITY rotation.  Regression: the
    fp32 SVD scrambled the signs of M's near-degenerate directions — the
    data block (1/n)T^T Q sits at ~1e-3..1e-5 against the rank
    completion's 1.0 — and the resulting 'rotation' halved MRR on a real
    eval set.  The fp64 host solve (reference-faithful) is gentle."""
    import numpy as np

    from raglite_tpu.query_adapter import procrustes_adapter

    rng = np.random.default_rng(0)
    d, n = 256, 80
    Q = rng.normal(size=(n, d)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    # Targets: tiny rotations of the queries (cos ~0.999, like real evals).
    T = Q + 0.04 * rng.normal(size=(n, d)).astype(np.float32)
    A = procrustes_adapter(Q, T, "cosine")
    # Orthogonal…
    np.testing.assert_allclose(A @ A.T, np.eye(d), atol=1e-4)
    # …and close to identity: queries keep pointing where they pointed.
    adapted = Q @ A.T
    cos = np.sum(adapted * Q, axis=1)
    assert float(np.min(cos)) > 0.9, float(np.min(cos))
    assert np.linalg.norm(A - np.eye(d)) < 0.25 * np.sqrt(d)
