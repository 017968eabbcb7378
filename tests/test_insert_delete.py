"""Insert/delete integration tests (reference: tests/test_insert.py, test_delete.py)."""

import numpy as np

from raglite_tpu import (
    RAGLiteConfig,
    Document,
    delete_documents,
    delete_documents_by_metadata,
    insert_documents,
    vector_search,
)
from raglite_tpu.store import store_from_config


def _config(tmp_path, name="store"):
    return RAGLiteConfig(store_path=str(tmp_path / name), embedder="hash:256", llm="echo")


DOC_A = "# Alpha\n\nAlpaca wool is prized for warmth. It is soft and light. Farmers comb it gently. "
DOC_B = "# Beta\n\nBeta decay emits electrons from nuclei. Physicists measure the spectrum. It is continuous. "


def test_insert_reassembles_exactly(tmp_path) -> None:
    """Chunk bodies concatenate back to the document (reference: tests/test_insert.py:13-33)."""
    config = _config(tmp_path)
    doc = Document.from_text(DOC_A, filename="a.md")
    insert_documents([doc], config=config)
    store = store_from_config(config)
    bodies = "".join(store.chunks[cid].body for cid in store.chunk_order)
    assert bodies == DOC_A
    # Headings are contextual, never duplicated into bodies.
    for cid in store.chunk_order:
        chunk = store.chunks[cid]
        if chunk.headings:
            assert chunk.headings not in chunk.body or chunk.body.startswith("#")


def test_insert_idempotent(tmp_path) -> None:
    """Same document twice inserts once (reference: _insert.py:195-204)."""
    config = _config(tmp_path)
    doc = Document.from_text(DOC_A, filename="a.md")
    insert_documents([doc], config=config)
    store = store_from_config(config)
    n_chunks = len(store.chunk_order)
    insert_documents([Document.from_text(DOC_A, filename="a.md")], config=config)
    assert len(store.chunk_order) == n_chunks
    assert len(store.documents) == 1


def test_insert_updates_metadata_table(tmp_path) -> None:
    config = _config(tmp_path)
    insert_documents(
        [Document.from_text(DOC_A, filename="a.md", topic="Wool", type="Article")], config=config
    )
    store = store_from_config(config)
    assert "topic" in store.metadata and "Wool" in store.metadata["topic"]
    assert "filename" not in store.metadata  # excluded field


def test_insert_tolerates_unhashable_metadata(tmp_path) -> None:
    """Nested dict/list-of-dict metadata values can't be offered as
    self-query filter choices, but they must not abort the insert
    (reference contract: _insert.py:45-61 aggregates only scalars)."""
    config = _config(tmp_path)
    insert_documents(
        [
            Document.from_text(
                DOC_A,
                filename="a.md",
                topic="Wool",
                provenance={"source": "farm", "year": 2021},
                reviews=[{"stars": 5}],
            )
        ],
        config=config,
    )
    store = store_from_config(config)
    assert "Wool" in store.metadata["topic"]
    assert "provenance" not in store.metadata or not store.metadata["provenance"]
    # The unhashable values are still on the document itself (adapt_metadata
    # normalizes scalars-or-dicts to lists).
    doc = next(iter(store.documents.values()))
    prov = doc.metadata_["provenance"]
    prov_list = prov if isinstance(prov, list) else [prov]
    assert {"source": "farm", "year": 2021} in prov_list
    # Scalar-filtered search still works alongside the nested metadata.
    ids, _ = vector_search("alpaca", num_results=3, metadata_filter={"topic": "Wool"}, config=config)
    assert ids


def test_device_row_mask_cache_identity(tmp_path) -> None:
    """device_row_mask returns the same device buffer for byte-identical
    host masks (digest cache) and distinct buffers for distinct masks."""
    config = _config(tmp_path)
    insert_documents(
        [Document.from_text(DOC_A, filename="a.md"), Document.from_text(DOC_B, filename="b.md")],
        config=config,
    )
    from raglite_tpu.index.dense import dense_index_from_config

    index = dense_index_from_config(config)
    n = len(store_from_config(config).chunk_order)
    mask = np.zeros(index.row_chunk.shape[0], dtype=np.bool_)
    mask[: max(1, n // 2)] = True
    dev1 = index.device_row_mask(mask)
    dev2 = index.device_row_mask(mask.copy())
    assert dev1 is dev2  # digest-cached
    other = ~mask
    dev3 = index.device_row_mask(other)
    assert dev3 is not dev1
    # A jax.Array passes through untouched.
    assert index.device_row_mask(dev1) is dev1
    assert index.device_row_mask(None) is None


def test_embeddings_fp16_and_normalized(tmp_path) -> None:
    config = _config(tmp_path)
    insert_documents([Document.from_text(DOC_A, filename="a.md")], config=config)
    store = store_from_config(config)
    for cid in store.chunk_order:
        matrix = store.embeddings[cid]
        assert matrix.dtype == np.float16
        norms = np.linalg.norm(matrix.astype(np.float32), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_delete_restores_state(tmp_path) -> None:
    """Deleting one document leaves the rest intact
    (reference: tests/test_delete.py:18-40)."""
    config = _config(tmp_path)
    doc_a = Document.from_text(DOC_A, filename="a.md", topic="Wool")
    doc_b = Document.from_text(DOC_B, filename="b.md", topic="Physics")
    insert_documents([doc_a, doc_b], config=config)
    store = store_from_config(config)
    n_total = len(store.chunk_order)
    deleted = delete_documents([doc_a.id], config=config)
    assert deleted == 1
    assert doc_a.id not in store.documents
    # Deletes tombstone (append-only chunk log): the live chunk records all
    # belong to the surviving document, and the alive count shrinks.
    assert all(chunk.document_id == doc_b.id for chunk in store.chunks.values())
    assert all(cid in store.deleted_chunks or cid in store.chunks for cid in store.chunk_order)
    assert store.num_alive_chunks < n_total
    # Metadata values only held by the deleted document are pruned.
    assert "Wool" not in store.metadata.get("topic", [])
    assert "Physics" in store.metadata.get("topic", [])
    # Search no longer returns the deleted document's chunks.
    ids, _ = vector_search("alpaca wool warmth", num_results=5, config=config)
    assert all(store.chunks[i].document_id == doc_b.id for i in ids if i in store.chunks)


def test_delete_by_metadata(tmp_path) -> None:
    config = _config(tmp_path)
    doc_a = Document.from_text(DOC_A, filename="a.md", topic="Wool")
    doc_b = Document.from_text(DOC_B, filename="b.md", topic="Physics")
    insert_documents([doc_a, doc_b], config=config)
    deleted = delete_documents_by_metadata({"topic": "Wool"}, config=config)
    assert deleted == 1
    store = store_from_config(config)
    assert list(store.documents) == [doc_b.id]


def test_store_persistence_roundtrip(tmp_path) -> None:
    """The store is the checkpoint: reload from disk (SURVEY §5.4)."""
    from raglite_tpu.store import Store

    config = _config(tmp_path, "persist")
    doc = Document.from_text(DOC_A, filename="a.md", topic="Wool")
    insert_documents([doc], config=config)
    original = store_from_config(config)
    reloaded = Store(config.store_path)  # fresh load, bypassing the cache
    assert set(reloaded.documents) == set(original.documents)
    assert reloaded.chunk_order == original.chunk_order
    for cid in original.chunk_order:
        np.testing.assert_array_equal(reloaded.embeddings[cid], original.embeddings[cid])
    assert reloaded.metadata == original.metadata


def test_search_never_returns_deleted_chunks(tmp_path) -> None:
    """After delete, no search method can surface the deleted document's
    chunks (index tombstone/rebuild; reference: tests/test_delete.py)."""
    from raglite_tpu import delete_documents, hybrid_search, keyword_search

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:128", llm="echo")
    keep = Document.from_text("# Llamas\n\n" + "Llamas hum to communicate with their herd. " * 50)
    drop = Document.from_text("# Volcano\n\n" + "Magma rises through volcanic vents. " * 50)
    insert_documents([keep, drop], config=config)
    from raglite_tpu.store import store_from_config

    store = store_from_config(config)
    dropped_chunks = {c for c in store.chunk_order if store.chunks[c].document_id == drop.id}
    assert dropped_chunks

    delete_documents([drop.id], config=config)
    for method in (vector_search, keyword_search, hybrid_search):
        ids, _ = method("magma volcanic vents", num_results=8, config=config)
        assert not (set(ids) & dropped_chunks), method.__name__
    # The surviving document still retrieves.
    ids, _ = vector_search("llamas humming herd", num_results=3, config=config)
    assert ids


def test_compaction_resyncs_device_index(tmp_path) -> None:
    """Deleting most of the corpus triggers store compaction (generation
    bump); the dense index must rebuild and keep serving correct results."""
    from raglite_tpu.index.dense import dense_index_from_config
    from raglite_tpu.store import store_from_config

    config = _config(tmp_path)
    doc_a = Document.from_text(DOC_A, filename="a.md", topic="Wool")
    doc_b = Document.from_text(DOC_B, filename="b.md", topic="Physics")
    insert_documents([doc_a, doc_b], config=config)
    store = store_from_config(config)
    # Warm the index, then delete the larger document to cross the
    # tombstone threshold.
    vector_search("anything", num_results=2, config=config)
    gen0 = store.generation
    bigger = doc_a if sum(
        c.document_id == doc_a.id for c in store.chunks.values()
    ) >= sum(c.document_id == doc_b.id for c in store.chunks.values()) else doc_b
    survivor = doc_b if bigger is doc_a else doc_a
    delete_documents([bigger.id], config=config)
    if store.generation > gen0:  # compaction fired
        index = dense_index_from_config(config)
        assert index.num_rows == sum(
            store.embeddings[cid].shape[0] for cid in store.chunk_order
        )
    ids, _ = vector_search("alpaca wool physics light", num_results=5, config=config)
    assert ids
    assert all(store.chunks[i].document_id == survivor.id for i in ids if i in store.chunks)


def test_keyword_search_survives_tombstones_and_reload(tmp_path) -> None:
    """Round-2 review finding: keyword sync crashed (KeyError) on chunk_order
    entries whose records were tombstoned, including on fresh opens of any
    persisted store containing tombstones."""
    from raglite_tpu import keyword_search
    from raglite_tpu.index.keyword import _keyword_index_for_path
    from raglite_tpu.store import Store, _store_for_path

    config = _config(tmp_path)
    doc_a = Document.from_text(DOC_A, filename="a.md")
    doc_b = Document.from_text(DOC_B, filename="b.md")
    insert_documents([doc_a], config=config)
    keyword_search("alpaca", num_results=2, config=config)  # index syncs
    insert_documents([doc_b], config=config)
    delete_documents([doc_b.id], config=config)  # tombstones, below threshold
    ids, _ = keyword_search("alpaca wool", num_results=3, config=config)
    assert ids
    # Fresh process analogue: cold store + cold keyword index.
    _store_for_path.cache_clear()
    _keyword_index_for_path.cache_clear()
    ids2, _ = keyword_search("alpaca wool", num_results=3, config=config)
    assert ids2 == ids


def test_compaction_never_window_without_data_on_disk(tmp_path) -> None:
    """Round-2 review finding: compaction deleted all segments BEFORE the
    replacement save. Old segments must survive until the new head lands."""
    from pathlib import Path

    from raglite_tpu.store import Store

    store = Store(str(tmp_path / "s"))
    from raglite_tpu.documents import Chunk

    chunks = [
        Chunk(id=f"c{i}", document_id="d1" if i < 70 else "d2", index=i,
              headings="", body=f"b{i}", metadata_={})
        for i in range(100)
    ]
    embeddings = list(np.ones((100, 1, 8), dtype=np.float16))
    store.add_chunks(chunks, embeddings)
    store.save()
    seg_dir = Path(store.path) / "segments"
    before = sorted(p.name for p in seg_dir.iterdir())
    store.delete_documents(["d1"])  # 70% tombstones -> compaction
    # CRITICAL: the old segment data is still on disk until the next save.
    assert sorted(p.name for p in seg_dir.iterdir()) == before
    reopened = Store(str(tmp_path / "s"))  # crash-now scenario: still loads
    assert len(reopened.chunk_order) == 100
    store.save()
    after = sorted(p.name for p in seg_dir.iterdir())
    assert after != before and len(after) == 1  # compacted segment only
    fresh = Store(str(tmp_path / "s"))
    assert len(fresh.chunk_order) == 30
