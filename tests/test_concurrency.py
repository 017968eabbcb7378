"""Concurrency-safety tests (SURVEY §5.2: safety by construction).

The reference serializes cross-process writers with FileLock and relies on
frozen config + lru-cached singletons; here we additionally verify that
searches running concurrently with inserts never crash or return stale
garbage (the device index is an immutable snapshot per version)."""

import threading

import numpy as np

from raglite_tpu import Document, RAGLiteConfig, hybrid_search, insert_documents, vector_search


def test_search_during_insert(tmp_path) -> None:
    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:128", llm="echo")
    insert_documents(
        [Document.from_text("# Base\n\n" + "Photons carry momentum and energy. " * 60)],
        config=config,
    )
    errors: list[Exception] = []
    stop = threading.Event()

    def searcher() -> None:
        while not stop.is_set():
            try:
                ids, scores = vector_search("photon momentum", num_results=3, config=config)
                assert all(np.isfinite(s) for s in scores)
                hybrid_search("photon momentum", num_results=3, config=config)
            except Exception as err:  # pragma: no cover - failure path
                errors.append(err)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for thread in threads:
        thread.start()
    try:
        for i in range(4):
            insert_documents(
                [Document.from_text(f"# Doc {i}\n\n" + f"Fact {i} about waves. " * 50)],
                config=config,
            )
    finally:
        stop.set()
        for thread in threads:
            thread.join(timeout=30)
    assert not errors, errors
    ids, _ = vector_search("photon momentum", num_results=3, config=config)
    assert ids


def test_webchat_binary_pdf_upload(tmp_path) -> None:
    """The web upload path parses binary PDFs through the document pipeline."""
    from raglite_tpu.webchat import create_web_app

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:128", llm="echo")
    app = create_web_app(config)
    pdf_bytes = open("/root/reference/tests/specrel.pdf", "rb").read()
    result = app.handle_upload("specrel.pdf", pdf_bytes)
    assert result["status"] == "inserted"
    ids, _ = vector_search("simultaneity", num_results=3, config=config)
    assert ids
