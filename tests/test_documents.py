"""Document/Chunk/ChunkSpan record tests (reference: _database.py semantics)."""

from raglite_tpu.documents import Chunk, ChunkSpan, Document, Eval, hash_bytes


def test_document_from_text_id_is_content_hash() -> None:
    doc = Document.from_text("Hello world.\nMore text.")
    assert doc.id == hash_bytes(b"Hello world.\nMore text.")
    assert doc.filename == "Hello world."
    assert doc.metadata_["size"] == [len(b"Hello world.\nMore text.")]


def test_document_front_matter() -> None:
    doc = Document.from_text("content", filename="f.md", author="Ada")
    assert doc.front_matter.startswith("---\n")
    assert "author: ['Ada']" in doc.front_matter


def test_chunk_headings_truncation() -> None:
    doc = Document.from_text("x", filename="d.md")
    # A chunk starting with an h2 drops contextual headings at level >= 2.
    chunk = Chunk.from_body(doc, 0, "## New Section\n\nBody.", headings="# Title\n## Old Section")
    assert chunk.headings == "# Title"


def test_chunk_contextual_headings_kept() -> None:
    doc = Document.from_text("x", filename="d.md")
    chunk = Chunk.from_body(doc, 0, "Plain body text.", headings="# Title\n## Section")
    assert chunk.headings == "# Title\n## Section"


def test_chunk_extract_headings_rolls_forward() -> None:
    doc = Document.from_text("x", filename="d.md")
    chunk = Chunk.from_body(doc, 0, "## Sub\n\nBody.", headings="# Title")
    assert chunk.extract_headings() == "# Title\n## Sub"


def test_chunk_content_and_str() -> None:
    doc = Document.from_text("x", filename="d.md")
    chunk = Chunk.from_body(doc, 3, "Body here.", headings="# T")
    assert "filename: d.md" in chunk.content
    assert chunk.content.endswith("Body here.")
    assert str(chunk) == chunk.content


def test_chunk_span_xml_and_json() -> None:
    doc = Document.from_text("x", filename="d.md")
    c0 = Chunk.from_body(doc, 0, "First. ", headings="# T")
    c1 = Chunk.from_body(doc, 1, "Second.", headings="# T")
    span = ChunkSpan(chunks=[c0, c1])
    xml = span.to_xml(index=2)
    assert xml.startswith(f'<document index="2" id="{doc.id}">')
    assert "First. Second." in xml
    import json

    payload = json.loads(span.to_json(index=1))
    assert payload["index"] == 1
    assert payload["span"]["from_chunk_id"] == c0.id
    assert payload["span"]["content"] == "First. Second."


def test_eval_from_chunks() -> None:
    doc = Document.from_text("x", filename="d.md")
    c0 = Chunk.from_body(doc, 0, "Body.", headings="")
    ev = Eval.from_chunks("What?", [c0], "Answer.")
    assert ev.document_id == doc.id
    assert ev.chunk_ids == [c0.id]
    assert ev.contexts == [c0.content]


def test_corrupt_store_records_raise_cleanly(tmp_path) -> None:
    """Corrupt persisted records raise a parse error, not an opaque crash."""
    import pytest

    from raglite_tpu.store import Store

    root = tmp_path / "kb"
    root.mkdir()
    (root / "records.msgpack").write_bytes(b"\xc1 corrupt \xff")
    with pytest.raises(Exception):  # noqa: B017 - any decode error is acceptable
        Store(str(root))


def test_python_dash_m_entrypoint() -> None:
    import subprocess
    import sys

    result = subprocess.run(
        [sys.executable, "-m", "raglite_tpu", "--help"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert result.returncode == 0
    assert "RAGLite-TPU" in result.stdout or "raglite-tpu" in result.stdout
