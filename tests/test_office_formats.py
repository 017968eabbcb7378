"""Office/structured-format ingestion (utils/office.py) — the first-party
replacement for the reference's pypandoc fallback (_markdown.py:197-221).
Each test constructs a REAL file of the target format and converts it
through the public document_to_markdown entry point."""

import zipfile

from raglite_tpu.markdown import document_to_markdown

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _make_docx(path, paragraphs):
    body = []
    for style, text in paragraphs:
        ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        body.append(f"<w:p>{ppr}<w:r><w:t>{text}</w:t></w:r></w:p>")
    xml = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
            'package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", xml)


def test_docx(tmp_path):
    path = tmp_path / "doc.docx"
    _make_docx(
        path,
        [("Heading1", "Relativity"), ("", "Moving clocks run slow."),
         ("Heading2", "Length"), ("", "Rods contract along the motion axis.")],
    )
    markdown = document_to_markdown(path)
    assert "# Relativity" in markdown
    assert "## Length" in markdown
    assert "Moving clocks run slow." in markdown


def test_epub(tmp_path):
    path = tmp_path / "book.epub"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "ch1.xhtml",
            "<html><body><h1>Chapter One</h1><p>It was a dark night.</p></body></html>",
        )
        zf.writestr(
            "ch2.xhtml",
            "<html><body><h1>Chapter Two</h1><p>Dawn finally broke.</p></body></html>",
        )
    markdown = document_to_markdown(path)
    assert "# Chapter One" in markdown and "# Chapter Two" in markdown
    assert markdown.index("dark night") < markdown.index("Dawn finally")


def test_rtf(tmp_path):
    path = tmp_path / "note.rtf"
    path.write_text(
        r"{\rtf1\ansi{\fonttbl{\f0 Calibri;}}\f0 First paragraph.\par "
        r"Second paragraph with \u233?clair.\par}"
    )
    markdown = document_to_markdown(path)
    assert "First paragraph." in markdown
    assert "éclair" in markdown
    assert "Calibri" not in markdown  # font table is a skipped destination


def test_csv_tsv(tmp_path):
    path = tmp_path / "data.csv"
    path.write_text("name,score\nalice,10\nbob,12\n")
    markdown = document_to_markdown(path)
    assert "| name | score |" in markdown
    assert "| --- | --- |" in markdown
    assert "| bob | 12 |" in markdown
    tsv = tmp_path / "data.tsv"
    tsv.write_text("a\tb\n1\t2\n")
    assert "| a | b |" in document_to_markdown(tsv)


def test_json_code_block(tmp_path):
    path = tmp_path / "conf.json"
    path.write_text('{"key": "value"}')
    markdown = document_to_markdown(path)
    assert markdown.startswith("```json\n")
    assert '"key": "value"' in markdown


def test_docx_insert_roundtrip(tmp_path):
    """A .docx flows through the full insert+search pipeline."""
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.documents import Document
    from raglite_tpu.insert import insert_documents
    from raglite_tpu.search import keyword_search

    path = tmp_path / "paper.docx"
    _make_docx(
        path,
        [("Heading1", "Glacier Study")]
        + [("", "The glacier advances three meters per year in spring.")] * 30,
    )
    config = RAGLiteConfig(store_path=str(tmp_path / "store"), embedder="hash:128", llm="echo")
    insert_documents([Document.from_path(path)], config=config)
    ids, _ = keyword_search("glacier advances spring", num_results=3, config=config)
    assert ids
