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


def _make_pptx(path):
    import zipfile

    slide1 = """<?xml version="1.0"?>
<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:cSld><p:spTree>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
   <p:txBody><a:p><a:r><a:t>Quarterly Results</a:t></a:r></a:p></p:txBody></p:sp>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr></p:nvSpPr>
   <p:txBody><a:p><a:r><a:t>Revenue grew 12 percent</a:t></a:r></a:p>
   <a:p><a:r><a:t>Costs held flat</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld></p:sld>"""
    slide2 = """<?xml version="1.0"?>
<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:cSld><p:spTree>
  <p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
   <p:txBody><a:p><a:r><a:t>Untitled slide body</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld></p:sld>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide1)
        zf.writestr("ppt/slides/slide2.xml", slide2)
    return path


def _make_odt(path):
    import zipfile

    content = """<?xml version="1.0"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:text>
  <text:h text:outline-level="1">Report Title</text:h>
  <text:p>First paragraph with <text:span>inline span</text:span> text.</text:p>
  <text:h text:outline-level="2">Findings</text:h>
  <text:list>
   <text:list-item><text:p>finding one</text:p></text:list-item>
   <text:list-item><text:p>finding two</text:p></text:list-item>
  </text:list>
 </office:text></office:body></office:document-content>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("content.xml", content)
    return path


def test_pptx_to_markdown(tmp_path) -> None:
    from raglite_tpu.markdown import document_to_markdown

    path = _make_pptx(tmp_path / "deck.pptx")
    md = document_to_markdown(path)
    assert "## Quarterly Results" in md
    assert "- Revenue grew 12 percent" in md
    assert "- Costs held flat" in md
    assert "## Slide 2" in md  # untitled slide gets a positional heading
    assert "- Untitled slide body" in md


def test_odt_to_markdown(tmp_path) -> None:
    from raglite_tpu.markdown import document_to_markdown

    path = _make_odt(tmp_path / "report.odt")
    md = document_to_markdown(path)
    assert "# Report Title" in md
    assert "First paragraph with inline span text." in md
    assert "## Findings" in md
    assert "- finding one" in md and "- finding two" in md


def test_pptx_odt_insert_end_to_end(tmp_path) -> None:
    """The new formats flow through the full ingestion pipeline."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents, keyword_search

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    insert_documents(
        [
            Document.from_path(_make_pptx(tmp_path / "deck.pptx")),
            Document.from_path(_make_odt(tmp_path / "report.odt")),
        ],
        config=config,
    )
    ids, _ = keyword_search("revenue grew", num_results=2, config=config)
    assert ids
