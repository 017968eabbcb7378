"""PDF -> Markdown conversion tests (reference: tests/test_markdown.py)."""

import re

from tests.conftest import SPECREL_PDF


def test_specrel_headings(specrel_markdown: str) -> None:
    """Heading levels are reconstructed from font sizes."""
    doc = specrel_markdown
    norm = re.sub(r"\s+", " ", doc)
    assert norm.startswith("# ON THE ELECTRODYNAMICS OF MOVING BODIES")
    assert "EINSTEIN" in norm[:200]
    # Section headings appear as ATX headings.
    assert re.search(r"^#+ .*Definition of Simultaneity", doc, flags=re.M)
    assert re.search(r"^# I\. KINEMATICAL PART", doc, flags=re.M)
    assert re.search(r"^# II\. ELECTRODYNAMICAL PART", doc, flags=re.M)


def test_specrel_body_text(specrel_markdown: str) -> None:
    """Body prose survives extraction with word spacing."""
    norm = re.sub(r"\s+", " ", specrel_markdown)
    assert "It is known that Maxwell's electrodynamics" in norm
    assert "the same laws of electrodynamics and optics will be valid" in norm


def test_page_numbers_stripped(specrel_markdown: str) -> None:
    assert not re.search(r"^\s*7\s*$", specrel_markdown, flags=re.M)


def test_plain_text_passthrough(tmp_path) -> None:
    from raglite_tpu.markdown import document_to_markdown

    p = tmp_path / "doc.md"
    p.write_text("# Title\n\nBody text.\n")
    assert document_to_markdown(p) == "# Title\n\nBody text.\n"


def test_pdf_parser_pages() -> None:
    from raglite_tpu.utils.pdf import parse_pdf

    pages = parse_pdf(SPECREL_PDF)
    assert len(pages) == 23
    assert all(page.blocks for page in pages)


def test_html_to_markdown() -> None:
    from raglite_tpu.markdown import html_to_markdown

    html = (
        "<html><head><title>skip</title></head><body>"
        "<h1>Relativity</h1><p>On <strong>simultaneity</strong> and <em>light</em>.</p>"
        "<ul><li>alpha</li><li>beta <code>c</code></li></ul>"
        '<p>See <a href="http://x.test">the paper</a>.</p>'
        "</body></html>"
    )
    markdown = html_to_markdown(html)
    assert "# Relativity" in markdown
    assert "**simultaneity**" in markdown
    assert "- alpha" in markdown
    assert "[the paper](http://x.test)" in markdown
    assert "skip" not in markdown


def test_document_to_markdown_html(tmp_path) -> None:
    from raglite_tpu.markdown import document_to_markdown

    page = tmp_path / "page.html"
    page.write_text("<h2>Section</h2><p>Body text.</p>")
    markdown = document_to_markdown(page)
    assert markdown.startswith("## Section")
    assert "Body text." in markdown


def _mini_pdf(tmp_path, *, scrambled_pages: bool, contents_array: bool):
    """Hand-built two-page PDF: page objects numbered out of reading order
    (the /Kids array defines the order), optionally with /Contents pointing
    at an ARRAY object of stream refs (PDF 32000 s7.7.3.3)."""

    def stream_obj(text):
        payload = f"BT /F1 12 Tf 72 700 Td ({text}) Tj ET".encode()
        return b"<< /Length " + str(len(payload)).encode() + b" >>\nstream\n" + payload + b"\nendstream"

    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [10 0 R 3 0 R] /Count 2 >>",  # 10 BEFORE 3
        4: font,
        5: stream_obj("first page text"),
        6: stream_obj("second page text"),
    }
    if contents_array:
        objs[7] = b"[5 0 R]"  # indirect ARRAY of content streams
        first_contents = b"/Contents 7 0 R"
    else:
        first_contents = b"/Contents 5 0 R"
    objs[10] = (
        b"<< /Type /Page /Parent 2 0 R " + first_contents
        + b" /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] >>"
    )
    objs[3] = (
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
        + b" /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] >>"
    )
    if not scrambled_pages:  # reading order == object order
        objs[3], objs[10] = objs[10], objs[3]
        objs[2] = b"<< /Type /Pages /Kids [3 0 R 10 0 R] /Count 2 >>"
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objs)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size " + str(max_num + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    path = tmp_path / "mini.pdf"
    path.write_bytes(bytes(out))
    return path


def test_pdf_page_tree_order(tmp_path) -> None:
    """Pages follow the /Kids reading order, not object-number order
    (regression: object 3 sorted before object 10, scrambling the text)."""
    from raglite_tpu.utils.pdf import parse_pdf

    path = _mini_pdf(tmp_path, scrambled_pages=True, contents_array=False)
    pages = parse_pdf(path)
    texts = [
        " ".join(s.text for b in p.blocks for ln in b.lines for s in ln.spans)
        for p in pages
    ]
    assert len(pages) == 2
    assert "first page" in texts[0]
    assert "second page" in texts[1]


def test_pdf_contents_indirect_array(tmp_path) -> None:
    """/Contents referencing an ARRAY object of stream refs must still
    yield the page text (regression: the page parsed as empty)."""
    from raglite_tpu.utils.pdf import parse_pdf

    path = _mini_pdf(tmp_path, scrambled_pages=False, contents_array=True)
    pages = parse_pdf(path)
    texts = [
        " ".join(s.text for b in p.blocks for ln in b.lines for s in ln.spans)
        for p in pages
    ]
    assert "first page" in texts[0]
