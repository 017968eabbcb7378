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
