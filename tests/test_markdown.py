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
