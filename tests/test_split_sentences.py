"""Sentence splitter tests (reference: tests/test_split_sentences.py)."""

import numpy as np
import pytest

from raglite_tpu.sentences import (
    heuristic_sentence_boundaries,
    markdown_sentence_boundaries,
    split_sentences,
)


def test_concatenation_invariant(specrel_markdown: str) -> None:
    sentences = split_sentences(specrel_markdown, max_len=2048)
    assert "".join(sentences) == specrel_markdown


def test_no_leading_whitespace(specrel_markdown: str) -> None:
    sentences = split_sentences(specrel_markdown, max_len=2048)
    assert all(not s[0].isspace() for s in sentences[1:] if s)
    assert all(s.strip() for s in sentences)


def test_length_bounds(specrel_markdown: str) -> None:
    sentences = split_sentences(specrel_markdown, min_len=4, max_len=2048)
    assert all(len(s) >= 4 for s in sentences)
    assert all(len(s) <= 2048 for s in sentences)


def test_basic_prose() -> None:
    doc = "The cat sat on the mat. The dog barked loudly. Both animals were happy.\n"
    sentences = split_sentences(doc)
    assert sentences == [
        "The cat sat on the mat. ",
        "The dog barked loudly. ",
        "Both animals were happy.\n",
    ]


def test_abbreviations_not_split() -> None:
    doc = "Dr. Smith met Mr. Jones at the lab. They discussed e.g. the results together.\n"
    sentences = split_sentences(doc)
    assert len(sentences) == 2
    assert sentences[0].endswith("at the lab. ")


def test_headings_are_sentences() -> None:
    doc = "# Title\n\nSome body text that continues here. And another sentence follows now.\n"
    sentences = split_sentences(doc)
    assert sentences[0] == "# Title\n\n"


@pytest.mark.parametrize("doc", ["", "Hi.", "A"])
def test_tiny_docs(doc: str) -> None:
    assert split_sentences(doc) == [doc]


def test_max_len_enforced() -> None:
    doc = "word " * 200  # 1000 chars, no sentence punctuation
    sentences = split_sentences(doc, max_len=128)
    assert all(len(s) <= 128 for s in sentences)
    assert "".join(sentences) == doc


def test_markdown_boundaries_shape() -> None:
    doc = "# Head\n\nBody.\n"
    probas = markdown_sentence_boundaries(doc)
    assert probas.shape == (len(doc),)
    # Inside the heading there are no boundaries.
    assert np.all(probas[1:6] == 0.0)


def test_heuristic_boundaries_shape() -> None:
    doc = "One. Two."
    probas = heuristic_sentence_boundaries(doc)
    assert probas.shape == (len(doc),)
    assert probas[3] > 0.5


def test_heading_without_blank_line_is_one_sentence() -> None:
    """A heading directly followed by text must be exactly one sentence
    (regression: the boundary landed one character late, gluing the next
    line's first character onto the heading)."""
    out = split_sentences("Intro text here.\n## Heading\nNext paragraph starts here now.")
    assert "## Heading\n" in out
    assert any(s.startswith("Next paragraph") for s in out)


def test_infeasible_length_constraints_raise() -> None:
    """min_len/max_len combinations with no valid split must surface the
    documented error instead of silently violating max_len (regression:
    the too-short early exit skipped the max_len feasibility check)."""
    from raglite_tpu.sentences import _solve_boundaries

    assert _solve_boundaries(np.asarray([0.1] * 5), min_len=3, max_len=4) is None
    assert _solve_boundaries(np.asarray([0.1] * 5), min_len=3, max_len=5) == []
