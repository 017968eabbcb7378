"""Chunklet splitter tests (reference: tests/test_split_chunklets.py)."""

import numpy as np

from raglite_tpu.chunklets import (
    compute_num_statements,
    markdown_chunklet_boundaries,
    split_chunklets,
)


def test_concatenation_invariant(specrel_markdown: str) -> None:
    from raglite_tpu.sentences import split_sentences

    sentences = split_sentences(specrel_markdown, max_len=2048)
    chunklets = split_chunklets(sentences, max_size=2048)
    assert "".join(chunklets) == specrel_markdown
    assert all(len(c) <= 2048 for c in chunklets)


def test_heading_starts_chunklet() -> None:
    sentences = [
        *[f"Sentence {i} with several useful words here. " for i in range(3)],
        "A final sentence before the heading arrives.\n\n",
        "# Heading\n\n",
        *[f"Trailing sentence {i} with several more words. " for i in range(4)],
    ]
    chunklets = split_chunklets(sentences)
    # The heading starts a new chunklet.
    assert any(c.startswith("# Heading") for c in chunklets)


def test_boundary_probabilities() -> None:
    sentences = ["# Head\n\n", "Paragraph one sentence. ", "And another one here.\n"]
    probas = markdown_chunklet_boundaries(sentences)
    assert probas.shape == (3,)
    assert probas[0] == 1.0  # heading
    # Consecutive-boundary suppression keeps only the max in a run.
    assert probas[1] == 0.0


def test_num_statements_monotone() -> None:
    sentences = ["one two three. ", "one two three four five six. ", "one two. "]
    stmts = compute_num_statements(sentences)
    assert stmts.shape == (3,)
    assert stmts[1] > stmts[0] > stmts[2]


def test_custom_cost_functions() -> None:
    sentences = ["Sentence number %d goes here. " % i for i in range(10)]
    default = split_chunklets(sentences)
    # A statement cost targeting 1 statement makes chunklets smaller.
    tiny = split_chunklets(sentences, statement_cost=lambda s: (s - 1.0) ** 2)
    assert len(tiny) >= len(default)
    assert "".join(tiny) == "".join(sentences)


def test_max_size_respected() -> None:
    sentences = ["word " * 20 for _ in range(50)]  # 100 chars each
    chunklets = split_chunklets(sentences, max_size=250)
    assert all(len(c) <= 250 for c in chunklets)


def test_empty() -> None:
    assert split_chunklets([]) == []
