"""Shared, cached markdown-it parsing.

The insert pipeline parses the SAME document text twice — once for
sentence-boundary overrides (sentences.py) and once for chunklet
boundaries (chunklets.py) — and profiling showed the markdown-it parse as
the largest host cost per document (~0.15 s on specrel).  One shared
parser instance plus an LRU over the token streams halves that.
"""

from __future__ import annotations

from functools import lru_cache

from markdown_it import MarkdownIt

_MD = MarkdownIt()


@lru_cache(maxsize=8)
def _parse_markdown_cached(doc: str):
    """Token stream for ``doc`` (cached; markdown-it tokens are read-only
    by convention here — callers must not mutate them)."""
    return _MD.parse(doc)


def parse_markdown(doc: str) -> tuple:
    """Token stream for ``doc``, cached and returned as an immutable tuple —
    sentences.py, chunklets.py, and documents.py all receive the SAME cached
    parse, and markdown-it tokens are mutable objects (a tuple prevents a
    future caller from appending/reordering the shared stream; token
    attributes remain read-only by convention)."""
    return tuple(_parse_markdown_cached(doc))


def newline_offsets(doc: str) -> list[int]:
    """Character offset of every markdown LINE start (\n-separated).

    str.splitlines also splits on \x0c/\x0b/\u2028/... which markdown-it
    does NOT count as lines, so token.map line numbers would otherwise point
    at the wrong offsets for PDF-extracted text containing form feeds."""
    offsets = [0]
    pos = doc.find("\n")
    while pos != -1:
        offsets.append(pos + 1)
        pos = doc.find("\n", pos + 1)
    return offsets
