"""First-party C++ postings builder tests (native/postings.cpp).

Parity model: the native builder must produce the same postings as the
pure-Python dict build (index/keyword.py) — same terms, same tfs, same
doc lengths — and identical BM25 search results through KeywordIndex.
"""

import numpy as np
import pytest

from raglite_tpu.index.keyword import KeywordIndex, tokenize
from raglite_tpu.native import NativePostingsBuilder, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")

CORPUS = [
    "Hello world, hello TPU!",
    "The world of TPUs: fast matmuls, faster scans.",
    "Einstein's 1905 paper defines simultaneity operationally.",
    "Unicode accents work too.",
]


def test_native_postings_match_python_build() -> None:
    builder = NativePostingsBuilder()
    for text in CORPUS:
        builder.add_chunk(text)
    exported = builder.export()

    # Python oracle build.
    postings: dict[str, dict[int, int]] = {}
    doc_len = []
    for ordinal, text in enumerate(CORPUS):
        tokens = tokenize(text)
        doc_len.append(len(tokens))
        for token in tokens:
            postings.setdefault(token, {})[ordinal] = postings.get(token, {}).get(ordinal, 0) + 1

    assert sorted(exported["terms"]) == sorted(postings)
    assert list(exported["doc_len"]) == doc_len
    for tid, term in enumerate(exported["terms"]):
        lo, hi = exported["offsets"][tid], exported["offsets"][tid + 1]
        got = dict(zip(exported["chunks"][lo:hi].tolist(), exported["tf"][lo:hi].tolist()))
        assert got == postings[term], term


def test_native_tokenize_lookup_and_save_roundtrip() -> None:
    builder = NativePostingsBuilder()
    for text in CORPUS:
        builder.add_chunk(text)
    ids = builder.tokenize_lookup("Hello WORLD unknownterm")
    assert len(ids) == 2
    assert builder.lookup("hello") in ids
    restored = NativePostingsBuilder.loads(builder.save())
    a, b = builder.export(), restored.export()
    assert a["terms"] == b["terms"]
    np.testing.assert_array_equal(a["offsets"], b["offsets"])
    np.testing.assert_array_equal(a["chunks"], b["chunks"])
    np.testing.assert_array_equal(a["tf"], b["tf"])
    np.testing.assert_array_equal(a["doc_len"], b["doc_len"])


class _FakeChunk:
    def __init__(self, body: str) -> None:
        self.body = body


class _FakeStore:
    def __init__(self, texts: list[str]) -> None:
        self.chunk_order = [f"c{i}" for i in range(len(texts))]
        self.chunks = {f"c{i}": _FakeChunk(t) for i, t in enumerate(texts)}
        self.version = 1


def test_keyword_index_native_vs_python_search_parity() -> None:
    store = _FakeStore(CORPUS)
    native_index = KeywordIndex()
    assert native_index._native is not None
    native_index.rebuild(store)

    python_index = KeywordIndex()
    python_index._native = None
    python_index.rebuild(store)

    for query in ["hello world", "simultaneity", "fast TPU matmuls", "zzz nothing"]:
        ids_n, scores_n = native_index.search(query, num_hits=4)
        ids_p, scores_p = python_index.search(query, num_hits=4)
        assert ids_n == ids_p, query
        np.testing.assert_allclose(scores_n, scores_p, rtol=1e-5)
