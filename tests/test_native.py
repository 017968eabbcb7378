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
        self.deleted_chunks: set[str] = set()


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


def test_native_hash_featurize_matches_python() -> None:
    from raglite_tpu.models.encoder import HashEncoder, _TOKEN_RE
    from raglite_tpu.native import hash_featurize, count_tokens

    encoder = HashEncoder(dim=32)
    for text in CORPUS + ["punct...only?!", "a bb ccc dddd"]:
        tokens = _TOKEN_RE.findall(text.lower())[: encoder.max_tokens]
        py_ids, py_signs, py_bounds = [], [], [0]
        for token in tokens:
            f_ids, f_signs = encoder._features(token)
            py_ids.extend(f_ids)
            py_signs.extend(f_signs)
            py_bounds.append(len(py_ids))
        ids, signs, bounds, n = hash_featurize(
            text, max_tokens=encoder.max_tokens, mask=encoder._mask
        )
        assert n == len(tokens), text
        np.testing.assert_array_equal(ids, np.asarray(py_ids, np.int32))
        np.testing.assert_array_equal(signs, np.asarray(py_signs, np.float32))
        np.testing.assert_array_equal(bounds, np.asarray(py_bounds, np.int64))
        assert count_tokens(text) == len(tokens)


def test_native_fused_hash_embed_matches_jax_pool() -> None:
    import jax.numpy as jnp

    from raglite_tpu.models.encoder import HashEncoder, _hash_pool
    from raglite_tpu.native import hash_embed

    encoder = HashEncoder(dim=64)
    text = "Einstein defines simultaneity operationally; clocks synchronize via light signals."
    ids, signs, bounds, n = encoder._featurize(text)
    f_pad, t_pad = 512, 64
    segments = np.repeat(np.arange(n, dtype=np.int32), np.diff(bounds))
    jax_out = np.asarray(
        _hash_pool(
            encoder._table,
            jnp.asarray(np.pad(ids, (0, f_pad - len(ids)))),
            jnp.asarray(np.pad(signs, (0, f_pad - len(signs)))),
            jnp.asarray(np.pad(segments, (0, f_pad - len(segments)), constant_values=t_pad)),
            num_segments=t_pad + 1,
        )
    )[:n]
    table_np = np.ascontiguousarray(np.asarray(encoder._table, np.float32))
    cpp_out = hash_embed(text, table_np, max_tokens=encoder.max_tokens, mask=encoder._mask)
    np.testing.assert_allclose(cpp_out, jax_out, rtol=2e-4, atol=2e-5)


def test_native_boundary_dp_matches_python_fuzz() -> None:
    """The C++ sentence-boundary DP is byte-identical to the Python DP over
    randomized inputs (300 cases; sentences.py:_solve_boundaries)."""
    import raglite_tpu.native as native_mod
    import raglite_tpu.sentences as sentences_mod

    rng = np.random.default_rng(3)

    def python_solve(probas, min_len, max_len):
        original = native_mod.solve_boundaries
        native_mod.solve_boundaries = lambda *a, **k: False
        try:
            return sentences_mod._solve_boundaries(probas, min_len=min_len, max_len=max_len)
        finally:
            native_mod.solve_boundaries = original

    for _ in range(300):
        n = int(rng.integers(1, 200))
        probas = rng.uniform(0, 1, n).astype(np.float32)
        min_len = int(rng.integers(1, 8))
        max_len = None if rng.random() < 0.4 else int(rng.integers(min_len, 4 * min_len + 20))
        expected = python_solve(probas, min_len, max_len)
        actual = sentences_mod._solve_boundaries(probas, min_len=min_len, max_len=max_len)
        assert actual == expected, (n, min_len, max_len)


def test_native_chunklet_dp_matches_python_fuzz() -> None:
    """The C++ chunklet DP matches the Python DP over randomized inputs
    (chunklets.py:split_chunklets default-cost path)."""
    import raglite_tpu.chunklets as chunklets_mod
    import raglite_tpu.native as native_mod

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "waves", "light", "clock", "frame"]

    def python_split(sentences, max_size):
        original = native_mod.split_chunklet_cuts
        native_mod.split_chunklet_cuts = lambda *a, **k: None
        try:
            return chunklets_mod.split_chunklets(sentences, max_size=max_size)
        finally:
            native_mod.split_chunklet_cuts = original

    for _ in range(120):
        n = int(rng.integers(1, 60))
        sentences = []
        for _ in range(n):
            k = int(rng.integers(1, 14))
            prefix = "# " if rng.random() < 0.15 else ("- " if rng.random() < 0.1 else "")
            sentences.append(
                prefix + " ".join(rng.choice(words, k)) + (".\n" if rng.random() < 0.5 else ". ")
            )
        max_size = int(rng.integers(30, 400))
        assert python_split(sentences, max_size) == chunklets_mod.split_chunklets(
            sentences, max_size=max_size
        )
