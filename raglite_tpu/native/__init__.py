"""First-party native (C++) runtime components.

The reference delegates its host-side index builds to third-party native
code (DuckDB FTS/VSS, pgvector — SURVEY.md §2.2); here the native layer is
first-party C++ compiled on first use and reached via ctypes (no pybind11
in the image).  Components:

- ``postings.cpp`` — inverted-index builder: UTF-8 tokenizer, term
  dictionary, CSR postings export, binary serialization.  Feeds the on-TPU
  BM25 scorer (ops/bm25.py).

The toolchain is g++ (baked in).  The compiled library is cached next to
the sources; if compilation fails (no toolchain), callers fall back to the
pure-Python implementations — behavior is identical, only slower.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_LIB_PATH = _SRC_DIR / "_build" / "libraglite_native.so"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def _compile() -> Path | None:
    _LIB_PATH.parent.mkdir(exist_ok=True)
    sources = [_SRC_DIR / "postings.cpp", _SRC_DIR / "hnsw.cpp"]
    if _LIB_PATH.exists() and all(
        _LIB_PATH.stat().st_mtime >= src.stat().st_mtime for src in sources
    ):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *[str(src) for src in sources], "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as exc:
        logger.warning("native build failed (%s); using Python fallback", exc)
        return None
    return _LIB_PATH


def load_native() -> ctypes.CDLL | None:
    """Compile (once) and load the native library; None on failure."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        path = _compile()
        if path is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(str(path))
        c_void, c_char_p = ctypes.c_void_p, ctypes.c_char_p
        c_i32, c_i64 = ctypes.c_int32, ctypes.c_int64
        lib.rlt_builder_new.restype = c_void
        lib.rlt_builder_free.argtypes = [c_void]
        lib.rlt_builder_add_chunk.argtypes = [c_void, c_char_p, c_i64]
        lib.rlt_builder_add_chunk.restype = c_i32
        lib.rlt_builder_num_terms.argtypes = [c_void]
        lib.rlt_builder_num_terms.restype = c_i32
        lib.rlt_builder_num_chunks.argtypes = [c_void]
        lib.rlt_builder_num_chunks.restype = c_i32
        lib.rlt_builder_num_postings.argtypes = [c_void]
        lib.rlt_builder_num_postings.restype = c_i64
        lib.rlt_builder_dict_bytes.argtypes = [c_void]
        lib.rlt_builder_dict_bytes.restype = c_i64
        lib.rlt_builder_export.argtypes = [c_void] + [ctypes.c_void_p] * 6
        lib.rlt_builder_lookup.argtypes = [c_void, c_char_p, c_i64]
        lib.rlt_builder_lookup.restype = c_i32
        lib.rlt_builder_tokenize_lookup.argtypes = [c_void, c_char_p, c_i64, ctypes.c_void_p, c_i32]
        lib.rlt_builder_tokenize_lookup.restype = c_i32
        lib.rlt_builder_save_size.argtypes = [c_void]
        lib.rlt_builder_save_size.restype = c_i64
        lib.rlt_builder_save.argtypes = [c_void, ctypes.c_void_p]
        lib.rlt_builder_load.argtypes = [c_char_p, c_i64]
        lib.rlt_builder_load.restype = c_void
        lib.rlt_hash_featurize.argtypes = [
            c_char_p, c_i64, c_i32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, c_i64,
        ]
        lib.rlt_hash_featurize.restype = c_i32
        lib.rlt_count_tokens.argtypes = [c_char_p, c_i64]
        lib.rlt_count_tokens.restype = c_i32
        lib.rlt_hash_embed.argtypes = [
            c_char_p, c_i64, c_i32, ctypes.c_uint32,
            ctypes.c_void_p, c_i32, ctypes.c_void_p,
        ]
        lib.rlt_hash_embed.restype = c_i32
        lib.rlt_solve_boundaries.argtypes = [
            ctypes.c_void_p, c_i64, c_i64, c_i64, ctypes.c_float, ctypes.c_void_p,
        ]
        lib.rlt_solve_boundaries.restype = c_i64
        lib.rlt_split_chunklets.argtypes = [ctypes.c_void_p] * 4 + [c_i64, c_i64, ctypes.c_void_p]
        lib.rlt_split_chunklets.restype = c_i64
        lib.rlt_hnsw_new.argtypes = [c_i32, c_i32, c_i32, c_i32, ctypes.c_uint64]
        lib.rlt_hnsw_new.restype = c_void
        lib.rlt_hnsw_free.argtypes = [c_void]
        lib.rlt_hnsw_add.argtypes = [c_void, ctypes.c_void_p, c_i64]
        lib.rlt_hnsw_size.argtypes = [c_void]
        lib.rlt_hnsw_size.restype = c_i32
        lib.rlt_hnsw_memory_bytes.argtypes = [c_void]
        lib.rlt_hnsw_memory_bytes.restype = c_i64
        lib.rlt_hnsw_search.argtypes = [
            c_void, ctypes.c_void_p, c_i64, c_i32, c_i32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


class NativePostingsBuilder:
    """ctypes wrapper over the C++ inverted-index builder."""

    def __init__(self, _handle: int | None = None) -> None:
        lib = load_native()
        if lib is None:
            msg = "native library unavailable"
            raise RuntimeError(msg)
        self._lib = lib
        self._handle = _handle if _handle is not None else lib.rlt_builder_new()

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.rlt_builder_free(self._handle)
            self._handle = None

    def add_chunk(self, text: str) -> int:
        # Lowercase HERE: Python str.lower() covers all of Unicode, while
        # the C++ lower_cp only maps ASCII/Latin-1 — without this, native
        # BM25 would be case-sensitive for Greek/Cyrillic/etc. and diverge
        # from the Python fallback tokenizer (index/keyword.py).
        data = text.lower().encode("utf-8")
        return int(self._lib.rlt_builder_add_chunk(self._handle, data, len(data)))

    @property
    def num_terms(self) -> int:
        return int(self._lib.rlt_builder_num_terms(self._handle))

    @property
    def num_chunks(self) -> int:
        return int(self._lib.rlt_builder_num_chunks(self._handle))

    @property
    def num_postings(self) -> int:
        return int(self._lib.rlt_builder_num_postings(self._handle))

    def export(self) -> dict[str, np.ndarray | list[str]]:
        """CSR postings + dictionary as numpy arrays (device-upload ready)."""
        n_terms, n_chunks = self.num_terms, self.num_chunks
        n_post = self.num_postings
        dict_bytes = int(self._lib.rlt_builder_dict_bytes(self._handle))
        offsets = np.zeros(n_terms + 1, np.int64)
        chunks = np.zeros(max(n_post, 1), np.int32)
        tf = np.zeros(max(n_post, 1), np.int32)
        doc_len = np.zeros(max(n_chunks, 1), np.int32)
        term_offsets = np.zeros(n_terms + 1, np.int64)
        term_bytes = np.zeros(max(dict_bytes, 1), np.uint8)
        self._lib.rlt_builder_export(
            self._handle,
            offsets.ctypes.data, chunks.ctypes.data, tf.ctypes.data,
            doc_len.ctypes.data, term_offsets.ctypes.data, term_bytes.ctypes.data,
        )
        raw = term_bytes.tobytes()
        terms = [
            raw[term_offsets[t] : term_offsets[t + 1]].decode("utf-8")
            for t in range(n_terms)
        ]
        return {
            "offsets": offsets,
            "chunks": chunks[:n_post],
            "tf": tf[:n_post],
            "doc_len": doc_len[:n_chunks],
            "terms": terms,
        }

    def lookup(self, term: str) -> int:
        data = term.lower().encode("utf-8")
        return int(self._lib.rlt_builder_lookup(self._handle, data, len(data)))

    def tokenize_lookup(self, text: str, cap: int = 256) -> np.ndarray:
        """Query-side tokenization into term ids (unknown terms skipped)."""
        data = text.lower().encode("utf-8")
        out = np.zeros(cap, np.int32)
        n = self._lib.rlt_builder_tokenize_lookup(self._handle, data, len(data), out.ctypes.data, cap)
        return out[:n]

    def save(self) -> bytes:
        size = int(self._lib.rlt_builder_save_size(self._handle))
        buf = np.zeros(size, np.uint8)
        self._lib.rlt_builder_save(self._handle, buf.ctypes.data)
        return buf.tobytes()

    @classmethod
    def loads(cls, data: bytes) -> "NativePostingsBuilder":
        lib = load_native()
        if lib is None:
            msg = "native library unavailable"
            raise RuntimeError(msg)
        handle = lib.rlt_builder_load(data, len(data))
        if not handle:
            msg = "corrupt postings blob"
            raise ValueError(msg)
        return cls(_handle=handle)


def native_available() -> bool:
    return load_native() is not None


def hash_featurize(
    text: str, *, max_tokens: int, mask: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int] | None:
    """C++ fast path for the hash encoder's featurization
    (models/encoder.py:HashEncoder._featurize).  Returns
    (feature ids int32, signs fp32, per-token feature bounds int64, n_tokens)
    or None when the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    data = text.lower().encode("utf-8")
    cap = 2 * len(data) + 64
    # >=1 byte per token bounds the token count (see hash_embed).
    token_cap = min(max_tokens, max(len(data), 1))
    ids = np.empty(cap, np.int32)
    signs = np.empty(cap, np.float32)
    bounds = np.zeros(token_cap + 1, np.int64)
    n = lib.rlt_hash_featurize(
        data, len(data), token_cap, mask,
        ids.ctypes.data, signs.ctypes.data, bounds.ctypes.data, cap,
    )
    if n < 0:  # pragma: no cover - cap is sized to be sufficient
        return None
    total = int(bounds[n])
    return ids[:total], signs[:total], bounds[: n + 1], int(n)


def hash_embed(
    text: str, table: np.ndarray, *, max_tokens: int, mask: int
) -> np.ndarray | None:
    """Fused C++ hash embedding: tokenize + hash + accumulate + normalize in
    one pass (no [features, dim] intermediate).  ``table`` must be C-contiguous
    fp32 [mask+1, dim].  Returns [n_tokens, dim] fp32 or None (no lib)."""
    lib = load_native()
    if lib is None:
        return None
    assert table.dtype == np.float32 and table.flags.c_contiguous
    data = text.lower().encode("utf-8")
    dim = table.shape[1]
    # A token consumes >=1 byte, so len(data) bounds the row count — size the
    # zero-initialized accumulator to the text, not the 8192-token ceiling
    # (a one-word query must not memset a 32 MB buffer).
    row_cap = min(max_tokens, max(len(data), 1))
    out = np.zeros((row_cap, dim), np.float32)
    n = lib.rlt_hash_embed(
        data, len(data), row_cap, mask, table.ctypes.data, dim, out.ctypes.data
    )
    return out[:n]


def solve_boundaries(
    probas: np.ndarray, *, min_len: int, window: int | None, threshold: float
) -> list[int] | None | bool:
    """C++ fast path for the sentence-boundary DP
    (sentences.py:_solve_boundaries).  Returns the boundary list, None for
    infeasible, or False when the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return False
    probas32 = np.ascontiguousarray(probas, dtype=np.float32)
    out = np.empty(max(len(probas32), 1), np.int64)
    count = lib.rlt_solve_boundaries(
        probas32.ctypes.data, len(probas32), min_len,
        window if window is not None else 0, float(threshold), out.ctypes.data,
    )
    if count < 0:
        return None
    return [int(x) for x in out[:count]]


def split_chunklet_cuts(
    probas: np.ndarray,
    pref_proba: np.ndarray,
    pref_stmt: np.ndarray,
    pref_len: np.ndarray,
    *,
    max_size: int,
) -> list[int] | None:
    """C++ fast path for the default-cost chunklet DP
    (chunklets.py:split_chunklets).  Returns interior cut indices, or None
    when the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    n = len(probas)
    probas64 = np.ascontiguousarray(probas, np.float64)
    pp = np.ascontiguousarray(pref_proba, np.float64)
    ps = np.ascontiguousarray(pref_stmt, np.float64)
    pl = np.ascontiguousarray(pref_len, np.int64)
    cuts = np.empty(max(n, 1), np.int64)
    count = lib.rlt_split_chunklets(
        probas64.ctypes.data, pp.ctypes.data, ps.ctypes.data, pl.ctypes.data,
        n, max_size, cuts.ctypes.data,
    )
    return [int(x) for x in cuts[:count]]


def count_tokens(text: str) -> int | None:
    """C++ token counter (the ``\\w+|[^\\w\\s]`` tokenizer); None if no lib."""
    lib = load_native()
    if lib is None:
        return None
    data = text.lower().encode("utf-8")
    return int(lib.rlt_count_tokens(data, len(data)))


class HnswIndex:
    """ctypes wrapper over the first-party C++ HNSW (hnsw.cpp) — the recall
    BASELINE the BASELINE.md claim "recall@10 >= HNSW at equal memory" is
    measured against (the reference serves from DuckDB VSS HNSW with
    ef_search = 160 at defaults, _database.py:562-563,638-643)."""

    def __init__(
        self,
        dim: int,
        *,
        M: int = 32,
        ef_construction: int = 200,
        metric: str = "cosine",
        seed: int = 42,
    ) -> None:
        lib = load_native()
        if lib is None:
            msg = "native library unavailable"
            raise RuntimeError(msg)
        self._lib = lib
        self.dim = dim
        self._handle = lib.rlt_hnsw_new(
            dim, M, ef_construction, 0 if metric in ("cosine", "dot") else 1, seed
        )

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.rlt_hnsw_free(self._handle)
            self._handle = None

    def add(self, vectors: np.ndarray) -> None:
        v = np.ascontiguousarray(vectors, np.float32)
        assert v.ndim == 2 and v.shape[1] == self.dim, v.shape
        self._lib.rlt_hnsw_add(self._handle, v.ctypes.data, v.shape[0])

    def __len__(self) -> int:
        return int(self._lib.rlt_hnsw_size(self._handle))

    @property
    def memory_bytes(self) -> int:
        return int(self._lib.rlt_hnsw_memory_bytes(self._handle))

    def search(
        self, queries: np.ndarray, k: int, *, ef_search: int = 160
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float32)
        assert q.ndim == 2 and q.shape[1] == self.dim, q.shape
        ids = np.empty((q.shape[0], k), np.int32)
        scores = np.empty((q.shape[0], k), np.float32)
        self._lib.rlt_hnsw_search(
            self._handle, q.ctypes.data, q.shape[0], k, ef_search,
            ids.ctypes.data, scores.ctypes.data,
        )
        return ids, scores
