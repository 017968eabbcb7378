"""Frozen configuration object threaded through every public call.

TPU-native counterpart of the reference's ``RAGLiteConfig``
(/root/reference/src/raglite/_config.py:42-83).  Differences from the
reference are deliberate:

- ``db_url`` (DuckDB/Postgres URL) becomes ``store_path`` — the host-side
  columnar chunk store directory (":memory:" for ephemeral stores).  There is
  no SQL backend; the device-side index is an HBM-resident sharded embedding
  matrix rebuilt/mmapped from the store.
- ``llm``/``embedder`` model strings select first-party JAX models or
  adapters instead of llama.cpp repos (see models/llm.py, models/encoder.py).
- New TPU-specific knobs: embedding dtype, device mesh shape, and the Pallas
  kernel toggle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import TYPE_CHECKING

from raglite_tpu.types import DistanceMetric, RerankerLike

if TYPE_CHECKING:
    from raglite_tpu.types import SearchMethod


def _default_store_path() -> str:
    """Default persistent store location (reference: _config.py:50-56 puts the
    default DuckDB file in the user-data dir)."""
    base = os.environ.get("RAGLITE_TPU_HOME", str(Path.home() / ".raglite_tpu"))
    return str(Path(base) / "default")


def _vector_search(
    query, *, num_results: int = 8, metadata_filter=None, config=None
):
    """Lazily imported default search method (reference: _config.py:26-39)."""
    from raglite_tpu.search import vector_search

    return vector_search(
        query, num_results=num_results, metadata_filter=metadata_filter, config=config
    )


def _default_search_method() -> "SearchMethod":
    return _vector_search


def _default_reranker() -> RerankerLike:
    """Per-language reranker mapping (reference: _config.py:73-79 defaults to
    FlashRank cross-encoders).  The TPU-native default is token-level
    ColBERT-style MaxSim over the candidates' raw text, running as a fused
    device kernel for every language ("maxsim_chunklet" selects the cheaper
    stored-sub-vector variant; see search.rerank_chunks)."""
    return {"en": "maxsim", "other": "maxsim"}


@dataclass(frozen=True)
class RAGLiteConfig:
    """Immutable configuration (reference: _config.py:42-83).

    Fields are hashable so the config can key ``lru_cache``d singletons
    (engine/model factories), mirroring the reference's pattern
    (_database.py:518, _litellm.py:96-98).  ``reranker`` and
    ``search_method`` are excluded from comparison like the reference
    (_config.py:78,82).
    """

    # Storage (reference: db_url, _config.py:66)
    store_path: str = field(default_factory=_default_store_path)

    # Models (reference: llm/embedder strings, _config.py:50-64).  The
    # default embedder is the in-package TPU-trained semantic encoder
    # (models/data/encoder/, 64M params, d=768 — trained by
    # scripts/train_encoder.py), mirroring the reference's real-semantic
    # default (bge-m3, _config.py:50-64) without downloads.  "hash:<dim>"
    # remains the fully-hermetic lexical featurizer for tests/benchmarks.
    # The default LLM stays "echo" (deterministic, offline): unlike the
    # 123 MB encoder, a useful decoder checkpoint cannot ship in-package;
    # point ``llm`` at a local HF checkpoint ("jax:<path>") or an
    # OpenAI-compatible endpoint for real generation.
    llm: str = "echo"
    embedder: str = "flax:sem"

    # Chunking (reference: _config.py:67-68)
    chunk_max_size: int = 2048  # characters

    # Structured-extraction retry budget (reference: _config.py llm_max_tries)
    llm_max_tries: int = 4

    # Vector search (reference: _config.py:69-71)
    vector_search_distance_metric: DistanceMetric = "cosine"
    vector_search_multivector: bool = True
    vector_search_query_adapter: bool = True

    # Embedding mode: "auto" = late chunking when the encoder exposes
    # token-level embeddings, standard otherwise (the reference keys this
    # off llama-cpp vs API embedders, _embed.py:187-190).  "standard"
    # forces one pooled whole-chunk embedding even for token-capable
    # encoders (true single-vector stores, e.g. for A/B-ing the multivector
    # levers); "late_chunking" forces the contextual per-chunklet mode and
    # raises at embed time if the encoder cannot provide token embeddings.
    embedding_type: str = "auto"

    # Embedding storage dtype on device ("bfloat16" | "float16" | "float32"
    # | "int8").  The reference stores fp16 halfvec on Postgres
    # (_typing.py:145-175); bfloat16 is the TPU-native choice (MXU-native,
    # same 2 bytes/val).  "int8" stores symmetric per-row-quantized vectors
    # (ops/fused_scan.py:quantize_rows_int8): half the HBM footprint and
    # ~2x scan throughput on the int8 MXU path for a <0.5% recall@10 cost.
    embedding_dtype: str = "bfloat16"

    # Reranking (reference: _config.py:73-79)
    reranker: RerankerLike = field(default_factory=_default_reranker, compare=False)

    # Rank-fusion weight on the INCOMING retrieval order when reranking:
    # the final order is a reciprocal-rank fusion (k=60, same constant as
    # hybrid RRF) of the reranker's order with the candidates' retrieval
    # order.  0.0 = the reranker's order verbatim (reference semantics —
    # its cross-encoders replace the ordering outright, _search.py:364-397);
    # 1.0 = keep retrieval order (reranker becomes a no-op).  Intermediate
    # values hedge a weak late-interaction signal against a strong
    # retrieval signal instead of discarding the latter.
    reranker_blend: float = 0.0

    # Search method (reference: _config.py:82)
    search_method: "SearchMethod" = field(
        default_factory=_default_search_method, compare=False
    )

    # Self-query metadata filter extraction (reference: _config.py:83)
    self_query: bool = False

    #: Sentence-boundary probability model: "heuristic" (rule-based) or
    #: "learned" (tiny packaged JAX model, models/boundary.py — the SaT
    #: replacement; held-out multilingual boundary-F1 0.9995 vs 0.866).
    #: Heuristic stays the default: it is tuned for English/Markdown prose
    #: like the golden specrel corpus, while the learned model leads on
    #: multilingual text — pick per corpus.
    sentence_boundary_model: str = "heuristic"

    # --- TPU-specific ---------------------------------------------------
    #: Number of devices to shard the index over (1 = single device,
    #: 0 = all local devices).
    num_devices: int = 1
    #: Allow the Pallas fused-scan kernel on the dense query path.  The
    #: engine routes by batch size (measured, v5e @ 1.25M x 1024 int8):
    #: the hand-written kernel wins at small batch (1.85 vs 2.85 ms at
    #: B=1 — it streams rows once, where XLA runs einsum and PartialReduce
    #: as two HBM passes), while XLA's own fusion wins at large batch
    #: (105k vs 73k QPS at B=1024).  Default off: first-compile of the
    #: kernel is minutes-slow on some toolchains, and the XLA program is
    #: within 1 ms of it.  NOTE: this flag governs only the single-stage
    #: int8 kernel; the two-stage int4 routing below has its own kernel and
    #: its own flag (``use_int4_stage1``) — disable BOTH to avoid every
    #: Pallas compile.
    use_pallas: bool = False
    #: Two-stage int4 routing for small-batch (B <= 32) queries on large
    #: (> 131k rows) single-device indexes: stage 1 scans an int4-PACKED
    #: copy of the rows with a Pallas kernel (HALF the HBM traffic — the
    #: bandwidth-bound floor), stage 2 exactly rescores the top-256
    #: candidates against the full-precision rows.  Measured on v5e @
    #: 1.25M x 1024 int8: p50 1.23 ms vs 1.87 ms single-stage, chunk
    #: recall@10 0.994 even on i.i.d. random vectors (the adversarial
    #: zero-margin case).  Costs +d/2 bytes/row of HBM for the packed copy.
    use_int4_stage1: bool = True

    def __post_init__(self) -> None:
        if self.vector_search_distance_metric not in ("cosine", "dot", "l2"):
            msg = f"unknown distance metric {self.vector_search_distance_metric!r}"
            raise ValueError(msg)
        if self.embedding_dtype not in ("bfloat16", "float16", "float32", "int8"):
            msg = f"unknown embedding dtype {self.embedding_dtype!r}"
            raise ValueError(msg)
        if self.sentence_boundary_model not in ("heuristic", "learned"):
            msg = f"unknown sentence boundary model {self.sentence_boundary_model!r}"
            raise ValueError(msg)
        if self.embedding_type not in ("auto", "late_chunking", "standard"):
            msg = f"unknown embedding type {self.embedding_type!r}"
            raise ValueError(msg)
