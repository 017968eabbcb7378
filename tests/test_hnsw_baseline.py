"""First-party C++ HNSW baseline (native/hnsw.cpp + irbench comparison).

Makes BASELINE.md's "recall@10 >= HNSW at equal memory" a measurement:
the production TPU scan (int8 + approx top-k + group-max) and an HNSW
graph at the reference's ef_search=160 (DuckDB VSS setting,
/root/reference/src/raglite/_database.py:562-563) retrieve from the SAME
vectors and are scored against exact fp32 brute force.
"""

import numpy as np
import pytest

from raglite_tpu.native import native_available


pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_hnsw_index_recall_on_clustered_data():
    from raglite_tpu.native import HnswIndex

    rng = np.random.default_rng(0)
    n, d = 3000, 48
    centers = rng.normal(size=(20, d)).astype(np.float32)
    rows = centers[rng.integers(0, 20, n)] + 0.3 * rng.normal(size=(n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    index = HnswIndex(d, M=16, ef_construction=150, metric="cosine")
    index.add(rows)
    assert len(index) == n
    queries = rows[:48] + 0.1 * rng.normal(size=(48, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids, scores = index.search(queries, 10, ef_search=160)
    exact = np.argsort(-(queries @ rows.T), axis=1)[:, :10]
    recall = np.mean([len(set(ids[i]) & set(exact[i])) / 10 for i in range(48)])
    assert recall >= 0.9, recall  # a broken graph scores ~0.1 here
    # Scores are descending similarities for the cosine metric.
    assert all(np.all(np.diff(scores[i]) <= 1e-5) for i in range(48))


def test_tpu_scan_beats_hnsw_at_less_memory():
    """The north-star claim, measured (VERDICT round-1 missing item 5)."""
    from raglite_tpu.irbench import hnsw_recall_comparison

    report = hnsw_recall_comparison(num_rows=6_000, dim=64, num_queries=32)
    # fp16 exact scan: >= HNSW recall at roughly half its memory.
    assert report["tpu_fp16_recall"] >= report["hnsw_recall"] - 1e-9, report
    assert report["tpu_fp16_memory_bytes"] < report["hnsw_memory_bytes"], report
    # int8 point: ~4x smaller than HNSW, recall within quantization noise.
    assert report["tpu_int8_memory_bytes"] < 0.5 * report["hnsw_memory_bytes"], report
    assert report["tpu_int8_recall"] >= 0.95, report


def test_hnsw_evaluator_in_ir_benchmark(tmp_path):
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.irbench import run_ir_benchmark

    config = RAGLiteConfig(
        store_path=str(tmp_path / "store"), embedder="hash:256", llm="echo"
    )
    table = run_ir_benchmark(
        dataset="synthetic", measure="AP@10", num_queries=12,
        variants=("multivector", "hnsw"), config=config,
    )
    assert set(table.index) == {"multivector", "hnsw"}
    # Same embeddings, easy corpus: both systems should retrieve well, and
    # the exact scan must not lose to the approximate graph.
    assert table.loc["hnsw", "AP@10"] > 0.5
    assert table.loc["multivector", "AP@10"] >= table.loc["hnsw", "AP@10"] - 0.05
