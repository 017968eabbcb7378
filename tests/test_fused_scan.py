"""Pallas fused scan kernel vs jnp/numpy oracles (SURVEY.md §4: every kernel
has an oracle test; reference analogue is DuckDB HNSW recall behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raglite_tpu.ops.fused_scan import (
    bucketed_max_scan,
    fused_scan_topk,
    reference_bucketed_max,
)

RNG = np.random.default_rng(7)


def test_bucketed_max_scan_matches_oracle() -> None:
    B, N, d, L = 5, 1024, 64, 256
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    bias = RNG.normal(size=N).astype(np.float32)
    scores, ids = bucketed_max_scan(
        jnp.asarray(q), jnp.asarray(rows), jnp.asarray(bias),
        num_buckets=L, batch_tile=8, interpret=True,
    )
    oracle_scores, oracle_ids = reference_bucketed_max(q, rows, bias, num_buckets=L)
    np.testing.assert_allclose(np.asarray(scores), oracle_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), oracle_ids)


def test_bucketed_max_scan_l2_alpha() -> None:
    B, N, d, L = 3, 512, 32, 128
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    bias = -np.sum(rows**2, axis=1).astype(np.float32)
    scores, ids = bucketed_max_scan(
        jnp.asarray(q), jnp.asarray(rows), jnp.asarray(bias),
        num_buckets=L, batch_tile=8, alpha=2.0, interpret=True,
    )
    oracle_scores, oracle_ids = reference_bucketed_max(q, rows, bias, num_buckets=L, alpha=2.0)
    np.testing.assert_allclose(np.asarray(scores), oracle_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), oracle_ids)


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_fused_scan_topk_recall_vs_exact(metric: str) -> None:
    B, N, d, L, k = 4, 2048, 64, 512, 10
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    sq = np.sum(rows**2, axis=1).astype(np.float32)
    valid = np.ones(N, bool)
    valid[5] = False
    scores, ids = fused_scan_topk(
        jnp.asarray(rows), jnp.asarray(sq), jnp.asarray(valid), jnp.asarray(q),
        num_hits=k, metric=metric, num_buckets=L, interpret=True,
    )
    sims = q @ rows.T
    if metric == "l2":
        sims = 2.0 * sims - sq[None, :]
    sims[:, ~valid] = -np.inf
    _, exact_ids = jax.lax.top_k(jnp.asarray(sims), k)
    ids_np, exact_np = np.asarray(ids), np.asarray(exact_ids)
    recall = np.mean(
        [len(set(ids_np[b]) & set(exact_np[b])) / k for b in range(B)]
    )
    assert recall >= 0.9, recall  # expected loss k(k-1)/2L ~= 9%
    assert not np.isin(5, ids_np), "masked row leaked into top-k"


def test_fused_scan_topk_pads_unaligned_rows() -> None:
    B, N, d, L = 2, 700, 32, 256  # N not a bucket multiple
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    sq = np.sum(rows**2, axis=1).astype(np.float32)
    valid = np.ones(N, bool)
    scores, ids = fused_scan_topk(
        jnp.asarray(rows), jnp.asarray(sq), jnp.asarray(valid), jnp.asarray(q),
        num_hits=5, metric="cosine", num_buckets=L, interpret=True,
    )
    ids_np = np.asarray(ids)
    finite = np.isfinite(np.asarray(scores))
    assert (ids_np[finite] < N).all(), "padding row leaked"
