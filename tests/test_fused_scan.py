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


def test_bucketed_max_scan_scales() -> None:
    B, N, d, L = 3, 512, 32, 128
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    bias = -np.sum(rows**2, axis=1).astype(np.float32)
    row_scale = RNG.uniform(0.5, 2.0, size=N).astype(np.float32)
    scores, ids = bucketed_max_scan(
        jnp.asarray(q), jnp.asarray(rows), jnp.asarray(bias),
        jnp.asarray(row_scale),
        num_buckets=L, batch_tile=8, interpret=True,
    )
    oracle_scores, oracle_ids = reference_bucketed_max(
        q, rows, bias, num_buckets=L, row_scale=row_scale
    )
    np.testing.assert_allclose(np.asarray(scores), oracle_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), oracle_ids)


def test_fused_scan_topk_int8_recall() -> None:
    from raglite_tpu.ops.fused_scan import quantize_rows_int8

    B, N, d, L, k = 4, 2048, 64, 512, 10
    q = RNG.normal(size=(B, d)).astype(np.float32)
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    rows_i8, scale = quantize_rows_int8(rows)
    deq = rows_i8.astype(np.float32) * scale[:, None]
    sq = np.sum(deq**2, axis=1).astype(np.float32)
    valid = np.ones(N, bool)
    scores, ids = fused_scan_topk(
        jnp.asarray(rows_i8), jnp.asarray(sq), jnp.asarray(valid), jnp.asarray(q),
        num_hits=k, metric="cosine", row_scale=jnp.asarray(scale),
        num_buckets=L, interpret=True,
    )
    sims = q @ rows.T
    _, exact_ids = jax.lax.top_k(jnp.asarray(sims), k)
    ids_np, exact_np = np.asarray(ids), np.asarray(exact_ids)
    recall = np.mean([len(set(ids_np[b]) & set(exact_np[b])) / k for b in range(B)])
    assert recall >= 0.85, recall  # bucket loss + int8 rounding
    # Scores must approximate the true fp32 similarities (dequant error small).
    top_true = np.take_along_axis(sims, ids_np, axis=1)
    np.testing.assert_allclose(np.asarray(scores), top_true, atol=0.05)


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


def test_dense_index_int8_end_to_end() -> None:
    """int8-quantized DenseIndex returns near-identical hits to bf16."""
    from raglite_tpu.index.dense import DenseIndex

    d, n_chunks = 64, 100
    mats = [RNG.normal(size=(2, d)).astype(np.float32) for _ in range(n_chunks)]
    mats = [m / np.linalg.norm(m, axis=1, keepdims=True) for m in mats]
    ids = [f"c{i}" for i in range(n_chunks)]
    q = RNG.normal(size=(3, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    results = {}
    for dtype in ("float32", "int8"):
        index = DenseIndex(dim=d, dtype=dtype, metric="cosine")
        index.append_chunks(mats, ids)
        scores, rows = index.search(q, num_hits=10)
        results[dtype] = (scores, rows)
    overlap = np.mean([
        len(set(results["int8"][1][b]) & set(results["float32"][1][b])) / 10
        for b in range(3)
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(results["int8"][0], results["float32"][0], atol=0.03)


def test_sharded_int8_matches_single_device() -> None:
    import jax
    import jax.numpy as jnp

    from raglite_tpu.ops.fused_scan import quantize_rows_int8
    from raglite_tpu.parallel.mesh import index_mesh
    from raglite_tpu.parallel.sharded import sharded_topk_search

    B, N, d, k = 3, 512, 32, 8
    rows = RNG.normal(size=(N, d)).astype(np.float32)
    rows_i8, scale = quantize_rows_int8(rows)
    deq = rows_i8.astype(np.float32) * scale[:, None]
    sq = np.sum(deq**2, axis=1).astype(np.float32)
    q = RNG.normal(size=(B, d)).astype(np.float32)
    mesh = index_mesh(len(jax.devices()))
    scores, ids = sharded_topk_search(
        jnp.asarray(rows_i8), jnp.asarray(sq), jnp.ones(N, bool), jnp.asarray(q),
        jnp.asarray(scale), num_hits=k, metric="cosine", mesh=mesh,
    )
    sims = q @ deq.T
    _, exact = jax.lax.top_k(jnp.asarray(sims), k)
    ids_np, exact_np = np.asarray(ids), np.asarray(exact)
    overlap = np.mean([len(set(ids_np[b]) & set(exact_np[b])) / k for b in range(B)])
    assert overlap >= 0.9, overlap


def test_dense_index_incremental_append_matches_full_rebuild() -> None:
    """Appends within capacity upload incrementally; results must equal a
    freshly-built index over the same rows."""
    from raglite_tpu.index.dense import DenseIndex

    d = 32
    q = RNG.normal(size=(2, d)).astype(np.float32)
    mats_a = [RNG.normal(size=(2, d)).astype(np.float32) for _ in range(10)]
    mats_b = [RNG.normal(size=(2, d)).astype(np.float32) for _ in range(5)]

    for dtype in ("float32", "int8"):
        incremental = DenseIndex(dim=d, dtype=dtype)
        incremental.append_chunks(mats_a, [f"a{i}" for i in range(10)])
        incremental.search(q, num_hits=4)  # force first (full) upload
        incremental.append_chunks(mats_b, [f"b{i}" for i in range(5)])
        was_incremental = not incremental._dirty  # capacity big enough?
        scores_inc, rows_inc = incremental.search(q, num_hits=8)

        fresh = DenseIndex(dim=d, dtype=dtype)
        fresh.append_chunks(mats_a + mats_b, [f"a{i}" for i in range(10)] + [f"b{i}" for i in range(5)])
        scores_full, rows_full = fresh.search(q, num_hits=8)

        np.testing.assert_array_equal(rows_inc, rows_full)
        np.testing.assert_allclose(scores_inc, scores_full, rtol=1e-5)
        assert incremental._dev_rows_synced == incremental.num_rows
        # The capacity policy (lane-multiple growth) should have allowed the
        # incremental path at these sizes.
        assert was_incremental or incremental.capacity >= incremental.num_rows


def test_pack_rows_int4_roundtrip() -> None:
    """Packed nibbles dequantize back to the rows within the int4 grid."""
    import jax.numpy as jnp

    from raglite_tpu.ops.fused_scan import pack_rows_int4, unpack_rows_int4

    rng = np.random.default_rng(0)
    rows8 = rng.integers(-127, 128, size=(64, 32)).astype(np.int8)
    scale8 = rng.uniform(0.005, 0.01, size=64).astype(np.float32)
    packed, scale4 = pack_rows_int4(jnp.asarray(rows8), jnp.asarray(scale8))
    nib = unpack_rows_int4(np.asarray(packed))
    assert nib.min() >= -7 and nib.max() <= 7
    # dequantized packed values approximate the dequantized int8 rows
    deq8 = rows8.astype(np.float32) * scale8[:, None]
    deq4 = nib.astype(np.float32) * np.asarray(scale4)[:, None]
    err = np.abs(deq4 - deq8).max(axis=1)
    step = scale8 * (127.0 / 7.0)  # one int4 quantization step
    assert (err <= step * 0.5 + 1e-6).all()
    # float rows path
    x = rng.normal(size=(16, 32)).astype(np.float32)
    packed_f, scale_f = pack_rows_int4(jnp.asarray(x))
    nib_f = unpack_rows_int4(np.asarray(packed_f))
    np.testing.assert_allclose(
        nib_f * np.asarray(scale_f)[:, None], x, atol=float(np.asarray(scale_f).max()) * 0.51
    )


def test_int4_bucket_scan_matches_oracle() -> None:
    """Interpret-mode kernel == numpy unpack + bucket-max oracle, exactly."""
    import jax.numpy as jnp

    from raglite_tpu.ops.fused_scan import (
        int4_bucket_scan,
        pack_rows_int4,
        reference_bucketed_max,
        unpack_rows_int4,
    )

    rng = np.random.default_rng(1)
    N, d, L, B = 512, 32, 128, 4
    rows8 = rng.integers(-127, 128, size=(N, d)).astype(np.int8)
    scale8 = rng.uniform(0.005, 0.01, size=N).astype(np.float32)
    packed, scale4 = pack_rows_int4(jnp.asarray(rows8), jnp.asarray(scale8))
    q = rng.integers(-127, 128, size=(B, d)).astype(np.int8)
    bias = np.where(rng.random(N) < 0.1, -1e30, 0.0).astype(np.float32)
    scores, ids = int4_bucket_scan(
        jnp.asarray(q), packed, scale4, jnp.asarray(bias),
        num_buckets=L, batch_tile=8, interpret=True,
    )
    nib = unpack_rows_int4(np.asarray(packed))
    ref_scores, ref_ids = reference_bucketed_max(
        q.astype(np.float32), nib.astype(np.float32), bias,
        num_buckets=L, row_scale=np.asarray(scale4),
    )
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_int4_two_stage_recall_on_clustered_data() -> None:
    """The two-stage program finds the exact top chunks on data with real
    neighbor margins (each query is a noisy copy of an indexed row)."""
    import jax.numpy as jnp

    from raglite_tpu.index.dense import _int4_two_stage_chunks
    from raglite_tpu.ops.fused_scan import pack_rows_int4, quantize_rows_int8

    rng = np.random.default_rng(2)
    N, d, B, hits, res = 2048, 64, 8, 20, 5
    base = rng.normal(size=(N, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows8, scale8 = quantize_rows_int8(base)
    packed, scale4 = pack_rows_int4(jnp.asarray(rows8), jnp.asarray(scale8))
    targets = rng.choice(N, size=B, replace=False)
    q = base[targets] + 0.1 * rng.normal(size=(B, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    row_chunk = np.arange(N, dtype=np.int32) // 2
    packed_out = _int4_two_stage_chunks(
        packed, scale4, jnp.asarray(rows8), jnp.asarray(scale8),
        jnp.zeros((N,), jnp.float32), jnp.ones((N,), bool),
        jnp.asarray(row_chunk), jnp.asarray(q),
        num_hits=hits, num_results=res, candidates=64, metric="cosine",
        num_buckets=256, interpret=True,
    )
    top_chunks = np.asarray(packed_out)[1].astype(np.int64)
    for i, t in enumerate(targets):
        assert row_chunk[t] in top_chunks[i], f"query {i}: planted neighbor missing"


def test_int4_two_stage_respects_masks() -> None:
    """Masked (tombstoned/filtered) rows never surface, even when stage-1
    candidates include them (the rescore must re-apply the bias)."""
    import jax.numpy as jnp

    from raglite_tpu.index.dense import _int4_two_stage_chunks
    from raglite_tpu.ops.fused_scan import pack_rows_int4, quantize_rows_int8

    rng = np.random.default_rng(3)
    N, d = 256, 32
    base = rng.normal(size=(N, d)).astype(np.float32)
    rows8, scale8 = quantize_rows_int8(base)
    packed, scale4 = pack_rows_int4(jnp.asarray(rows8), jnp.asarray(scale8))
    row_chunk = np.arange(N, dtype=np.int32)
    valid = np.ones(N, dtype=bool)
    valid[::2] = False  # mask half the corpus
    q = base[[4, 10]]  # masked row 4 is its own best match
    out = _int4_two_stage_chunks(
        packed, scale4, jnp.asarray(rows8), jnp.asarray(scale8),
        jnp.zeros((N,), jnp.float32), jnp.asarray(valid),
        jnp.asarray(row_chunk), jnp.asarray(q),
        num_hits=8, num_results=4, candidates=192, metric="cosine",
        num_buckets=256, interpret=True,
    )
    scores, chunks = np.asarray(out)[0], np.asarray(out)[1].astype(np.int64)
    surfaced = chunks[np.isfinite(scores)]
    assert (surfaced % 2 == 1).all(), "a masked row surfaced through the rescore"


def test_int4_two_stage_restores_inf_sentinel() -> None:
    """When fewer valid rows exist than requested results, the masked slots
    must come back NON-finite so search_chunks' ordinal fixup fires
    (regression: -1e30 is finite and leaked filtered chunks as results)."""
    import jax.numpy as jnp

    from raglite_tpu.index.dense import _int4_two_stage_chunks
    from raglite_tpu.ops.fused_scan import pack_rows_int4, quantize_rows_int8

    rng = np.random.default_rng(5)
    N, d = 256, 32
    base = rng.normal(size=(N, d)).astype(np.float32)
    rows8, scale8 = quantize_rows_int8(base)
    packed, scale4 = pack_rows_int4(jnp.asarray(rows8), jnp.asarray(scale8))
    valid = np.zeros(N, dtype=bool)
    valid[7] = True  # a filter matching ONE chunk, fewer than num_results
    out = np.asarray(
        _int4_two_stage_chunks(
            packed, scale4, jnp.asarray(rows8), jnp.asarray(scale8),
            jnp.zeros((N,), jnp.float32), jnp.asarray(valid),
            jnp.asarray(np.arange(N, dtype=np.int32)), jnp.asarray(base[[7]]),
            num_hits=8, num_results=4, candidates=64, metric="cosine",
            num_buckets=256, interpret=True,
        )
    )
    scores, chunks = out[0], out[1].astype(np.int64)
    assert np.isfinite(scores[0, 0]) and chunks[0, 0] == 7
    assert not np.isfinite(scores[0, 1:]).any(), "masked slots leaked finite scores"
