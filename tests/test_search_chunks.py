"""DenseIndex.search_chunks: on-device multi-vector group-max + ranking.

Oracle: the reference's SQL aggregation `GROUP BY chunk_id, MAX(sim) ORDER BY
sim DESC LIMIT n` (/root/reference/src/raglite/_search.py:143-152), done in
numpy over the exact similarity matrix.
"""

import numpy as np
import pytest

from raglite_tpu.index.dense import DenseIndex


def _build_index(rng, *, n_chunks=50, dim=64, dtype="float32"):
    index = DenseIndex(dim=dim, dtype=dtype, metric="cosine", num_devices=1, use_pallas=False)
    matrices, ids = [], []
    for i in range(n_chunks):
        m = rng.normal(size=(rng.integers(1, 4), dim)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        matrices.append(m)
        ids.append(f"chunk{i}")
    index.append_chunks(matrices, ids)
    return index, matrices


def _oracle(queries, matrices, num_results, chunk_mask=None):
    out = []
    for q in queries:
        best = []
        for ordinal, m in enumerate(matrices):
            if chunk_mask is not None and not chunk_mask[ordinal]:
                continue
            # The index stores rows as fp16 — score at stored precision.
            m16 = m.astype(np.float16).astype(np.float32)
            best.append((float(np.max(m16 @ q)), ordinal))
        best.sort(key=lambda t: (-t[0], t[1]))
        out.append(best[:num_results])
    return out


@pytest.mark.parametrize("batch", [1, 7])
def test_search_chunks_matches_group_max_oracle(batch):
    rng = np.random.default_rng(0)
    index, matrices = _build_index(rng)
    queries = rng.normal(size=(batch, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    scores, ordinals = index.search_chunks(queries, num_hits=64, num_results=5)
    expected = _oracle(queries, matrices, 5)
    for b in range(batch):
        exp_scores = [s for s, _ in expected[b]]
        exp_ords = [o for _, o in expected[b]]
        assert ordinals[b].tolist() == exp_ords
        np.testing.assert_allclose(scores[b], exp_scores, rtol=1e-4)


def test_search_chunks_row_mask_and_padding():
    rng = np.random.default_rng(1)
    index, matrices = _build_index(rng, n_chunks=10)
    queries = rng.normal(size=(2, 64)).astype(np.float32)
    # Only chunks 3 and 7 pass the (metadata) filter.
    chunk_mask = np.zeros(10, dtype=bool)
    chunk_mask[[3, 7]] = True
    row_mask = chunk_mask[index.row_chunk]
    scores, ordinals = index.search_chunks(
        queries, num_hits=32, num_results=5, row_mask=row_mask
    )
    expected = _oracle(queries, matrices, 5, chunk_mask=chunk_mask)
    for b in range(2):
        real = ordinals[b][ordinals[b] >= 0].tolist()
        assert real == [o for _, o in expected[b]]
        # Slots past the 2 passing chunks are -inf / -1 padding.
        assert (ordinals[b][len(real):] == -1).all()
        assert not np.isfinite(scores[b][len(real):]).any()


def test_search_chunks_respects_tombstones():
    rng = np.random.default_rng(2)
    index, matrices = _build_index(rng, n_chunks=8)
    q = matrices[4][:1]  # exact match for chunk 4
    _, ordinals = index.search_chunks(q, num_hits=16, num_results=1)
    assert ordinals[0, 0] == 4
    # Tombstone every row of chunk 4; it must never surface again.
    index._host_valid[index.rows_for_chunk(4)] = False
    index._dirty = True
    _, ordinals = index.search_chunks(q, num_hits=16, num_results=3)
    assert 4 not in ordinals[0].tolist()


def test_search_chunks_empty_index():
    index = DenseIndex(dim=16, dtype="float32", metric="cosine", num_devices=1)
    scores, ordinals = index.search_chunks(
        np.zeros((3, 16), dtype=np.float32), num_hits=4, num_results=2
    )
    assert (ordinals == -1).all()
    assert not np.isfinite(scores).any()


def test_bitcast_ordinal_path_exact_beyond_2_24(monkeypatch):
    """Ordinals above 2^24 are not float32-representable; the bitcast packed
    path must return them exactly (forced here by lowering the threshold)."""
    import raglite_tpu.index.dense as dense_mod

    monkeypatch.setattr(dense_mod, "ORDINAL_BITCAST_THRESHOLD", 4)
    rng = np.random.default_rng(3)
    index, matrices = _build_index(rng, n_chunks=30)
    queries = rng.normal(size=(2, 64)).astype(np.float32)
    scores, ordinals = index.search_chunks(queries, num_hits=32, num_results=5)
    expected = _oracle(queries, matrices, 5)
    for b in range(2):
        assert ordinals[b].tolist() == [o for _, o in expected[b]]
        np.testing.assert_allclose(scores[b], [s for s, _ in expected[b]], rtol=1e-4)
    # The bitcast encoder itself is exact for huge ordinal values.
    import jax.numpy as jnp

    from raglite_tpu.index.dense import _group_max_topk_bitcast

    big = (1 << 24) + 7
    row_chunk = jnp.asarray([big, big + 1], dtype=jnp.int32)
    s = jnp.asarray([[2.0, 1.0]], dtype=jnp.float32)
    ids = jnp.asarray([[0, 1]], dtype=jnp.int32)
    packed = np.asarray(_group_max_topk_bitcast(s, ids, row_chunk, num_results=2))
    decoded = np.ascontiguousarray(packed[1]).view(np.int32)
    assert decoded.tolist() == [[big, big + 1]]
