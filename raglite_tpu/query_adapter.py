"""Closed-form linear query adapter, computed on device.

Counterpart of /root/reference/src/raglite/_query_adapter.py:41-219.  The
math is identical (per-eval NNLS-dual optimal targets, then a relaxed or
orthogonal Procrustes solution); the computation is restructured for TPU:

- all eval questions are embedded and searched as ONE batched index query
  (the reference loops vector_search per eval, :156-166);
- the per-eval NNLS dual solves run as a vmapped FISTA projected-gradient
  program on device (ops/nnls.py) instead of scipy host calls;
- the final SVD/pinv run in jnp.

The resulting adapter matrix is applied at query time as a single HBM
matmul (search.py vector_search).
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from raglite_tpu.config import RAGLiteConfig
from raglite_tpu.embed import embed_queries
from raglite_tpu.index.dense import dense_index_from_config
from raglite_tpu.ops.nnls import batched_query_targets
from raglite_tpu.store import store_from_config
from raglite_tpu.types import FloatMatrix

__all__ = ["update_query_adapter", "procrustes_adapter"]

_EVAL_BATCH = 64  # evals per device NNLS batch


def procrustes_adapter(Q: np.ndarray, T: np.ndarray, metric: str) -> np.ndarray:
    """Adapter matrix from stacked queries Q and targets T
    (reference: _query_adapter.py:188-205) — in FLOAT64 on the host like
    the reference's numpy path.

    This step is numerically treacherous: with targets close to the
    queries (the common case — NNLS moves each query only as far as the
    margin requires), M's data block (1/n)TᵀQ has singular values
    ~1e-3..1e-5 against the rank completion's 1.0, and a float32 SVD
    scrambles the near-degenerate directions' signs, turning the
    "orthogonal rotation" into a reflection soup.  Measured on a real eval
    set: the fp32 solve DESTROYED retrieval (MRR 0.478 -> 0.228) while
    this fp64 solve is the gentle near-identity rotation the data asks
    for (MRR 0.478 -> 0.484).  The d x d fp64 SVD costs nothing on host.
    """
    d = Q.shape[1]
    Q64 = (Q / np.linalg.norm(Q, axis=1, keepdims=True)).astype(np.float64)
    T64 = T.astype(np.float64)
    if metric == "cosine":
        T64 = T64 / np.linalg.norm(T64, axis=1, keepdims=True)
    n = Q64.shape[0]
    M = (1.0 / n) * T64.T @ Q64
    if n < d or np.linalg.matrix_rank(Q64) < d:
        M += np.eye(d) - Q64.T @ np.linalg.pinv(Q64 @ Q64.T) @ Q64
    if metric == "dot":
        A_star = M / np.linalg.norm(M) * np.sqrt(d)
    else:
        U, _, VT = np.linalg.svd(M, full_matrices=False)
        A_star = U @ VT
    return np.asarray(A_star, dtype=np.float32)


def update_query_adapter(
    *,
    max_evals: int = 4096,
    optimize_top_k: int = 40,
    optimize_gap: float = 0.05,
    config: RAGLiteConfig | None = None,
) -> FloatMatrix:
    """Compute the optimal linear query adapter A (applied as ``A @ q``) from
    stored evals and persist it (reference: _query_adapter.py:41-219).

    For each eval, the un-adapted top-k retrieval is split into positive and
    negative chunks by the eval's gold chunk ids; the optimal target
    ``t* = q + D^T mu*`` separates them by a margin ``optimize_gap``.  With
    queries Q and targets T, the adapter is ``M = T^T Q / n`` (plus a
    null-space identity completion when Q is rank-deficient), projected to
    ``sqrt(d) * M / ||M||_F`` for the dot metric or the orthogonal Procrustes
    solution ``U V^T`` for cosine.
    """
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    if not store.chunk_order:
        msg = "First run `insert_documents()` to insert documents."
        raise ValueError(msg)
    evals = sorted(store.evals.values(), key=lambda e: e.id)[:max_evals]
    if not evals:
        msg = "First run `insert_evals()` to generate evals."
        raise ValueError(msg)
    if config.vector_search_distance_metric not in ("cosine", "dot"):
        msg = f"Unsupported metric: {config.vector_search_distance_metric}"
        raise ValueError(msg)
    config_plain = replace(config, vector_search_query_adapter=False)
    index = dense_index_from_config(config_plain)
    d = index.dim

    # 1. Embed ALL eval questions in one pass.
    questions = [e.question for e in evals]
    qs = embed_queries(questions, config=config).astype(np.float32)  # [E, d]

    # 2. One batched index search for the un-adapted top-k sub-vector hits
    #    (same oversampling heuristic as query-time retrieval).
    from raglite_tpu.search import corrected_num_hits

    num_hits = corrected_num_hits(4, optimize_top_k, config)
    scores, row_ids = index.search(qs, num_hits=min(num_hits, index.num_rows))

    # 3. Build per-eval positive/negative best sub-vectors on the host
    #    (small candidate sets), padded for the device batch solve.
    Q_rows: list[np.ndarray] = []
    pos_batch: list[np.ndarray] = []
    neg_batch: list[np.ndarray] = []
    k = optimize_top_k
    for e_idx, eval_ in enumerate(evals):
        # Group-max sub-vector hits into ranked chunks (multivector L-inf).
        best: dict[int, float] = {}
        for score, row in zip(scores[e_idx], row_ids[e_idx]):
            if not np.isfinite(score):
                continue
            ordinal = int(index.row_chunk[row])
            if score > best.get(ordinal, -np.inf):
                best[ordinal] = float(score)
        ranked = sorted(best.items(), key=lambda kv: kv[1], reverse=True)[:k]
        gold = set(eval_.chunk_ids)
        q = qs[e_idx]
        pos_rows, neg_rows = [], []
        for ordinal, _ in ranked:
            chunk_id = index.chunk_ids[ordinal]
            matrix = store.embeddings[chunk_id].astype(np.float32)
            # Best sub-vector for this query (reference: :172-183).
            vec = matrix[int(np.argmax(matrix @ q))]
            (pos_rows if chunk_id in gold else neg_rows).append(vec)
        if not pos_rows or not neg_rows:
            continue  # needs both relevant and irrelevant hits (reference: :168-170)
        Q_rows.append(q)
        pos = np.zeros((k, d), dtype=np.float32)
        pos[: len(pos_rows)] = np.stack(pos_rows)
        neg = np.zeros((k, d), dtype=np.float32)
        neg[: len(neg_rows)] = np.stack(neg_rows)
        pos_batch.append(pos)
        neg_batch.append(neg)
    if not Q_rows:
        msg = "No evals produced both positive and negative retrievals."
        raise ValueError(msg)

    # 4. Vmapped NNLS-dual solves on device, in batches.
    T_rows: list[np.ndarray] = []
    for start in range(0, len(Q_rows), _EVAL_BATCH):
        sl = slice(start, start + _EVAL_BATCH)
        qb = jnp.asarray(np.stack(Q_rows[sl]))
        pb = jnp.asarray(np.stack(pos_batch[sl]))
        nb = jnp.asarray(np.stack(neg_batch[sl]))
        pm = jnp.any(pb != 0.0, axis=-1)
        nm = jnp.any(nb != 0.0, axis=-1)
        targets = batched_query_targets(qb, pb, nb, pm, nm, alpha=optimize_gap)
        T_rows.append(np.asarray(targets))
    Q = np.stack(Q_rows)
    T = np.concatenate(T_rows, axis=0)

    # 5. Procrustes solution (reference: :188-205).
    A_np = procrustes_adapter(Q, T, config.vector_search_distance_metric)

    # 6. Persist (reference: :209-218).
    with store.write_lock():
        store.set_index_metadata("query_adapter", A_np)
        store.save()
    return A_np
