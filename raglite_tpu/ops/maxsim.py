"""Late-interaction (ColBERT-style MaxSim) reranking on device.

Replaces the reference's FlashRank/ONNX cross-encoder rerankers
(/root/reference/src/raglite/_config.py:73-79, _search.py:394-396) with a
fused device program over the candidates' multi-vector matrices: for each
candidate, score = sum over query sub-vectors of the max similarity to any
candidate sub-vector.  One batched matmul on the MXU + two reductions.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from raglite_tpu.utils.padding import round_up as _round_up

__all__ = ["maxsim_scores", "maxsim_rank"]


@jax.jit
def maxsim_scores(
    query_vectors: jax.Array,  # [qm, d] fp32 (zero rows = padding)
    cand_vectors: jax.Array,  # [C, m, d] fp32 (zero rows = padding)
) -> jax.Array:
    """MaxSim scores [C]."""
    # [C, qm, m] similarities in one einsum (MXU, fp32 accumulation).
    # precision=HIGHEST: preferred_element_type only sets the ACCUMULATOR
    # dtype; without it, TPU multiplies at bf16-class default precision and
    # near-tie candidates can swap rank (~1e-3 relative score error).
    sims = jnp.einsum(
        "qd,cmd->cqm", query_vectors, cand_vectors,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    cand_mask = jnp.any(cand_vectors != 0.0, axis=-1)  # [C, m]
    sims = jnp.where(cand_mask[:, None, :], sims, -jnp.inf)
    best = jnp.max(sims, axis=-1)  # [C, qm]
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    query_mask = jnp.any(query_vectors != 0.0, axis=-1)  # [qm]
    return jnp.sum(best * query_mask[None, :], axis=-1)



def maxsim_rank(
    query_matrix: np.ndarray, candidate_matrices: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Rank candidates by MaxSim; returns (order, scores) descending.

    Pads the candidate sub-vector axis to a bucketed size so jit
    recompilation stays bounded.
    """
    if not candidate_matrices:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    d = query_matrix.shape[1]
    m_max = _round_up(max(m.shape[0] for m in candidate_matrices), 8)
    c_pad = _round_up(len(candidate_matrices), 8)
    cands = np.zeros((c_pad, m_max, d), dtype=np.float32)
    for i, matrix in enumerate(candidate_matrices):
        cands[i, : matrix.shape[0]] = matrix.astype(np.float32)
    qm_pad = _round_up(query_matrix.shape[0], 8)
    q = np.zeros((qm_pad, d), dtype=np.float32)
    q[: query_matrix.shape[0]] = query_matrix.astype(np.float32)
    scores = np.asarray(maxsim_scores(jnp.asarray(q), jnp.asarray(cands)))
    scores = scores[: len(candidate_matrices)]
    order = np.argsort(-scores, kind="stable")
    return order, scores[order]
