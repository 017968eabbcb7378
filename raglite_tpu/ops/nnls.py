"""Batched nonnegative least squares on device.

The reference solves, per eval, the dual NNLS problem
``min_mu 0.5 ||q + D^T mu||^2 s.t. mu >= 0`` with scipy's ``lsq_linear``
(/root/reference/src/raglite/_query_adapter.py:21-38), one eval at a time on
the host.  Here the solver is an accelerated projected-gradient method
(FISTA with projection onto the nonnegative orthant) expressed in pure JAX:
fixed iteration count (compiler-friendly), vmapped over a batch of evals,
with padded/masked constraint rows so every instance has a static shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["nnls_dual_target", "batched_query_targets"]


def _power_iter_sq_norm(D: jax.Array, iters: int = 16) -> jax.Array:
    """Estimate ||D D^T||_2 (the PGD Lipschitz constant) by power iteration."""
    v = jnp.ones((D.shape[1],), D.dtype) / jnp.sqrt(D.shape[1])

    def body(_, v):
        w = D.T @ (D @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)

    v = jax.lax.fori_loop(0, iters, body, v)
    return jnp.maximum(jnp.linalg.norm(D @ v) ** 2, 1e-9)


def nnls_dual_target(q: jax.Array, D: jax.Array, *, iters: int = 200) -> jax.Array:
    """Solve the dual NNLS and return the primal target ``t* = q + D^T mu*``.

    ``D`` is [m, d] with zero rows as padding (their gradients vanish, so
    padded multipliers stay at zero).
    """
    L = _power_iter_sq_norm(D)
    step = 1.0 / L
    mu0 = jnp.zeros((D.shape[0],), q.dtype)

    def body(_, state):
        mu, y, t_k = state
        grad = D @ (q + D.T @ y)
        mu_next = jnp.maximum(y - step * grad, 0.0)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t_k**2))
        y_next = mu_next + ((t_k - 1.0) / t_next) * (mu_next - mu)
        return mu_next, y_next, t_next

    mu, _, _ = jax.lax.fori_loop(0, iters, body, (mu0, mu0, jnp.asarray(1.0, q.dtype)))
    return q + D.T @ mu


@partial(jax.jit, static_argnames=("alpha", "iters"))
def batched_query_targets(
    qs: jax.Array,  # [B, d] query embeddings
    pos: jax.Array,  # [B, Pmax, d] positive chunk embeddings (zero rows = pad)
    neg: jax.Array,  # [B, Nmax, d] negative chunk embeddings (zero rows = pad)
    pos_mask: jax.Array,  # [B, Pmax] bool
    neg_mask: jax.Array,  # [B, Nmax] bool
    *,
    alpha: float = 0.05,
    iters: int = 200,
) -> jax.Array:
    """Optimal target vectors [B, d] for a batch of evals.

    Constraint rows are all (positive, negative) pairs
    ``D[mn] = p_m - (1 + alpha) * n_n`` (reference: _query_adapter.py:30-33),
    masked to zero where either side is padding.
    """

    def solve(q, P, N, pm, nm):
        D = P[:, None, :] - (1.0 + alpha) * N[None, :, :]  # [Pmax, Nmax, d]
        pair_mask = (pm[:, None] & nm[None, :]).astype(q.dtype)
        D = (D * pair_mask[:, :, None]).reshape(-1, q.shape[0])
        return nnls_dual_target(q, D, iters=iters)

    return jax.vmap(solve)(qs, pos, neg, pos_mask, neg_mask)
