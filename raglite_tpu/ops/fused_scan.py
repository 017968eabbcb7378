"""Pallas fused distance-matmul + bucketed top-k scan.

The serving hot path (SURVEY.md §7.5; replaces the reference's HNSW
traversal in DuckDB VSS / pgvector, /root/reference/src/raglite/_search.py:65-141).

The jnp path (`index/dense.py:_dense_search`) computes ``sims = Q @ R.T``
then ``approx_max_k``.  This kernel fuses the two: row blocks stream
HBM→VMEM once, the distance matmul runs on the MXU, and a bucketed running
max/argmax (the same algorithm as XLA's ``approx_max_k`` PartialReduce,
Chern et al. 2022) stays resident in VMEM across the scan.  HBM traffic is
the row matrix itself — the speed-of-light floor.

Quantization: rows may be int8 with a per-row dequantization scale; queries
are then symmetrically quantized per-query inside.  The int8 MXU path
doubles matmul throughput and halves HBM traffic versus bf16 — this is how
the <2 ms p50 @ 1.25M rows/chip north star is met (BASELINE.md).

Bucketing: row ``r`` belongs to bucket ``r mod L`` (L = ``num_buckets``).
Each grid step processes one contiguous block of L rows, so bucket ``j``
sees row ``s*L + j`` at step ``s`` — a pure elementwise max merge.  The
exact final ``top_k`` over the ``[B, L]`` buckets is cheap outside the
kernel.  Expected top-k recall loss is ~k(k-1)/(2L), erased in practice by
the 4x oversample + multi-vector group-max above it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raglite_tpu.utils.padding import round_up as _round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "bucketed_max_scan",
    "fused_scan_topk",
    "int4_bucket_scan",
    "int4_two_stage_block",
    "pack_rows_int4",
    "quantize_rows_int8",
]

#: Rows per grid step == number of buckets (VMEM-sized: L x d blocks).
DEFAULT_NUM_BUCKETS = 1024
#: Query tile. Large tiles amortise the row stream: the row matrix is read
#: ceil(B / batch_tile) times per batch.
DEFAULT_BATCH_TILE = 1024



def quantize_rows_int8(x: np.ndarray | jax.Array) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: returns (q [N,d] int8, scale [N] fp32)
    with ``x ≈ q * scale[:, None]``."""
    x = np.asarray(x, dtype=np.float32)
    absmax = np.abs(x).max(axis=-1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


def _scan_kernel(q_ref, rows_ref, rscale_ref, bias_ref, scores_ref, ids_ref):
    """One (query-tile, row-block) step: MXU matmul + running bucket max.

    sims = (q @ rows.T) * rscale[n] + bias[n]

    (No per-query operand: queries are quantized with one shared scale and
    winners rescaled outside — a [Bt, 1] lane-1 input block sent Mosaic's
    compiler into a multi-minute layout search.)
    """
    step = pl.program_id(1)
    acc_t = jnp.int32 if rows_ref.dtype == jnp.int8 else jnp.float32
    sims = jax.lax.dot_general(
        q_ref[:],
        rows_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(jnp.float32)
    sims = sims * rscale_ref[:] + bias_ref[:]
    num_buckets = sims.shape[1]
    row_base = step * num_buckets
    ids = row_base + jax.lax.broadcasted_iota(jnp.int32, sims.shape, dimension=1)

    @pl.when(step == 0)
    def _init():
        scores_ref[:] = sims
        ids_ref[:] = ids

    @pl.when(step != 0)
    def _merge():
        cur = scores_ref[:]
        take = sims > cur
        scores_ref[:] = jnp.where(take, sims, cur)
        ids_ref[:] = jnp.where(take, ids, ids_ref[:])


@partial(jax.jit, static_argnames=("num_buckets", "batch_tile", "interpret"))
def bucketed_max_scan(
    queries: jax.Array,  # [B, d] (cast to rows dtype inside; int8 pre-quantized)
    rows: jax.Array,  # [N, d] storage dtype; N % num_buckets == 0
    bias: jax.Array,  # [N] fp32 additive (0 / -sqnorm / -inf)
    row_scale: jax.Array | None = None,  # [N] fp32 multiplicative (int8 dequant * alpha)
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Streaming scan: per-bucket (max score [B, L], argmax row [B, L])."""
    B, d = queries.shape
    N = rows.shape[0]
    assert N % num_buckets == 0, (N, num_buckets)
    num_steps = N // num_buckets
    Bt = min(batch_tile, _round_up(B, 8))
    Bp = _round_up(B, Bt)
    if Bp != B:
        queries = jnp.pad(queries, ((0, Bp - B), (0, 0)))
    if row_scale is None:
        row_scale = jnp.ones((N,), jnp.float32)
    q = queries if queries.dtype == rows.dtype else queries.astype(rows.dtype)
    # Sublane dim 1 == full array dim keeps the (1, L) blocks tile-legal.
    bias2d = bias.reshape(1, N)
    rscale2d = row_scale.reshape(1, N)

    grid = (Bp // Bt, num_steps)
    scores, ids = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_buckets, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_buckets), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_buckets), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bt, num_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, num_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, num_buckets), jnp.float32),
            jax.ShapeDtypeStruct((Bp, num_buckets), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * d,
            bytes_accessed=N * d * rows.dtype.itemsize + Bp * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, rows, rscale2d, bias2d)
    return scores[:B], ids[:B]


def fused_scan_topk(
    rows: jax.Array,  # [N, d] bf16/fp32 or int8 (then row_scale required)
    row_sqnorm: jax.Array,  # [N] fp32 (of the dequantized rows)
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, d] fp32
    *,
    num_hits: int,
    metric: str,
    row_scale: jax.Array | None = None,  # [N] fp32 int8 dequant scales
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused replacement for ``_dense_search``: (scores [B,K], row ids [B,K]).

    Rows where ``valid`` is False score -inf.  ``metric``: cosine/dot use the
    raw inner product; l2 uses the ``2*q.r - ||r||^2`` monotone transform.
    """
    N, d = rows.shape
    L = num_buckets
    Np = _round_up(max(N, L), L)
    if Np != N:
        rows = jnp.pad(rows, ((0, Np - N), (0, 0)))
        row_sqnorm = jnp.pad(row_sqnorm, (0, Np - N))
        valid = jnp.pad(valid, (0, Np - N))
        if row_scale is not None:
            row_scale = jnp.pad(row_scale, (0, Np - N))
    neg = jnp.float32(-1e30)
    alpha = 2.0 if metric == "l2" else 1.0
    bias = jnp.where(valid, -row_sqnorm if metric == "l2" else jnp.float32(0.0), neg)
    if rows.dtype == jnp.int8:
        if row_scale is None:
            msg = "int8 rows require row_scale"
            raise ValueError(msg)
        # One query scale shared across the batch (queries are ~unit-norm),
        # folded into the row scale — avoids a per-query kernel operand.
        q_abs = jnp.max(jnp.abs(queries))
        q_s = jnp.where(q_abs > 0, q_abs / 127.0, 1.0)
        queries = jnp.clip(jnp.round(queries / q_s), -127, 127).astype(jnp.int8)
        row_scale = (alpha * q_s) * row_scale
    else:
        row_scale = jnp.full((Np,), alpha, jnp.float32) if alpha != 1.0 else None
    bucket_scores, bucket_ids = bucketed_max_scan(
        queries, rows, bias, row_scale,
        num_buckets=L, batch_tile=batch_tile, interpret=interpret,
    )
    k = min(num_hits, L)
    top_scores, top_buckets = jax.lax.top_k(bucket_scores, k)
    top_ids = jnp.take_along_axis(bucket_ids, top_buckets, axis=1)
    top_scores = jnp.where(top_scores <= neg / 2, -jnp.inf, top_scores)
    return top_scores, top_ids


# --- int4-packed stage-1 scan (two-stage routing) ---------------------------
#
# The int8 full scan reads N*d bytes; at 1.25M x 1024 that is 1.28 GB, a
# ~1.56 ms speed-of-light floor on v5e HBM.  The two-stage routing halves
# stage-1 traffic by scanning an int4-PACKED copy of the rows (two nibbles
# per byte, 640 MB), then rescoring only the top-C candidates against the
# full-precision rows.  Queries stay int8, so only the rows lose precision;
# the int4 rank noise is far below top-k margins even on i.i.d. data
# (measured chunk recall@10 0.994 on random vectors, where margins are
# adversarially tiny; real embeddings have larger margins).  Measured on
# v5e @ 1.25M x 1024: p50 1.23 ms vs 1.87 ms for the single-stage int8 scan.
#
# Packing layout: LOW nibbles hold dims [0, d/2), HIGH nibbles hold dims
# [d/2, d) — the kernel then needs no interleave, just two MXU dots:
# ``q[:, :d/2] @ lo + q[:, d/2:] @ hi``.

#: Stage-2 candidate count: stage-1 int4 fidelity makes a small candidate
#: pool sufficient (threshold rank z-score at C=256 of 1.25M is ~4.1 vs the
#: true top-10 at ~5.3 with int4 noise sigma ~0.14).
INT4_STAGE1_CANDIDATES = 256
#: Stage-1 bucket count.  Bucketing keeps ONE survivor per bucket, so a true
#: top-k row is lost when a better row shares its bucket — expected loss
#: ~k(k-1)/(2L).  At k=40 candidates-that-matter, L=1024 costs ~2% chunk
#: recall; L=4096 cuts it to ~0.5% for the same HBM traffic (the block is
#: still VMEM-small: 4096 x d/2 int8 = 2 MB at d=1024).
INT4_NUM_BUCKETS = 4096


def pack_rows_int4(rows: jax.Array, row_scale: jax.Array | None = None):
    """Pack rows into int4 nibbles: returns (packed [N, d//2] int8, scale4 [N] fp32)
    with ``dequant(row) ≈ nibble * scale4``.  ``rows`` may be int8 (with its
    per-row ``row_scale``) or float; d must be even."""
    if rows.dtype == jnp.int8:
        # round(int8 * 7/127) in [-7, 7]; dequant scale grows by 127/7.
        nib = jnp.clip(
            jnp.round(rows.astype(jnp.float32) * (7.0 / 127.0)), -7, 7
        ).astype(jnp.int32)
        scale4 = (
            row_scale * (127.0 / 7.0)
            if row_scale is not None
            else jnp.full((rows.shape[0],), 127.0 / 7.0, jnp.float32)
        )
    else:
        x = rows.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1)
        scale4 = jnp.where(absmax > 0, absmax / 7.0, 1.0)
        nib = jnp.clip(jnp.round(x / scale4[:, None]), -7, 7).astype(jnp.int32)
    d = rows.shape[1]
    lo = nib[:, : d // 2] & 0xF
    hi = nib[:, d // 2 :] & 0xF
    return ((hi << 4) | lo).astype(jnp.int8), scale4


def unpack_rows_int4(packed: np.ndarray) -> np.ndarray:
    """Numpy oracle for the kernel's in-VMEM unpack (tests)."""
    p = np.asarray(packed).astype(np.int32)
    lo = ((p << 28) >> 28).astype(np.int8)
    hi = ((p << 24) >> 28).astype(np.int8)
    return np.concatenate([lo, hi], axis=1)


def _scan_kernel_int4(q_ref, rows_ref, rscale_ref, bias_ref, scores_ref, ids_ref):
    """Like :func:`_scan_kernel`, but rows arrive int4-packed and unpack in
    VMEM (two arithmetic shifts), so HBM traffic is halved."""
    step = pl.program_id(1)
    p = rows_ref[:].astype(jnp.int32)  # [L, d/2] packed nibbles
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 24), 28).astype(jnp.int8)
    q = q_ref[:]
    dh = p.shape[1]
    sims = jax.lax.dot_general(
        q[:, :dh], lo, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = sims + jax.lax.dot_general(
        q[:, dh:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = sims.astype(jnp.float32) * rscale_ref[:] + bias_ref[:]
    ids = step * sims.shape[1] + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)

    @pl.when(step == 0)
    def _init():
        scores_ref[:] = sims
        ids_ref[:] = ids

    @pl.when(step != 0)
    def _merge():
        cur = scores_ref[:]
        take = sims > cur
        scores_ref[:] = jnp.where(take, sims, cur)
        ids_ref[:] = jnp.where(take, ids, ids_ref[:])


@partial(jax.jit, static_argnames=("num_buckets", "batch_tile", "interpret"))
def int4_bucket_scan(
    q_i8: jax.Array,  # [B, d] int8 (pre-quantized queries)
    packed: jax.Array,  # [N, d//2] int8 nibbles; N % num_buckets == 0
    rscale: jax.Array,  # [N] fp32 effective scale (query scale folded in)
    bias: jax.Array,  # [N] fp32 additive (0 / -sqnorm / -inf)
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Streaming int4 scan: per-bucket (max score [B, L], argmax row [B, L])."""
    B, d = q_i8.shape
    N = packed.shape[0]
    assert N % num_buckets == 0, (N, num_buckets)
    num_steps = N // num_buckets
    Bt = min(batch_tile, _round_up(B, 8))
    Bp = _round_up(B, Bt)
    if Bp != B:
        q_i8 = jnp.pad(q_i8, ((0, Bp - B), (0, 0)))
    grid = (Bp // Bt, num_steps)
    scores, ids = pl.pallas_call(
        _scan_kernel_int4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_buckets, d // 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_buckets), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_buckets), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bt, num_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, num_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, num_buckets), jnp.float32),
            jax.ShapeDtypeStruct((Bp, num_buckets), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * d,
            bytes_accessed=N * d // 2 + Bp * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, packed, rscale.reshape(1, -1), bias.reshape(1, -1))
    return scores[:B], ids[:B]


def int4_two_stage_block(
    packed: jax.Array,  # [Np, d//2] int4-packed rows (may be bucket-padded)
    scale4: jax.Array,  # [Np] fp32
    rows: jax.Array,  # [N, d] full-precision rows for the rescore (N <= Np)
    row_scale: jax.Array | None,  # [N] fp32 (int8 rows)
    row_sqnorm: jax.Array,  # [N] fp32 (l2)
    valid: jax.Array,  # [N] bool
    queries: jax.Array,  # [B, d] fp32 (adapter already applied)
    *,
    num_hits: int,
    candidates: int,
    metric: str,
    num_buckets: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Core two-stage block shared by the single-device program
    (index/dense.py:_int4_two_stage_chunks) and the per-shard body of
    parallel/sharded.py:sharded_int4_two_stage — int4 Pallas stage-1 scan,
    top-``candidates`` selection, exact full-precision rescore, -inf
    sentinel restore.  Returns (scores [B, K], row ids [B, K] local to
    ``rows``); masked/padding slots carry -inf scores.

    Rescore gathers of bucket-padding candidates (ids in [N, Np)) clamp to
    the last row, but their -1e30 stage-1 bias keeps them out of every
    result."""
    alpha = 2.0 if metric == "l2" else 1.0
    bias = jnp.where(
        valid, -row_sqnorm if metric == "l2" else jnp.float32(0.0), jnp.float32(-1e30)
    )
    np4 = packed.shape[0]
    if bias.shape[0] != np4:
        bias = jnp.pad(bias, (0, np4 - bias.shape[0]), constant_values=-1e30)
    if metric == "l2":
        # l2 mixes the dot with an additive -||r||^2 term, so every query
        # must share one scale for the kernel's per-row rscale to be exact.
        q_abs = jnp.max(jnp.abs(queries))
        q_s = jnp.where(q_abs > 0, q_abs / 127.0, 1.0)[None, None]
        kernel_scale = (alpha * q_s[0, 0]) * scale4
    else:
        # Cosine/dot: a per-query positive factor cannot change that query's
        # ranking, so queries quantize PER QUERY (full 127-level resolution
        # even when adapter-transformed norms vary across the batch) and the
        # kernel's scores stay per-query-unnormalized; the rescore applies
        # the true scales.
        q_abs = jnp.max(jnp.abs(queries), axis=1, keepdims=True)
        q_s = jnp.where(q_abs > 0, q_abs / 127.0, 1.0)
        kernel_scale = alpha * scale4
    q_i8 = jnp.clip(jnp.round(queries / q_s), -127, 127).astype(jnp.int8)
    bscores, bids = int4_bucket_scan(
        q_i8, packed, kernel_scale, bias, num_buckets=num_buckets, interpret=interpret
    )
    c = min(candidates, bscores.shape[1])
    _, bpos = jax.lax.top_k(bscores, c)
    cand_ids = jnp.take_along_axis(bids, bpos, axis=1)  # [B, C]
    sub = rows[cand_ids]  # [B, C, d]
    if rows.dtype == jnp.int8:
        sims2 = jnp.einsum("bd,bcd->bc", q_i8, sub, preferred_element_type=jnp.int32)
        sims2 = sims2.astype(jnp.float32) * (
            alpha * q_s.reshape(-1, 1)[: sims2.shape[0]] * row_scale[cand_ids]
        )
    else:
        sims2 = alpha * jnp.einsum(
            "bd,bcd->bc", queries.astype(sub.dtype), sub,
            preferred_element_type=jnp.float32,
        )
    # Re-apply the bias: the l2 -sqnorm term, and -inf for masked rows (a
    # masked candidate can surface from stage 1 only when fewer than C rows
    # are alive; without this it would resurface with a real score).
    sims2 = sims2 + bias[cand_ids]
    sc, pos = jax.lax.top_k(sims2, min(num_hits, c))
    # Restore the -inf sentinel for masked/padding rows: -1e30 is finite, so
    # downstream `isfinite` fixups would otherwise pass filtered/tombstoned
    # chunks through as real results.
    sc = jnp.where(sc <= jnp.float32(-1e30) / 2, -jnp.inf, sc)
    return sc, jnp.take_along_axis(cand_ids, pos, axis=1)


def reference_bucketed_max(
    queries: np.ndarray,
    rows: np.ndarray,
    bias: np.ndarray,
    *,
    num_buckets: int,
    row_scale: np.ndarray | None = None,
    query_scale: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy oracle with identical bucket semantics (tests)."""
    sims = queries.astype(np.float32) @ rows.astype(np.float32).T
    if row_scale is not None:
        sims = sims * row_scale[None, :]
    if query_scale is not None:
        sims = sims * query_scale[:, None]
    sims = sims + bias[None, :]
    B, N = sims.shape
    folded = sims.reshape(B, N // num_buckets, num_buckets)
    arg = folded.argmax(axis=1)  # [B, L] step index
    scores = np.take_along_axis(folded, arg[:, None, :], axis=1)[:, 0]
    ids = arg * num_buckets + np.arange(num_buckets)[None, :]
    return scores, ids.astype(np.int32)
