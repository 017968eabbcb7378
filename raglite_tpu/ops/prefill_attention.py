"""Pallas grouped-query PREFILL attention (T > 1) over the resident KV cache.

The prefill counterpart of ops/decode_attention.py.  Measured on v5e (base
preset, T=2048, S=2560, scripts/prefill_kernel_check.py): prefill MFU
0.282 -> 0.465 at B=1 and 0.327 -> 0.558 at B=8 (1.65-1.7x), top-5 logit
parity with the XLA path.
The XLA einsum path materializes the [B, G, R, T, S] fp32 logits tensor in
HBM (base preset, T=2048, S=2560: ~335 MB per layer), reads it back for the
softmax, and writes/reads the probs tensor again — ~1.3 GB of HBM round
trips per layer against ~0.1 ms of attention matmul, which is why prefill
MFU plateaued at 0.33 (BENCH_r03).  This kernel assigns one program per
(batch row, kv group, query tile), keeps the [REP*BQ, S] logits tile in
VMEM end-to-end, and writes only the [REP*BQ, hd] context back to HBM:

    logits[REP*BQ, S] = q_tile @ k[hd, S]            (MXU, fp32 accum)
    probs             = softmax(mask(logits * scale)) (VPU, fp32, in VMEM)
    ctx[REP*BQ, hd]   = probs @ v[hd, S]^T            (MXU, fp32 accum)

The (b, g) K/V blocks are invariant across the query-tile grid axis (the
fastest-iterating one), so Mosaic's pipeline fetches each [hd, S] slice
into VMEM once and reuses it for all T/BQ query tiles — the same
stream-once property as the decode kernel, amortized further.

Masking matches ``DecoderModel.forward``'s prefill branch exactly: key
position s is valid for query t iff ``s <= off + t`` (causal, with ``off``
the row's cache offset — nonzero for speculative verify windows) and, when
``window > 0``, ``s > off + t - window``.  Supports logit soft-capping
(Gemma2) like the XLA path.  No flash-style running softmax is needed: the
whole [REP*BQ, S] tile fits VMEM for every cache length the decode kernel
already accepts (the caller gates on the same budget), so the softmax is
exact in one pass.

Replaces llama.cpp's prefill (the reference loads it via
/root/reference/src/raglite/_litellm.py:96-148 and drives generation through
_chatml_function_calling.py:527-580).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gqa_prefill_attention", "prefill_kernel_viable"]

#: Target query rows (REP * BQ) per program: one MXU-friendly tile that
#: keeps the fp32 logits block a few MB even at long S.
_TARGET_ROWS = 256


def _pick_bq(rep: int, t: int) -> int:
    """Largest query-tile length BQ dividing t with REP*BQ <= _TARGET_ROWS.

    BQ is the block's second-minor dim, so Mosaic requires it divisible by
    8 sublanes unless it spans the whole axis (bq == t).  The old
    halve-until-divides search broke at REP=5 (the 4B `large` preset's
    20q/4kv grouping): 2048 has no odd divisor near 256//5, so it walked
    down to bq=1 and the lowering rejected the (1, hd) block."""
    target = min(max(_TARGET_ROWS // max(rep, 1), 1), t)
    for bq in range(8 * (target // 8), 0, -8):
        if t % bq == 0:
            return bq
    # No multiple-of-8 divisor <= target: take the whole axis (block dim ==
    # array dim is always legal; rows = rep*t only arises for tiny t).
    return t


def _prefill_attn_kernel(
    off_ref,  # SMEM [B] int32: per-row cache offset (query 0's position)
    q_ref,  # VMEM [1, 1, REP, BQ, hd]
    k_ref,  # VMEM [1, 1, hd, S]
    v_ref,  # VMEM [1, 1, hd, S]
    o_ref,  # VMEM [1, 1, REP, BQ, hd] fp32
    *,
    scale: float,
    softcap: float,
    window: int,
    bq: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    off = off_ref[b]
    rep, _, hd = q_ref.shape[2:]
    q = q_ref[0, 0].reshape(rep * bq, hd)
    k = k_ref[0, 0]  # [hd, S]
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP*BQ, S]
    logits = logits * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
    # Row r of the flattened [REP*BQ] tile is query position off + qi*BQ +
    # (r % BQ); the rep index does not affect masking.
    t_ids = (
        jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=0) % bq
        + off
        + qi * bq
    )
    mask = s_ids <= t_ids
    if window:
        mask &= s_ids > t_ids - window
    logits = jnp.where(mask, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    v = v_ref[0, 0]  # [hd, S]
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP*BQ, hd]
    o_ref[0, 0] = ctx.reshape(rep, bq, hd)


def prefill_kernel_viable(
    rep: int, t: int, s: int, hd: int, kv_itemsize: int, budget_bytes: int
) -> bool:
    """True when the per-program VMEM working set fits ``budget_bytes``
    (K + V slices, double-buffered by the pipeline, plus the fp32
    logits/probs tile and q/o tiles)."""
    bq = _pick_bq(rep, t)
    rows = rep * bq
    working = (
        4 * hd * s * kv_itemsize  # k + v, x2 pipeline buffers
        + 2 * rows * s * 4  # logits + exp tile (fp32)
        + 2 * rows * hd * 4  # q tile + ctx tile
    )
    return working <= budget_bytes


@partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "interpret"),
)
def gqa_prefill_attention(
    q: jax.Array,  # [B, KVH, REP, T, hd] (any float dtype)
    k_cache: jax.Array,  # [B, KVH, hd, S]
    v_cache: jax.Array,  # [B, KVH, hd, S]
    offsets: jax.Array,  # [B] int32 — each row's cache offset (query 0)
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Multi-token grouped-query attention; returns ctx [B, KVH, REP, T, hd]
    fp32 — numerically the decoder's XLA einsum prefill branch."""
    B, KVH, REP, T, hd = q.shape
    S = k_cache.shape[3]
    bq = _pick_bq(REP, T)
    kernel = partial(
        _prefill_attn_kernel,
        scale=float(scale),
        softcap=float(softcap),
        window=int(window),
        bq=bq,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # Query tiles iterate fastest so the (b, g) K/V blocks stay resident
        # in the pipeline across all T/BQ tiles of a group.
        grid=(B, KVH, T // bq),
        in_specs=[
            pl.BlockSpec(
                (1, 1, REP, bq, hd),
                lambda b, g, qi, off: (b, g, 0, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S),
                lambda b, g, qi, off: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S),
                lambda b, g, qi, off: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, REP, bq, hd),
            lambda b, g, qi, off: (b, g, 0, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, REP, T, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KVH * REP * T * hd * S,
            bytes_accessed=2 * B * KVH * hd * S * k_cache.dtype.itemsize
            + 2 * B * KVH * REP * T * hd * 4,
            transcendentals=B * KVH * REP * T * S,
        ),
        interpret=interpret,
    )(offsets.astype(jnp.int32), q, k_cache, v_cache)
