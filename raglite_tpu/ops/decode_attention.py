"""Pallas grouped-query DECODE attention (T = 1) over the resident KV cache.

Replaces the two XLA einsums in ``DecoderModel.forward``'s decode step
(reference hot loop being replaced: llama.cpp's batched decode,
/root/reference/src/raglite/_chatml_function_calling.py:527-580).  The XLA
batched-dot lowering streams the [B, KVH, hd, S] cache at ~37% of HBM
bandwidth on v5e (measured 0.14 ms/layer at B=8, S=2560, base preset —
~3.4 ms of a 5.1 ms decode step); this kernel assigns one program per
(batch row, kv group), DMAs that group's K and V slices into VMEM exactly
once, and does the whole masked-softmax attention for the group's REP query
heads on-chip:

    logits[REP, S] = q[REP, hd] @ k[hd, S]          (MXU, fp32 accum)
    probs          = softmax(mask(logits * scale))   (VPU, fp32)
    ctx[REP, hd]   = probs @ v[hd, S]^T              (MXU, fp32 accum)

Cache layout is the decoder's storage layout [B, KVH, hd, S] (sequence
minor-most) so no transposition happens anywhere.  Supports the model
variants the XLA path supports: attention-logit soft-capping (Gemma2) and
sliding-window masking (Mistral/Gemma) via scalar operands.

Masking matches ``DecoderModel.forward``: key position s is valid iff
``s <= pos`` (causal; ``pos`` = the row's cache offset for the token being
decoded) and, when ``window > 0``, ``s > pos - window``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(
    pos_ref,  # SMEM [B] int32: query position per row (== row cache offset)
    q_ref,  # VMEM [1, 1, REP, hd]
    k_ref,  # VMEM [1, 1, hd, S]
    v_ref,  # VMEM [1, 1, hd, S]
    o_ref,  # VMEM [1, 1, REP, hd] fp32
    *,
    scale: float,
    softcap: float,
    window: int,
):
    b = pl.program_id(0)
    pos = pos_ref[b]
    q = q_ref[0, 0]  # [REP, hd]
    k = k_ref[0, 0]  # [hd, S]
    # QK^T: contract hd. fp32 accumulation on the MXU.
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP, S]
    logits = logits * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
    mask = s_ids <= pos
    if window:
        mask &= s_ids > pos - window
    logits = jnp.where(mask, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    v = v_ref[0, 0]  # [hd, S]
    # probs @ V: contract S (both operands sequence-minor — no transpose).
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP, hd]
    o_ref[0, 0] = ctx


@partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "interpret"),
)
def gqa_decode_attention(
    q: jax.Array,  # [B, KVH, REP, hd] (any float dtype)
    k_cache: jax.Array,  # [B, KVH, hd, S]
    v_cache: jax.Array,  # [B, KVH, hd, S]
    positions: jax.Array,  # [B] int32 — this token's position per row
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """One-token grouped-query attention; returns ctx [B, KVH, REP, hd] fp32."""
    B, KVH, REP, hd = q.shape
    S = k_cache.shape[3]
    kernel = partial(
        _decode_attn_kernel,
        scale=float(scale),
        softcap=float(softcap),
        window=int(window),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # positions land in SMEM before the body
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec(
                (1, 1, REP, hd), lambda b, g, pos: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S), lambda b, g, pos: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S), lambda b, g, pos: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, REP, hd), lambda b, g, pos: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, REP, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * KVH * REP * hd * S * 2,
            bytes_accessed=2 * B * KVH * hd * S * k_cache.dtype.itemsize,
            transcendentals=B * KVH * REP * S,
        ),
        interpret=interpret,
    )(positions.astype(jnp.int32), q, k_cache, v_cache)


def _verify_attn_kernel(
    pos_ref,  # SMEM [B] int32: FIRST window position per row (row cache offset)
    q_ref,  # VMEM [1, 1, REP, T, hd]
    k_ref,  # VMEM [1, 1, hd, S]
    v_ref,  # VMEM [1, 1, hd, S]
    o_ref,  # VMEM [1, 1, REP, T, hd] fp32
    *,
    scale: float,
    softcap: float,
    window: int,
):
    b = pl.program_id(0)
    pos0 = pos_ref[b]
    q = q_ref[0, 0]  # [REP, T, hd]
    REP, T, hd = q.shape
    q2 = q.reshape(REP * T, hd)  # row r = (rep r // T, window step r % T)
    k = k_ref[0, 0]  # [hd, S]
    logits = jax.lax.dot_general(
        q2,
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [REP*T, S]
    logits = logits * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
    row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) % T
    mask = s_ids <= row_pos
    if window:
        mask &= s_ids > row_pos - window
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
    )  # [REP*T, hd]
    o_ref[0, 0] = ctx.reshape(REP, T, hd)


@partial(
    jax.jit,
    static_argnames=("scale", "softcap", "window", "interpret"),
)
def gqa_verify_attention(
    q: jax.Array,  # [B, KVH, REP, T, hd] (any float dtype)
    k_cache: jax.Array,  # [B, KVH, hd, S]
    v_cache: jax.Array,  # [B, KVH, hd, S]
    positions: jax.Array,  # [B] int32 — FIRST window position per row
    *,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Small-T grouped-query attention for speculative verify windows.

    Per window position t this computes EXACTLY the T=1 decode kernel's
    math — same [*, hd] x [hd, S] MXU contraction, same full-S masked
    softmax, same [*, S] x [S, hd] context contraction, with position
    ``pos0 + t`` causally masking key s iff ``s <= pos0 + t`` (and the
    sliding window iff ``s > pos0 + t - window``) — so a draft verify
    forward shares the plain greedy decode loop's attention numerics
    instead of taking the XLA einsum path, whose different reduction order
    measurably flips near-tie argmaxes (BENCH_r04
    ``spec_bitexact_vs_plain_greedy: false``).  Returns ctx
    [B, KVH, REP, T, hd] fp32.
    """
    B, KVH, REP, T, hd = q.shape
    S = k_cache.shape[3]
    kernel = partial(
        _verify_attn_kernel,
        scale=float(scale),
        softcap=float(softcap),
        window=int(window),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec(
                (1, 1, REP, T, hd), lambda b, g, pos: (b, g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S), lambda b, g, pos: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hd, S), lambda b, g, pos: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, REP, T, hd), lambda b, g, pos: (b, g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, REP, T, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * KVH * REP * T * hd * S * 2,
            bytes_accessed=2 * B * KVH * hd * S * k_cache.dtype.itemsize,
            transcendentals=B * KVH * REP * T * S,
        ),
        interpret=interpret,
    )(positions.astype(jnp.int32), q, k_cache, v_cache)
