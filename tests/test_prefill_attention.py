"""Pallas grouped-query prefill-attention kernel: oracle + integration parity.

The kernel (ops/prefill_attention.py) replaces the XLA einsum prefill branch
of DecoderModel.forward (T > 1); it must match it in semantics — same
causal/window masking against per-row cache offsets, scaling, soft-capping,
fp32 accumulation.  On the CPU test mesh the kernel runs in interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raglite_tpu.ops.prefill_attention import (
    _pick_bq,
    gqa_prefill_attention,
    prefill_kernel_viable,
)


def _oracle(q, k_cache, v_cache, offsets, scale, softcap=0.0, window=0):
    """NumPy re-statement of the decoder's einsum prefill attention.

    q: [B, G, R, T, hd]; k_cache/v_cache: [B, G, hd, S]; offsets: [B].
    """
    q = np.asarray(q, np.float32)
    k = np.asarray(k_cache, np.float32)
    v = np.asarray(v_cache, np.float32)
    B, G, R, T, hd = q.shape
    S = k.shape[3]
    logits = np.einsum("bgrtd,bgds->bgrts", q, k) * scale
    if softcap:
        logits = softcap * np.tanh(logits / softcap)
    positions = offsets[:, None] + np.arange(T)[None, :]  # [B, T]
    s_ids = np.arange(S)
    mask = s_ids[None, None, :] <= positions[:, :, None]  # [B, T, S]
    if window:
        mask &= s_ids[None, None, :] > positions[:, :, None] - window
    logits = np.where(mask[:, None, None, :, :], logits, -1e9)
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("bgrts,bgds->bgrtd", probs, v)


@pytest.mark.parametrize(
    ("softcap", "window"),
    [(0.0, 0), (50.0, 0), (0.0, 7), (30.0, 5)],
)
def test_kernel_matches_oracle(softcap: float, window: int) -> None:
    B, G, R, T, hd, S = 2, 2, 3, 16, 16, 24
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, G, R, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    v = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    offsets = np.array([0, 8], np.int32)  # incl. a nonzero verify-style offset
    scale = 1.0 / np.sqrt(hd)
    got = gqa_prefill_attention(
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(offsets),
        scale=float(scale),
        softcap=softcap,
        window=window,
        interpret=True,
    )
    want = _oracle(q, k, v, offsets, scale, softcap, window)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_kernel_multi_tile_queries() -> None:
    """T spanning several query tiles: tile-boundary masking must be exact."""
    B, G, R, hd = 1, 1, 2, 16
    T = 256  # several BQ=128 tiles at REP=2
    S = T + 32
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, G, R, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    v = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    offsets = np.array([5], np.int32)
    got = gqa_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(offsets),
        scale=0.25, interpret=True,
    )
    want = _oracle(q, k, v, offsets, 0.25)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_decoder_forward_parity_with_kernel(monkeypatch) -> None:
    """A full T>1 forward through DecoderModel produces identical logits with
    the Pallas prefill kernel (interpret mode) and the XLA einsum path."""
    from functools import partial

    from raglite_tpu.models import decoder as dec

    cfg = dict(
        layers=2, d_model=64, heads=4, kv_heads=2, d_ff=128, vocab=128, max_len=64
    )
    model = dec.DecoderModel(cfg)
    params = dec.init_decoder_params(cfg, seed=3, dtype=jnp.float32)
    cache = model.init_cache(2, 64, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 8)))

    model.use_pallas_prefill = False
    ref_logits, ref_cache = model.forward(params, ids, cache, jnp.asarray(0, jnp.int32))

    monkeypatch.setattr(
        dec, "gqa_prefill_attention", partial(gqa_prefill_attention, interpret=True)
    )
    model.use_pallas_prefill = True
    got_logits, got_cache = model.forward(params, ids, cache, jnp.asarray(0, jnp.int32))

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(ref_cache["k"], got_cache["k"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # Per-row offsets (the speculative verify window shape).
    tok = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 4)))
    offs = jnp.asarray([8, 5], jnp.int32)
    model.use_pallas_prefill = False
    ref_logits, _ = model.forward(params, tok, ref_cache, offs)
    model.use_pallas_prefill = True
    got_logits, _ = model.forward(params, tok, got_cache, offs)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )


def test_viability_gate() -> None:
    """Working sets beyond the VMEM budget must fall back to the XLA path."""
    budget = 12 * 1024 * 1024
    # base preset at T=2048, S=2560, bf16 cache: must use the kernel.
    assert prefill_kernel_viable(2, 2048, 2560, 64, 2, budget)
    # pathological: enormous cache with huge REP — must gate off.
    assert not prefill_kernel_viable(16, 4096, 65536, 128, 2, budget)


def test_pick_bq() -> None:
    assert _pick_bq(2, 2048) == 128
    assert _pick_bq(1, 2048) == 256
    assert _pick_bq(4, 8) == 8  # T smaller than the target tile
    assert _pick_bq(4, 12) == 12  # no multiple-of-8 divisor: whole axis
    # REP=5 (the 4B `large` preset's 20q/4kv grouping): BQ must stay a
    # multiple of 8 sublanes — the old search walked 51 -> 1 and Mosaic
    # rejected the (1, hd) block (BENCH r4 smoke).
    assert _pick_bq(5, 2048) == 32
    for rep in (1, 2, 3, 5, 7, 16):
        for t in (8, 12, 24, 100, 256, 2048):
            bq = _pick_bq(rep, t)
            assert bq == t or (t % bq == 0 and bq % 8 == 0), (rep, t, bq)


def test_kernel_rep5_matches_oracle() -> None:
    """Odd GQA grouping (REP=5, the `large` preset shape) through the
    kernel in interpret mode."""
    rng = np.random.default_rng(5)
    B, G, R, T, hd, S = 1, 2, 5, 16, 32, 48
    q = jnp.asarray(rng.normal(size=(B, G, R, T, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, G, hd, S)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, G, hd, S)), jnp.float32)
    offsets = jnp.asarray([3], jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    got = gqa_prefill_attention(q, k, v, offsets, scale=scale, interpret=True)
    want = _oracle(q, k, v, np.asarray([3]), scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
