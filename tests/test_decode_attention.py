"""Pallas grouped-query decode-attention kernel: oracle + integration parity.

The kernel (ops/decode_attention.py) replaces the two XLA einsums in
DecoderModel.forward's T=1 decode step; it must match them bit-for-bit in
semantics (same masking, scaling, soft-capping, fp32 accumulation).  On the
CPU test mesh the kernel runs in interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raglite_tpu.ops.decode_attention import gqa_decode_attention


def _oracle(q, k_cache, v_cache, positions, scale, softcap=0.0, window=0):
    """NumPy re-statement of the decoder's einsum decode attention.

    q: [B, G, R, hd]; k_cache/v_cache: [B, G, hd, S]; positions: [B].
    """
    q = np.asarray(q, np.float32)
    k = np.asarray(k_cache, np.float32)
    v = np.asarray(v_cache, np.float32)
    logits = np.einsum("bgrd,bgds->bgrs", q, k) * scale
    if softcap:
        logits = softcap * np.tanh(logits / softcap)
    S = k.shape[3]
    s_ids = np.arange(S)
    mask = s_ids[None, :] <= positions[:, None]  # [B, S]
    if window:
        mask &= s_ids[None, :] > positions[:, None] - window
    logits = np.where(mask[:, None, None, :], logits, -1e9)
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("bgrs,bgds->bgrd", probs, v)


@pytest.mark.parametrize(
    ("softcap", "window"),
    [(0.0, 0), (50.0, 0), (0.0, 7), (30.0, 5)],
)
def test_kernel_matches_oracle(softcap: float, window: int) -> None:
    B, G, R, hd, S = 3, 2, 4, 16, 24
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, G, R, hd)).astype(np.float32)
    k = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    v = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    positions = np.array([0, 11, 23], np.int32)  # incl. edge rows
    scale = 1.0 / np.sqrt(hd)
    got = gqa_decode_attention(
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(positions),
        scale=float(scale),
        softcap=softcap,
        window=window,
        interpret=True,
    )
    want = _oracle(q, k, v, positions, scale, softcap, window)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_decoder_forward_parity_with_kernel(monkeypatch) -> None:
    """A full decode step through DecoderModel.forward produces identical
    logits with the Pallas kernel (interpret mode) and the XLA einsum path."""
    from functools import partial

    from raglite_tpu.models import decoder as dec

    cfg = dict(
        layers=2, d_model=64, heads=4, kv_heads=2, d_ff=128, vocab=128, max_len=64
    )
    model = dec.DecoderModel(cfg)
    params = dec.init_decoder_params(cfg, seed=3, dtype=jnp.float32)
    cache = model.init_cache(2, 64, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 5)))
    _, cache = model.forward(params, ids, cache, jnp.asarray(0, jnp.int32))
    tok = jnp.asarray([[7], [9]])
    # Per-row offsets exercise the positions plumbing into the kernel.
    offs = jnp.asarray([5, 3], jnp.int32)

    model.use_pallas_decode = False
    ref_logits, _ = model.forward(params, tok, cache, offs)

    monkeypatch.setattr(
        dec, "gqa_decode_attention", partial(gqa_decode_attention, interpret=True)
    )
    model.use_pallas_decode = True
    got_logits, _ = model.forward(params, tok, cache, offs)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )


def test_decoder_gates_kernel_off_for_long_caches() -> None:
    """Caches whose K/V blocks exceed the VMEM budget must take the XLA path."""
    from raglite_tpu.models import decoder as dec

    itemsize = 2  # bf16
    hd, S_ok = 128, 8192
    assert 4 * hd * S_ok * itemsize <= dec._DECODE_KERNEL_VMEM_BYTES
    S_big = 32768
    assert 4 * hd * S_big * itemsize > dec._DECODE_KERNEL_VMEM_BYTES


def _verify_oracle(q, k_cache, v_cache, positions, scale, softcap=0.0, window=0):
    """NumPy oracle for the small-T verify window: position t masks key s
    iff s <= pos0 + t (and s > pos0 + t - window under sliding windows).

    q: [B, G, R, T, hd]; k_cache/v_cache: [B, G, hd, S]; positions: [B].
    """
    q = np.asarray(q, np.float32)
    k = np.asarray(k_cache, np.float32)
    v = np.asarray(v_cache, np.float32)
    logits = np.einsum("bgrtd,bgds->bgrts", q, k) * scale
    if softcap:
        logits = softcap * np.tanh(logits / softcap)
    S = k.shape[3]
    T = q.shape[3]
    s_ids = np.arange(S)
    pos = positions[:, None] + np.arange(T)[None, :]  # [B, T]
    mask = s_ids[None, None, :] <= pos[:, :, None]  # [B, T, S]
    if window:
        mask &= s_ids[None, None, :] > pos[:, :, None] - window
    logits = np.where(mask[:, None, None, :, :], logits, -1e9)
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    probs = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("bgrts,bgds->bgrtd", probs, v)


@pytest.mark.parametrize(
    ("softcap", "window"),
    [(0.0, 0), (50.0, 0), (0.0, 7), (30.0, 5)],
)
def test_verify_kernel_matches_oracle(softcap: float, window: int) -> None:
    from raglite_tpu.ops.decode_attention import gqa_verify_attention

    B, G, R, T, hd, S = 2, 2, 3, 5, 16, 32
    rng = np.random.default_rng(7)
    q = rng.standard_normal((B, G, R, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    v = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    positions = np.array([3, 27 - T], np.int32)  # incl. near-end window
    scale = 1.0 / np.sqrt(hd)
    got = gqa_verify_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
        scale=float(scale), softcap=softcap, window=window, interpret=True,
    )
    want = _verify_oracle(q, k, v, positions, scale, softcap, window)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_verify_kernel_equals_sequential_decode_kernel() -> None:
    """Position-for-position, the verify kernel computes the T=1 decode
    kernel's math: running the decode kernel at each window position must
    reproduce the verify kernel's output (this per-position identity is
    what makes speculative verify share plain greedy decode's numerics)."""
    from raglite_tpu.ops.decode_attention import gqa_verify_attention

    B, G, R, T, hd, S = 2, 2, 4, 7, 16, 40
    rng = np.random.default_rng(11)
    q = rng.standard_normal((B, G, R, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    v = rng.standard_normal((B, G, hd, S)).astype(np.float32)
    positions = np.array([5, 20], np.int32)
    scale = 1.0 / np.sqrt(hd)
    whole = np.asarray(
        gqa_verify_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
            scale=float(scale), interpret=True,
        )
    )
    for t in range(T):
        step = np.asarray(
            gqa_decode_attention(
                jnp.asarray(q[:, :, :, t, :]),
                jnp.asarray(k),
                jnp.asarray(v),
                jnp.asarray(positions + t),
                scale=float(scale),
                interpret=True,
            )
        )
        np.testing.assert_allclose(whole[:, :, :, t, :], step, rtol=1e-6, atol=1e-6)


def test_decoder_forward_verify_window_parity(monkeypatch) -> None:
    """A T=5 (speculative verify) window through DecoderModel.forward:
    identical logits with the verify kernel (interpret mode) and the XLA
    einsum path, including per-row offsets."""
    from functools import partial

    from raglite_tpu.models import decoder as dec

    cfg = dict(
        layers=2, d_model=64, heads=4, kv_heads=2, d_ff=128, vocab=128, max_len=64
    )
    model = dec.DecoderModel(cfg)
    params = dec.init_decoder_params(cfg, seed=5, dtype=jnp.float32)
    cache = model.init_cache(2, 64, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 6)))
    _, cache = model.forward(params, ids, cache, jnp.asarray(0, jnp.int32))
    window = jnp.asarray(np.random.default_rng(3).integers(0, 128, (2, 5)))
    offs = jnp.asarray([6, 4], jnp.int32)

    model.use_pallas_decode = False
    ref_logits, _ = model.forward(params, window, cache, offs)

    monkeypatch.setattr(
        dec, "gqa_verify_attention", partial(
            dec.gqa_verify_attention, interpret=True
        )
    )
    model.use_pallas_decode = True
    got_logits, _ = model.forward(params, window, cache, offs)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
