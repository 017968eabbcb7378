"""Prompt-lookup speculative decoding (models/speculative.py).

The exactness contract: with temperature == 0 the speculative device loop
must emit a BIT-IDENTICAL token sequence to the plain on-device decode
loop — speculation may only change how many forwards it takes, never what
comes out.  (Reference decode hot loop being accelerated:
/root/reference/src/raglite/_chatml_function_calling.py:527-580.)
"""

from __future__ import annotations

import numpy as np
import pytest

from raglite_tpu.models.decoder import JaxChatLLM
from raglite_tpu.models.speculative import _ngram_draft


@pytest.fixture(scope="module")
def llm() -> JaxChatLLM:
    return JaxChatLLM("tiny", seed=3)


def _tokens(llm, prompt, *, speculate, monkeypatch, max_new=90, **sampling):
    monkeypatch.setenv("RAGLITE_TPU_SPECULATE", "always" if speculate else "0")
    return list(
        llm._generate_tokens(prompt, max_new_tokens=max_new, **sampling)
    )


@pytest.mark.parametrize(
    "prompt",
    [
        # Copy-heavy: greedy decode from a random-init model falls into
        # repetition, so history n-grams match and drafts accept.
        "the cat sat on the mat. the cat sat on the mat. the cat sat",
        # No obvious structure: drafts mostly miss; output must not change.
        "q9 zp! & unique tokens only here",
        "ab",  # shorter than a trigram suffix
    ],
)
def test_greedy_speculation_is_exact(llm, prompt, monkeypatch):
    plain = _tokens(llm, prompt, speculate=False, monkeypatch=monkeypatch)
    spec = _tokens(llm, prompt, speculate=True, monkeypatch=monkeypatch)
    assert spec == plain
    assert len(plain) > 0


def test_greedy_speculation_exact_across_chunks(llm, monkeypatch):
    """max_new far beyond DECODE_CHUNK: the carry (logits/reject/history)
    must survive chunk boundaries."""
    prompt = "alpha beta gamma. alpha beta gamma. alpha beta"
    plain = _tokens(llm, prompt, speculate=False, monkeypatch=monkeypatch, max_new=200)
    spec = _tokens(llm, prompt, speculate=True, monkeypatch=monkeypatch, max_new=200)
    assert spec == plain


def test_speculation_accepts_on_copy_heavy_text(llm, monkeypatch):
    """On repetitive text the verify forwards must commit more than one
    token each on average — the whole point of the machinery."""
    prompt = "one two three four. " * 8
    spec = _tokens(llm, prompt, speculate=True, monkeypatch=monkeypatch, max_new=120)
    stats = llm.spec_stats
    assert stats["tokens"] == len(spec)
    # Greedy repetition loops: expect well above 1 token per forward.
    assert stats["tokens"] / max(stats["verify_iters"], 1) > 1.3


def test_sampled_speculation_runs_and_terminates(llm, monkeypatch):
    """temperature > 0 uses the speculative-sampling acceptance rule; the
    PRNG stream differs from plain decode so only invariants are checked."""
    out = _tokens(
        llm,
        "the rain in spain stays mainly on the plain. the rain in",
        speculate=True,
        monkeypatch=monkeypatch,
        temperature=0.8,
        top_p=0.9,
        top_k=40,
        max_new=64,
    )
    assert 0 < len(out) <= 64
    vocab = llm.cfg["vocab"]
    assert all(0 <= t < vocab for t in out)
    assert all(t not in llm._stop_ids for t in out)


def test_speculation_default_on_for_greedy_only(llm, monkeypatch):
    """Default (auto): greedy decode speculates, sampled decode does not —
    sampled outputs for a pinned seed must not change under the default."""
    monkeypatch.delenv("RAGLITE_TPU_SPECULATE", raising=False)
    llm.spec_stats = None
    list(llm._generate_tokens("x y. x y. x", max_new_tokens=40))
    assert llm.spec_stats is not None  # greedy -> speculated
    llm.spec_stats = None
    list(llm._generate_tokens("x y. x y. x", max_new_tokens=24, temperature=0.7))
    assert llm.spec_stats is None  # sampled -> plain device loop


def test_chat_stop_tokens_respected(llm, monkeypatch):
    """complete() goes through the speculative path at temperature 0 and
    must still terminate at ChatML stops with a well-formed message."""
    monkeypatch.setenv("RAGLITE_TPU_SPECULATE", "auto")
    res = llm.complete(
        [{"role": "user", "content": "echo echo echo echo"}],
        temperature=0.0,
        max_tokens=64,
    )
    assert isinstance(res.content, str)


def test_batched_greedy_speculation_is_exact(llm, monkeypatch):
    """The batched speculative loop (per-row drafts/accepts/offsets) must
    emit exactly what the plain batched device loop emits, row by row —
    including rows that finish early and rows with divergent accept rates."""
    prompts = [
        "the cat sat on the mat. the cat sat on the mat. the cat",
        "unique q9 zp! nothing repeats in here at all",
        "alpha beta gamma. alpha beta gamma. alpha beta",
    ]
    monkeypatch.setenv("RAGLITE_TPU_SPECULATE", "0")
    plain = llm._generate_batch(prompts, max_new_tokens=90)
    monkeypatch.setenv("RAGLITE_TPU_SPECULATE", "always")
    spec = llm._generate_batch(prompts, max_new_tokens=90)
    assert spec == plain


def test_batched_sampled_speculation_runs(llm, monkeypatch):
    monkeypatch.setenv("RAGLITE_TPU_SPECULATE", "always")
    outs = llm._generate_batch(
        ["one two. one two. one", "three four. three four. three"],
        max_new_tokens=48,
        temperature=0.9,
        top_k=50,
    )
    vocab = llm.cfg["vocab"]
    for toks in outs:
        assert 0 < len(toks) <= 48
        assert all(0 <= t < vocab for t in toks)


def test_ngram_draft_prefers_trigram_and_recency():
    import jax.numpy as jnp

    # History: ... 5 6 7 9 9 | 5 6 7 8 ... — suffix (6, 7) + t=7? Build
    # explicitly: committed = [5,6,7,1,2,5,6,7,3,4], suffix tokens are
    # (hist[-2], hist[-1], t) = (6, 7, ...) with t chosen below.
    committed = [5, 6, 7, 1, 2, 5, 6, 7, 3, 4, 5, 6]
    h = np.zeros(32, np.int32)
    h[: len(committed)] = committed
    # t = 7 -> trigram (5, 6, 7) matches at j=0 and j=5; most recent (j=5)
    # wins; draft = tokens after position 5+3=8 -> [3, 4, 5].
    drafts = np.asarray(
        _ngram_draft(jnp.asarray(h), jnp.asarray(len(committed)), jnp.asarray(7), 3, 0)
    )
    assert drafts.tolist() == [3, 4, 5]
    # t = 9 -> no (6, 9) bigram and no trigram: pad (0) drafts.
    drafts = np.asarray(
        _ngram_draft(jnp.asarray(h), jnp.asarray(len(committed)), jnp.asarray(9), 3, 0)
    )
    assert drafts.tolist() == [0, 0, 0]


def test_greedy_speculation_exact_at_bucket_boundary(llm, monkeypatch):
    """Regression (round-4 advisor, high): a prompt that exactly fills its
    pad bucket combined with max_new == _bucket(max_new) leaves ZERO slack
    in the KV cache, and a speculative chunk can commit up to DECODE_CHUNK
    tokens past max_new before the host stops it — without DECODE_CHUNK
    headroom the verify window's dynamic_update_slice clamps and corrupts
    the newest valid KV, breaking the greedy exactness contract."""
    from raglite_tpu.models.decoder import _bucket

    # Byte tokenizer: 1 token per byte + BOS.  63 bytes -> 64 ids == bucket.
    prompt = ("ab cd. " * 9 + "ab cd.")[:63]
    ids_len = len(llm.tokenizer.encode(prompt)) + 1  # + BOS
    assert _bucket(ids_len) == ids_len, "prompt must exactly fill its bucket"
    for max_new in (64, 128):
        assert _bucket(max_new) == max_new
        plain = _tokens(
            llm, prompt, speculate=False, monkeypatch=monkeypatch, max_new=max_new
        )
        spec = _tokens(
            llm, prompt, speculate=True, monkeypatch=monkeypatch, max_new=max_new
        )
        assert spec == plain


def test_speculate_chunk_freezes_at_kv_capacity(llm, monkeypatch):
    """Defense-in-depth: even with an undersized cache (no headroom), the
    device loop must freeze rows before their verify window could overflow
    the KV buffer — generation truncates, it never corrupts."""
    import jax
    import jax.numpy as jnp

    from raglite_tpu.models.decoder import SPEC_DRAFT_LEN
    from raglite_tpu.models.speculative import speculate_chunk_device

    tok = llm.tokenizer
    ids = [tok.BOS, *tok.encode("xy. xy. xy. xy.")]
    kv_cap = len(ids) + SPEC_DRAFT_LEN  # < one full window of free space
    cache = llm.model.init_cache(1, kv_cap)
    import numpy as _np

    batch = _np.full((1, len(ids)), tok.PAD, _np.int32)
    batch[0] = ids
    from raglite_tpu.models.decoder import _prefill_last

    last, cache = _prefill_last(
        llm.model, llm.params, jnp.asarray(batch), cache,
        jnp.asarray([len(ids)], jnp.int32),
    )
    hist = _np.full((1, kv_cap), tok.PAD, _np.int32)
    hist[0, : len(ids)] = ids
    out, _, cache_lens, *_ = speculate_chunk_device(
        llm.model, cache, llm.params,
        jnp.asarray([len(ids)], jnp.int32), last,
        jnp.full((1,), -1, jnp.int32),
        jnp.zeros((llm.cfg["vocab"],), jnp.float32),
        jnp.zeros((1,), bool), llm._stop_ids_device(),
        jax.random.PRNGKey(0), jnp.asarray(hist),
        jnp.asarray([len(ids)], jnp.int32),
        num_tokens=32, draft_len=SPEC_DRAFT_LEN, pad_id=int(tok.PAD),
        temperature=0.0, top_p=1.0, top_k=0, min_p=0.0,
    )
    # The row was frozen immediately: no KV writes past capacity, no tokens.
    assert int(cache_lens[0]) == len(ids)
    assert (_np.asarray(out) == -1).all()


def test_spec_draft_len_validation():
    """RAGLITE_TPU_SPEC_K >= DECODE_CHUNK must fail loudly at import, not
    silently produce empty generations (round-4 advisor, low)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c", "import raglite_tpu.models.decoder"],
        env={"RAGLITE_TPU_SPEC_K": "32", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "RAGLITE_TPU_SPEC_K" in proc.stderr


def test_ngram_draft_clamped_slice_is_masked():
    """Regression (round-4 advisor, low): when the match continuation runs
    off the END of the history buffer, dynamic_slice clamps the start — the
    validity mask must follow the clamped start so shifted tokens can't
    pass as aligned drafts."""
    import jax.numpy as jnp

    # h=10 full buffer; bigram (7, 8) matches at j=6 -> start=8, but
    # draft_len=4 forces the slice to clamp to start_c=6.
    h = np.asarray([0, 1, 2, 3, 4, 5, 7, 8, 6, 7], np.int32)
    drafts = np.asarray(
        _ngram_draft(jnp.asarray(h), jnp.asarray(10), jnp.asarray(8), 4, 0)
    )
    # Slot 0 must be pad: the aligned continuation token is hist[8]=6, and
    # the clamped slice puts hist[6]=7 there — a misaligned token that the
    # pre-fix mask marked valid.
    assert drafts[0] == 0
    assert drafts[1] == 0


def test_ngram_draft_never_reads_uncommitted_history():
    import jax.numpy as jnp

    # A bigram match whose continuation would run past the committed
    # length: the overhang must be pad, not stale buffer contents.
    h = np.full(16, 99, np.int32)  # poison the uncommitted region
    committed = [1, 2, 3, 1, 2]
    h[: len(committed)] = committed
    # suffix (1, 2) + t=3?  committed suffix is (1,2); t=3 gives trigram
    # (1,2,3) matching j=0, draft starts at 3 -> [1, 2, pad].
    drafts = np.asarray(
        _ngram_draft(jnp.asarray(h), jnp.asarray(len(committed)), jnp.asarray(3), 3, 0)
    )
    assert drafts.tolist() == [1, 2, 0]
