"""Prompt-lookup speculative decoding, fully on device.

RAG answers copy heavily from the retrieved contexts sitting in the prompt
(quotes, entity names, citations), and the reference's llama.cpp decode
loop (/root/reference/src/raglite/_chatml_function_calling.py:527-580)
emits those copied spans one weight-streaming forward at a time.  B=1
decode is HBM-bound — every step reads all weights to produce ONE token —
so verifying K drafted tokens in a single (K+1)-token forward costs the
same HBM traffic as emitting one.  Draft tokens come from n-gram matches
against the token history (prompt + generated), so no draft model is
needed and a miss costs nothing: the verify forward still commits at
least one token, degrading to plain decode.

Everything — sampling, n-gram lookup, draft verification, KV bookkeeping,
stop checks — runs inside one jitted `lax.while_loop`, preserving the
one-host-fetch-per-chunk dispatch model of `_decode_chunk_device`
(decoder.py).  Design notes:

- **Lookup**: the longest-suffix match wins — a trigram match (last three
  committed tokens) is preferred over a bigram match; among equal-length
  matches the most recent position wins.  The K tokens following the
  match site become the draft.  All matching is vectorized comparisons
  over the static-shape history array.
- **Verification**: the window ``[t, d_1..d_K]`` runs through the normal
  `DecoderModel.forward` at the current cache offset; absolute-position
  causal masking means stale KV entries from previously rejected drafts
  (they sit at positions >= the committed length) are never attended to,
  and the next window simply overwrites them.
- **Exactness**: with ``temperature == 0`` the emitted sequence is
  bit-identical to plain greedy decode *under the same numerics path* — a
  draft is accepted iff it equals the argmax, and on rejection the next
  iteration's argmax is unchanged by excluding the rejected token.  The
  r4 A/B measured that claim FALSE on v5e when the plain T=1 loop ran the
  Pallas decode-attention kernel while the T=K+1 verify forward took the
  XLA einsum path (different reduction orders flip near-tie argmaxes);
  the small-T verify kernel (ops/decode_attention.py:gqa_verify_attention)
  was added so verify forwards compute the T=1 kernel's exact per-position
  attention math.  ``bench.py`` still A/Bs the full generate path on the
  real chip (``spec_bitexact_vs_plain_greedy``) so the claim stays
  measured, not assumed, per hardware.  With ``temperature > 0`` the standard
  speculative-sampling rule applies: draft d is accepted with probability
  p̃(d) under the filtered (temperature/top-k/top-p/min-p) target
  distribution, and on rejection the next token is drawn from the residual
  p̃ with d's mass removed (carried as ``reject`` into the next
  iteration's sampler), per Leviathan et al.'s acceptance theorem.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NO_TOKEN = -1


def _filtered_probs(logits, *, temperature, top_p, top_k, min_p):
    """The normalized distribution the plain decode loop samples from
    (same temperature/top-k/min-p/top-p semantics as
    decoder._decode_chunk_device's sampler), for acceptance tests."""
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    if min_p and min_p > 0.0:
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        probs = jnp.where(probs >= min_p * pmax, probs, 0.0)
    if top_p and top_p < 1.0:
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
        csum = jnp.cumsum(sorted_probs, axis=-1)
        keep = (csum - sorted_probs) < top_p
        kept_min = jnp.min(
            jnp.where(keep, sorted_probs, jnp.inf), axis=-1, keepdims=True
        )
        probs = jnp.where(probs >= kept_min, probs, 0.0)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def _draw(probs, reject, sub, *, greedy):
    """Sample (or argmax) from ``probs`` with token id ``reject`` excluded.

    Excluding ``reject`` AFTER filtering is the exact residual
    norm(max(p̃ - δ_reject, 0)) of speculative sampling; for greedy it is a
    no-op (a rejected draft was, by definition, not the argmax)."""
    v = probs.shape[-1]
    probs = jnp.where(jnp.arange(v) == reject, 0.0, probs)
    if greedy:
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        sub, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1
    ).astype(jnp.int32)


def _ngram_draft(hist, hist_len, t, draft_len: int, pad_id: int):
    """Draft ``draft_len`` tokens by longest-suffix n-gram lookup.

    The suffix ends at ``t`` (the token just committed, not yet written to
    ``hist``).  Trigram (hist[L-2], hist[L-1], t) matches beat bigram
    (hist[L-1], t) matches; the most recent match site wins; the draft is
    the history slice following the match.  Returns [draft_len] int32
    (``pad_id``-filled when nothing matches — those drafts verify-fail
    naturally, costing nothing)."""
    h = hist.shape[0]
    s0 = hist[jnp.maximum(hist_len - 2, 0)]
    s1 = hist[jnp.maximum(hist_len - 1, 0)]
    j = jnp.arange(h - 2, dtype=jnp.int32)
    # Bigram (s1, t): continuation starts at j+2 and must be committed.
    m2 = (hist[: h - 2] == s1) & (hist[1 : h - 1] == t) & (j + 2 < hist_len)
    # Trigram (s0, s1, t): continuation starts at j+3.
    j3 = jnp.arange(h - 3, dtype=jnp.int32)
    m3 = (
        (hist[: h - 3] == s0)
        & (hist[1 : h - 2] == s1)
        & (hist[2 : h - 1] == t)
        & (j3 + 3 < hist_len)
    )
    has2, has3 = jnp.any(m2), jnp.any(m3)
    best2 = jnp.argmax(jnp.where(m2, j + 1, 0))
    best3 = jnp.argmax(jnp.where(m3, j3 + 1, 0))
    start = jnp.where(has3, best3 + 3, best2 + 2).astype(jnp.int32)
    # dynamic_slice clamps start to h - draft_len when the slice would run
    # off the buffer; mask with the CLAMPED start so the validity indices
    # line up with the tokens actually returned (an unclamped mask could
    # pass shifted tokens as valid near the end of the buffer — outputs
    # stay correct via verification, but accept rate degrades exactly
    # where hist is fullest).
    start_c = jnp.minimum(start, jnp.asarray(h - draft_len, jnp.int32))
    drafts = jax.lax.dynamic_slice(hist, (start_c,), (draft_len,))
    # Draft slots past the committed history are uncommitted garbage: blank
    # them (and the no-match case) to pad, which the verify step rejects.
    idx = start_c + jnp.arange(draft_len, dtype=jnp.int32)
    valid = (has2 | has3) & (idx < hist_len) & (idx >= start)
    return jnp.where(valid, drafts, jnp.asarray(pad_id, jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "model", "num_tokens", "draft_len", "pad_id",
        "temperature", "top_p", "top_k", "min_p",
    ),
    donate_argnums=(1,),
)
def speculate_chunk_device(  # noqa: PLR0913
    model,
    cache,
    params,
    cache_lens,  # [B] int32 — committed tokens whose KV is valid, per row
    last_logits,  # [B, V] fp32 — logits the next token is sampled from
    reject,  # [B] int32 — draft token rejected at this position (-1: none)
    logits_mask,  # [V] fp32 additive mask
    done,  # [B] bool
    stop_ids,  # [Ks] int32 (padded with -7)
    key,
    hist,  # [B, H] int32 — committed token history (prompt + generated)
    hist_len,  # [B] int32
    *,
    num_tokens: int,  # emit up to this many tokens per row, then return
    draft_len: int,
    pad_id: int,
    temperature: float,
    top_p: float,
    top_k: int,
    min_p: float,
):
    """Emit up to ``num_tokens`` tokens PER ROW in one dispatch via
    prompt-lookup speculation.  Rows accept drafts (and finish) at
    different rates: a row whose chunk budget can no longer fit a full
    window freezes — its sampling state (logits/reject) carries unchanged
    into the next chunk — while the rest keep verifying.  Returns
    (out [B, num_tokens] — committed tokens then _NO_TOKEN padding, cache,
    cache_lens, last_logits, reject, done, key, hist, hist_len,
    n_verify_iters)."""
    k = draft_len
    greedy = temperature == 0.0
    cap = num_tokens
    b = last_logits.shape[0]
    rows = jnp.arange(b)

    def probs_of(logits):
        masked = logits + logits_mask
        if greedy:
            # One-hot argmax distribution keeps a single code path.
            return jax.nn.one_hot(jnp.argmax(masked, -1), masked.shape[-1])
        return _filtered_probs(
            masked, temperature=temperature, top_p=top_p, top_k=top_k, min_p=min_p
        )

    # KV capacity (== hist capacity, both sized max_total by the caller): a
    # row whose next verify window could run past the cache buffer freezes
    # exactly like a budget-capped row, so the window's KV writes can never
    # clamp onto valid recent entries.  The caller allocates DECODE_CHUNK
    # headroom, so this guard only fires on misconfigured capacities.
    kv_cap = hist.shape[1]

    def active_rows(out_len, cache_lens, done):
        return ~done & (out_len + k + 1 <= cap) & (cache_lens + k + 1 <= kv_cap)

    def cond(carry):
        it, _, cache_lens, _, _, _, out_len, done, _, _, _ = carry
        return (it < cap) & jnp.any(active_rows(out_len, cache_lens, done))

    def body(carry):
        it, cache, cache_lens, logits, reject, out, out_len, done, key, hist, hl = carry
        active = active_rows(out_len, cache_lens, done)
        key, sub_t, sub_acc = jax.random.split(key, 3)
        # 1. Commit one token per row (with the residual exclusion).
        t = jax.vmap(lambda p, r, s: _draw(p, r, s, greedy=greedy))(
            probs_of(logits), reject, jax.random.split(sub_t, b)
        )
        # 2. Draft K continuation tokens per row from its history.
        drafts = jax.vmap(
            lambda h, l, tt: _ngram_draft(h, l, tt, k, pad_id)
        )(hist, hl, t)
        window = jnp.concatenate([t[:, None], drafts], axis=1)  # [B, K+1]
        # 3. Verify: one forward over every row's window at its offset.
        #    Frozen/done rows still flow through (same program shape); their
        #    KV writes land at their unadvanced offsets and are overwritten
        #    when they resume — the same convention as the plain chunk loop.
        wlogits, cache = model.forward(
            params, jnp.where(active[:, None], window, 0), cache, cache_lens
        )
        probs = probs_of(wlogits)  # [B, K+1, V]
        # 4. Longest accepted prefix per row.
        p_draft = jnp.take_along_axis(probs[:, :k, :], drafts[:, :, None], 2)[..., 0]
        if greedy:
            acc = p_draft > 0.5  # one-hot: draft == argmax
        else:
            acc = jax.random.uniform(sub_acc, (b, k)) < p_draft
        acc_cum = jnp.cumprod(acc.astype(jnp.int32), axis=1).astype(bool)
        a = jnp.sum(acc_cum, axis=1, dtype=jnp.int32)  # [B] accepted drafts
        # 5. Emission: t plus accepted drafts, truncated at the first stop.
        em = window  # [B, K+1]
        ok = jnp.concatenate([jnp.ones((b, 1), bool), acc_cum], axis=1)
        is_stop = jnp.any(em[:, :, None] == stop_ids[None, None, :], axis=2) & ok
        stopped = jnp.cumsum(is_stop.astype(jnp.int32), axis=1) > 0  # inclusive
        emit = ok & ~stopped & active[:, None]
        done_next = done | (jnp.any(is_stop, axis=1) & active)
        n_emit = jnp.sum(emit, axis=1, dtype=jnp.int32)
        slot = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
        # Non-emitted window tokens dump into the scratch slot at index
        # `cap` (out is [B, cap+1]; the host reads out[:, :cap]).
        pos = jnp.where(emit, out_len[:, None] + slot, cap)
        out = out.at[rows[:, None], pos].set(jnp.where(emit, em, _NO_TOKEN))
        hist_pos = jnp.where(emit, hl[:, None] + slot, hist.shape[1] - 1)
        hist = hist.at[rows[:, None], hist_pos].set(
            jnp.where(emit, em, hist[:, -1:])
        )
        # 6. Carry: KV is now valid for t and the accepted drafts; the next
        #    iteration samples after the last committed token — row `a` of
        #    the window logits — excluding the rejected draft's mass.
        advance = jnp.where(done_next | ~active, 0, 1 + a)
        cache_lens = cache_lens + advance.astype(cache_lens.dtype)
        next_logits = jnp.where(active[:, None], wlogits[rows, a, :], logits)
        next_reject = jnp.where(
            active,
            jnp.where(
                a < k,
                drafts[rows, jnp.minimum(a, k - 1)],
                jnp.asarray(-1, jnp.int32),
            ),
            reject,
        )
        return (
            it + 1, cache, cache_lens, next_logits, next_reject,
            out, out_len + n_emit, done_next, key, hist, hl + n_emit,
        )

    out0 = jnp.full((b, cap + 1), _NO_TOKEN, jnp.int32)
    carry = (
        jnp.asarray(0, jnp.int32), cache, cache_lens, last_logits, reject,
        out0, jnp.zeros((b,), jnp.int32), done, key, hist, hist_len,
    )
    it, cache, cache_lens, last_logits, reject, out, _, done, key, hist, hist_len = (
        jax.lax.while_loop(cond, body, carry)
    )
    return (
        out[:, :cap], cache, cache_lens, last_logits, reject, done, key,
        hist, hist_len, it,
    )
