"""Benchmark: the SHIPPED vector-search engine on one TPU chip.

Round 1 benched an inline reimplementation of the query pipeline; this
version drives the production code itself: ``DenseIndex.search_chunks`` —
adapter matmul + fused distance matmul + sub-vector top-k + on-device
multi-vector group-max + final chunk ranking (raglite_tpu/index/dense.py),
the exact engine ``raglite_tpu.vector_search_batch`` calls — at the
per-chip shard size of the 10M-chunk / v5e-8 target (1.25M sub-vectors x
1024 dims, int8 with per-row dequant scales).

The index is built with ``DenseIndex.from_device_arrays`` from data
generated ON DEVICE: the dev-tunnel host->device link runs ~15 MB/s, so a
1.3 GB host upload would measure the tunnel, not the engine (on production
hosts the one-time upload rides PCIe).

Timing method (tunnel-honest):
- Throughput: ``iters`` batches of ``search_chunks_device`` dispatched
  back-to-back (the pipelined-serving pattern; every op of the public
  method minus the final host fetch), synced once by fetching one element.
- p50/p95 latency: percentiles over serialized on-device CHAINS of the
  fused B=1 production program (32 data-dependent dispatches per sample,
  one sync each, interleaved pure-RPC median subtracted) — per-call timing
  through the ~30 ms dev tunnel both hides and inflates true latency.
  The B=1 routing is the int4 two-stage scan when enabled (the default).
- recall@10: chunk-level agreement of the production routing vs the exact
  top-k routing on the same index, for BOTH the large-batch program and
  the small-batch (latency) routing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def gen_bench(args, rpc_floor: float) -> dict:
    """Generation-side performance of the shipped decoder (VERDICT r3
    task #2): prefill tokens/s, decode tokens/s at B=1 and B=8 through the
    production on-device chunked decode loop, and MFU.

    Weights are random-init at the given preset size (perf only; HF-parity
    is tested separately).  Decode chunks are data-dependent through the KV
    cache, so M dispatched chunks serialize on device and one sync times
    them all — the same tunnel-honest method as the search latency chain.
    MFU counts matmul FLOPs 2*P_mat*tokens (P_mat = params minus the input
    embedding) plus dense attention over the padded cache 4*L*S*H*hd, at
    197 TFLOP/s bf16 peak for v5e.
    """
    import jax
    import jax.numpy as jnp

    from raglite_tpu.models.decoder import (
        DECODE_CHUNK,
        JaxChatLLM,
        _decode_chunk_device,
        _prefill_last,
    )

    llm = JaxChatLLM(args.gen_preset)
    model, params, cfg = llm.model, llm.params, llm.cfg
    p_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    p_mat = p_total - int(np.prod(params["tok_emb"].shape))
    T = min(args.gen_prompt, cfg["max_len"] - 512)
    n_decode_chunks = args.gen_chunks
    peak = 197e12 if "v5" in str(jax.devices()[0]).lower() else None
    stops = jnp.full((8,), -7, jnp.int32)  # never matched: fixed-length runs
    mask = jnp.zeros((cfg["vocab"],), jnp.float32)
    out: dict = {"preset": args.gen_preset, "params_m": round(p_total / 1e6, 1),
                 "prompt_tokens": T, "decode_chunk": DECODE_CHUNK}

    def sync(x):
        return np.asarray(x.ravel()[0])

    # B=1/8 decode at the full prompt length is the latency story; B=32/64
    # at chat-serving prompt lengths is the THROUGHPUT story (VERDICT r4
    # #7: B=1 is HBM-roofline-bound by weight streaming, so MFU only climbs
    # with batch — the serving regime a TPU decode engine differentiates in).
    for B in (1, 8, 32, 64):
        Tb = T if B <= 8 else min(T, 256)
        S = Tb + 512
        ids = jnp.ones((B, Tb), jnp.int32)
        lens = jnp.full((B,), Tb, jnp.int32)
        cache0 = model.init_cache(B, S)
        last, cache = _prefill_last(model, params, ids, cache0, lens)  # compile
        sync(last)
        reps = 4
        t0 = time.perf_counter()
        outs = [_prefill_last(model, params, ids, cache0, lens)[0] for _ in range(reps)]
        sync(outs[-1])
        prefill_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
        out[f"prefill_tok_s_b{B}"] = round(reps * B * Tb / prefill_s, 1)
        if Tb != T:
            out[f"prompt_tokens_b{B}"] = Tb
        # Prefill FLOPs: matmuls + causal attention (T^2/2 useful positions).
        attn_prefill = 4 * cfg["layers"] * (Tb * Tb / 2) * cfg["heads"] * (
            cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
        )
        flops_prefill = 2 * p_mat * Tb + attn_prefill
        if peak:
            out[f"mfu_prefill_b{B}"] = round(reps * B * flops_prefill / prefill_s / peak, 3)
        # Decode: chained chunks (each depends on the previous cache).
        key = jax.random.PRNGKey(0)
        done = jnp.zeros((B,), bool)
        state = (cache, lens, last, done, key)

        def chunk(state):
            cache, lens, last, done, key = state
            toks, cache, lens, last, done, key = _decode_chunk_device(
                model, cache, params, lens, last, mask, done, stops, key,
                num_steps=DECODE_CHUNK, temperature=0.0, top_p=1.0, top_k=0,
                min_p=0.0,
            )
            return toks, (cache, lens, last, done, key)
        toks, state = chunk(state)  # compile
        sync(toks)
        t0 = time.perf_counter()
        for _ in range(n_decode_chunks):
            toks, state = chunk(state)
        sync(toks)
        decode_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
        n_tok = n_decode_chunks * DECODE_CHUNK
        out[f"decode_tok_s_b{B}"] = round(n_tok * B / decode_s, 1)
        hd = cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
        flops_decode = 2 * p_mat + 4 * cfg["layers"] * S * cfg["heads"] * hd
        if peak:
            out[f"mfu_decode_b{B}"] = round(n_tok * B * flops_decode / decode_s / peak, 4)

    # Continuous batching (VERDICT r4 #7): B=32 serving slots, per-request
    # completion lengths ~ Exp(192) in [32, 480]; a finished slot is refilled
    # by prefilling a fresh prompt into its row of the live cache (one [1, T]
    # forward + per-layer row writes) while the other 31 slots keep decoding.
    # Reports useful (committed-request) tok/s including refill overhead —
    # the aggregate-throughput number a serving deployment sees, vs the
    # fixed-batch decode rows above.
    try:
        B, Tp = 32, 256
        S = Tp + 512
        ids = jnp.ones((B, Tp), jnp.int32)
        lens = jnp.full((B,), Tp, jnp.int32)
        last, cache = _prefill_last(model, params, ids, model.init_cache(B, S), lens)
        one_ids = jnp.ones((1, Tp), jnp.int32)
        one_lens = jnp.full((1,), Tp, jnp.int32)
        one_cache0 = model.init_cache(1, S)

        @jax.jit
        def slot_refill(cache, lens, last, done, slot, one_k, one_v, one_last):
            k = [
                jax.lax.dynamic_update_slice(big, row, (slot, 0, 0, 0))
                for big, row in zip(cache["k"], one_k)
            ]
            v = [
                jax.lax.dynamic_update_slice(big, row, (slot, 0, 0, 0))
                for big, row in zip(cache["v"], one_v)
            ]
            lens = lens.at[slot].set(Tp)
            last = last.at[slot].set(one_last[0])
            done = done.at[slot].set(False)
            return {"k": k, "v": v}, lens, last, done

        def cb_chunk(state):
            cache, lens, last, done, key = state
            toks, cache, lens, last, done, key = _decode_chunk_device(
                model, cache, params, lens, last, mask, done, stops, key,
                num_steps=DECODE_CHUNK, temperature=0.0, top_p=1.0, top_k=0,
                min_p=0.0,
            )
            return toks, (cache, lens, last, done, key)

        state = (cache, lens, last, jnp.zeros((B,), bool), jax.random.PRNGKey(1))
        toks, state = cb_chunk(state)  # compile at this (B, S)
        one_last, one_cache = _prefill_last(model, params, one_ids, one_cache0, one_lens)
        cache, lens, last, done, key = state
        cache, lens, last, done = slot_refill(  # compile the refill
            cache, lens, last, done, jnp.asarray(0, jnp.int32),
            one_cache["k"], one_cache["v"], one_last,
        )
        state = (cache, lens, last, done, key)
        sync(last)
        rng = np.random.default_rng(0)
        targets = rng.exponential(192, B).clip(32, 480).astype(int)
        emitted = np.zeros(B, np.int64)
        useful = 0
        refills = 0
        n_cb_chunks = max(n_decode_chunks * 3, 12)
        t0 = time.perf_counter()
        for _ in range(n_cb_chunks):
            toks, state = cb_chunk(state)
            emitted += DECODE_CHUNK
            finished = np.flatnonzero(emitted >= targets)
            for b in finished:
                useful += int(targets[b])
                one_last, one_cache = _prefill_last(
                    model, params, one_ids, one_cache0, one_lens
                )
                cache, lens, last, done, key = state
                cache, lens, last, done = slot_refill(
                    cache, lens, last, done, jnp.asarray(int(b), jnp.int32),
                    one_cache["k"], one_cache["v"], one_last,
                )
                state = (cache, lens, last, done, key)
                emitted[b] = 0
                targets[b] = int(min(max(rng.exponential(192), 32.0), 480.0))
                refills += 1
        sync(state[2])
        cb_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
        useful += int(np.minimum(emitted, targets).sum())  # in-flight progress
        out["cb_useful_tok_s_b32"] = round(useful / cb_s, 1)
        out["cb_total_tok_s_b32"] = round(n_cb_chunks * DECODE_CHUNK * B / cb_s, 1)
        out["cb_refills"] = refills
        out["cb_chunks"] = n_cb_chunks
        del cache, lens, last, done, state, toks, one_cache, one_last
    except Exception as e:  # noqa: BLE001 — fixed-batch numbers still report
        out["cb_error"] = f"{type(e).__name__}: {e}"[:200]

    # Prompt-lookup speculative decode at B=1 (models/speculative.py): each
    # verify forward costs one weight-streaming pass but commits 1 + accepted
    # tokens.  Greedy decode from a random-init model collapses into
    # repetition, so history n-grams hit — measuring the accepted-draft
    # regime RAG answers live in (copied spans); the accept rate is reported
    # so the number can't be mistaken for unconditional speedup.
    if not getattr(args, "no_spec", False):
        try:
            from raglite_tpu.models.speculative import speculate_chunk_device
            from raglite_tpu.models.decoder import SPEC_DRAFT_LEN, _NO_TOKEN

            B, S = 1, T + 512
            ids = jnp.ones((B, T), jnp.int32)
            lens = jnp.full((B,), T, jnp.int32)
            last, cache = _prefill_last(
                model, params, ids, model.init_cache(B, S), lens
            )
            sync(last)
            hist = jnp.ones((1, S), jnp.int32)
            state = (
                cache, lens, last, jnp.full((1,), -1, jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0), hist,
                jnp.full((1,), T, jnp.int32),
            )

            def spec_chunk(state):
                cache, lens, last, rej, done, key, hist, hl = state
                toks, cache, lens, last, rej, done, key, hist, hl, it = (
                    speculate_chunk_device(
                        model, cache, params, lens, last, rej, mask, done,
                        stops, key, hist, hl, num_tokens=DECODE_CHUNK,
                        draft_len=SPEC_DRAFT_LEN, pad_id=0, temperature=0.0,
                        top_p=1.0, top_k=0, min_p=0.0,
                    )
                )
                return toks, it, (cache, lens, last, rej, done, key, hist, hl)

            toks, it, state = spec_chunk(state)  # compile (+ n-gram warmup)
            sync(toks)
            outs = []
            t0 = time.perf_counter()
            for _ in range(n_decode_chunks):
                toks, it, state = spec_chunk(state)
                outs.append((toks, it))
            sync(toks)
            spec_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
            n_tok = sum(int(np.sum(np.asarray(t) != _NO_TOKEN)) for t, _ in outs)
            n_iter = sum(int(i) for _, i in outs)
            out["spec_decode_tok_s_b1"] = round(n_tok / spec_s, 1)
            out["spec_tokens_per_forward"] = round(n_tok / max(n_iter, 1), 2)
            base = out.get("decode_tok_s_b1")
            if base:
                out["spec_decode_speedup_b1"] = round(
                    out["spec_decode_tok_s_b1"] / base, 2
                )
            # Cross-numerics bit-exactness A/B (ADVICE r3 / VERDICT r4 #3):
            # speculative verify forwards (T=K+1) now run the small-T verify
            # kernel reproducing the plain T=1 decode kernel's per-position
            # math (ops/decode_attention.py:gqa_verify_attention) — this
            # validates the greedy token-for-token guarantee on the real
            # chip through the production generate path, and quantifies any
            # residual divergence instead of reporting only a boolean.
            import os as _os

            _prev_spec = _os.environ.get("RAGLITE_TPU_SPECULATE")
            try:
                prompt = [{"role": "user", "content": "List the laws of motion."}]
                _os.environ["RAGLITE_TPU_SPECULATE"] = "always"
                spec_text = llm.complete(prompt, temperature=0.0, max_tokens=160).content
                _os.environ["RAGLITE_TPU_SPECULATE"] = "0"
                plain_text = llm.complete(prompt, temperature=0.0, max_tokens=160).content
                out["spec_bitexact_vs_plain_greedy"] = spec_text == plain_text
                if spec_text != plain_text:
                    a, b = spec_text or "", plain_text or ""
                    common = next(
                        (i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                        min(len(a), len(b)),
                    )
                    out["spec_vs_plain_common_prefix_frac"] = round(
                        common / max(len(b), 1), 3
                    )
            finally:
                if _prev_spec is None:
                    _os.environ.pop("RAGLITE_TPU_SPECULATE", None)
                else:
                    _os.environ["RAGLITE_TPU_SPECULATE"] = _prev_spec
        except Exception as e:  # noqa: BLE001 — plain numbers must still report
            out["spec_error"] = f"{type(e).__name__}: {e}"[:200]

    # int8 (W8A8) quantized decode through the same production loop — the
    # counterpart of the reference's quantized-GGUF llama.cpp decode.  The
    # full-precision buffers are dropped first: two base-preset models plus
    # B=8 KV caches approach the HBM budget alongside the search index.
    if not getattr(args, "no_int8_gen", False):
        # Release every full-precision buffer still referenced (the CB and
        # spec sections may or may not have left these bound — rebinding to
        # None drops whatever is live without NameError either way).
        llm = model = params = state = cache = last = toks = None
        del llm, model, params, state, cache, last, toks
        try:
            qllm = JaxChatLLM(args.gen_preset + "@int8")
            qmodel, qparams = qllm.model, qllm.params
            for B in (1, 8):
                S = T + 512
                ids = jnp.ones((B, T), jnp.int32)
                lens = jnp.full((B,), T, jnp.int32)
                last, cache = _prefill_last(
                    qmodel, qparams, ids, qmodel.init_cache(B, S), lens
                )
                sync(last)
                key = jax.random.PRNGKey(0)
                done = jnp.zeros((B,), bool)
                state = (cache, lens, last, done, key)

                def qchunk(state):
                    cache, lens, last, done, key = state
                    toks, cache, lens, last, done, key = _decode_chunk_device(
                        qmodel, cache, qparams, lens, last, mask, done, stops,
                        key, num_steps=DECODE_CHUNK, temperature=0.0,
                        top_p=1.0, top_k=0, min_p=0.0,
                    )
                    return toks, (cache, lens, last, done, key)

                toks, state = qchunk(state)  # compile
                sync(toks)
                t0 = time.perf_counter()
                for _ in range(n_decode_chunks):
                    toks, state = qchunk(state)
                sync(toks)
                decode_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
                n_tok = n_decode_chunks * DECODE_CHUNK
                out[f"int8_decode_tok_s_b{B}"] = round(n_tok * B / decode_s, 1)
                base = out.get(f"decode_tok_s_b{B}")
                if base:
                    out[f"int8_decode_speedup_b{B}"] = round(
                        out[f"int8_decode_tok_s_b{B}"] / base, 2
                    )
        except Exception as e:  # noqa: BLE001 — fp numbers must still report
            out["int8_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def large_gen_bench(args, rpc_floor: float, warm_only: bool = False) -> dict:
    """4B-class generation (VERDICT r4 task #5): the decode stack at the
    reference's default-LLM scale (Qwen3-4B-class GGUF, _config.py:50-64),
    where model weights and the search index must CO-RESIDE in one v5e
    chip's 16 GB HBM.  Runs int8 (W8A8) decode, the Pallas GQA decode
    kernel, and prompt-lookup speculative decode at B=1 with a 2048-token
    prompt, while the 1.25M x 1024 int8 index built by main() is still
    live.  Weights are random-init streamed straight into the int8 layout
    (init_decoder_params_quantized) — a full bf16 init would not fit
    alongside the index.  HBM accounting comes from device memory_stats
    when the runtime exposes them, plus static byte counts either way.
    """
    import jax
    import jax.numpy as jnp

    from raglite_tpu.models.decoder import (
        _DECODE_KERNEL_VMEM_BYTES,
        DECODE_CHUNK,
        JaxChatLLM,
        _decode_chunk_device,
        _prefill_last,
    )

    def sync(x):
        return np.asarray(x.ravel()[0])

    def mem_stats():
        try:
            s = jax.local_devices()[0].memory_stats() or {}
            return {k: int(s[k]) for k in ("bytes_in_use", "peak_bytes_in_use")
                    if k in s}
        except Exception:  # noqa: BLE001 — axon tunnel may not expose stats
            return {}

    out: dict = {"preset": args.large_preset, "hbm_before": mem_stats()}
    llm = JaxChatLLM(args.large_preset + "@int8")
    model, params, cfg = llm.model, llm.params, llm.cfg
    leaves = jax.tree.leaves(params)
    p_total = sum(int(np.prod(x.shape)) for x in leaves)
    weight_bytes = sum(int(x.size) * x.dtype.itemsize for x in leaves)
    out["params_b"] = round(p_total / 1e9, 2)
    out["weight_gb_int8"] = round(weight_bytes / 2**30, 2)
    T = min(args.gen_prompt, cfg["max_len"] - 512)
    S = T + 512
    B = 1
    hd = cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
    kv_bytes = 2 * cfg["layers"] * B * cfg["kv_heads"] * hd * S * 2
    out["prompt_tokens"] = T
    out["kv_cache_gb_b1"] = round(kv_bytes / 2**30, 3)
    # The Pallas decode kernel streams one KV group's [hd, S] slices through
    # VMEM; its residency gate is what routes this cache size to the kernel.
    out["pallas_decode_kernel"] = bool(
        model.use_pallas_decode
        and 4 * hd * S * 2 <= _DECODE_KERNEL_VMEM_BYTES
    )

    stops = jnp.full((8,), -7, jnp.int32)
    mask = jnp.zeros((cfg["vocab"],), jnp.float32)
    ids = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    cache0 = model.init_cache(B, S)
    last, cache = _prefill_last(model, params, ids, cache0, lens)  # compile
    sync(last)
    key = jax.random.PRNGKey(0)
    done = jnp.zeros((B,), bool)
    state = (cache, lens, last, done, key)

    def chunk(state):
        cache, lens, last, done, key = state
        toks, cache, lens, last, done, key = _decode_chunk_device(
            model, cache, params, lens, last, mask, done, stops, key,
            num_steps=DECODE_CHUNK, temperature=0.0, top_p=1.0, top_k=0,
            min_p=0.0,
        )
        return toks, (cache, lens, last, done, key)

    toks, state = chunk(state)  # compile
    sync(toks)
    if warm_only:
        return out
    # Prefill (int8 weights, Pallas prefill attention): timed over reps.
    reps = 3
    t0 = time.perf_counter()
    outs = [_prefill_last(model, params, ids, cache0, lens)[0] for _ in range(reps)]
    sync(outs[-1])
    prefill_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
    out["prefill_tok_s_b1"] = round(reps * T / prefill_s, 1)
    # Decode: chained chunks, one sync (the tunnel-honest method).
    n_chunks = args.gen_chunks
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        toks, state = chunk(state)
    sync(toks)
    decode_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
    n_tok = n_chunks * DECODE_CHUNK
    out["int8_decode_tok_s_b1"] = round(n_tok / decode_s, 1)
    # Weight-streaming roofline: every decoded token reads the int8 weights
    # plus the live KV prefix once; v5e HBM peak is 819 GB/s.
    step_bytes = weight_bytes + 2 * cfg["layers"] * cfg["kv_heads"] * hd * T * 2
    out["int8_decode_roofline_frac"] = round(
        (n_tok / decode_s) * step_bytes / 819e9, 3
    )
    del state, cache, cache0, last, toks, outs

    # Prompt-lookup speculative decode on the same model (greedy).
    if not getattr(args, "no_spec", False):
        try:
            from raglite_tpu.models.decoder import SPEC_DRAFT_LEN, _NO_TOKEN
            from raglite_tpu.models.speculative import speculate_chunk_device

            last, cache = _prefill_last(
                model, params, ids, model.init_cache(B, S), lens
            )
            sync(last)
            hist = jnp.ones((1, S), jnp.int32)
            state = (
                cache, lens, last, jnp.full((1,), -1, jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0), hist,
                jnp.full((1,), T, jnp.int32),
            )

            def spec_chunk(state):
                cache, lens, last, rej, done, key, hist, hl = state
                toks, cache, lens, last, rej, done, key, hist, hl, it = (
                    speculate_chunk_device(
                        model, cache, params, lens, last, rej, mask, done,
                        stops, key, hist, hl, num_tokens=DECODE_CHUNK,
                        draft_len=SPEC_DRAFT_LEN, pad_id=0, temperature=0.0,
                        top_p=1.0, top_k=0, min_p=0.0,
                    )
                )
                return toks, it, (cache, lens, last, rej, done, key, hist, hl)

            toks, it, state = spec_chunk(state)  # compile
            sync(toks)
            outs = []
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                toks, it, state = spec_chunk(state)
                outs.append((toks, it))
            sync(toks)
            spec_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
            n_tok = sum(int(np.sum(np.asarray(t) != _NO_TOKEN)) for t, _ in outs)
            n_iter = sum(int(i) for _, i in outs)
            out["spec_decode_tok_s_b1"] = round(n_tok / spec_s, 1)
            out["spec_tokens_per_forward"] = round(n_tok / max(n_iter, 1), 2)
            if out.get("int8_decode_tok_s_b1"):
                out["spec_speedup_vs_int8"] = round(
                    out["spec_decode_tok_s_b1"] / out["int8_decode_tok_s_b1"], 2
                )
            del state, cache, last, toks, outs
        except Exception as e:  # noqa: BLE001
            out["spec_error"] = f"{type(e).__name__}: {e}"[:200]

    out["hbm_after"] = mem_stats()
    return out


def hybrid_bench(  # noqa: PLR0915
    args, index, adapter, queries, rpc_floor: float, warm_only: bool = False
) -> dict:
    """Hybrid + filtered search at the shard scale (VERDICT r4 tasks #1/#3).

    Drives the production FUSED hybrid pipeline (search._hybrid_fused_batch's
    device chain): fused dense scan -> resident BM25 -> device weighted RRF
    (ops/rrf.py), ONE packed [2, B, k] fetch per batch.  The keyword side is
    a real KeywordIndex over a synthetic zipf corpus at n_chunks = rows/2.
    Latency is measured with serialized on-device chains of the B=1 fused
    hybrid program (same method as the dense path — the r3 host-RRF bench
    could only report a clamped `max(x - 2*rpc, 0) = 0.0`).  The filtered
    number is the dense scan with a ~5%-selectivity metadata row mask.
    """
    import jax

    from raglite_tpu.index.keyword import KeywordIndex
    from raglite_tpu.ops.rrf import rrf_fuse_topk
    from raglite_tpu.search import reciprocal_rank_fusion

    n_chunks = args.rows // 2
    rng = np.random.default_rng(0)
    vocab = 30_000
    terms = rng.zipf(1.3, size=(n_chunks, 12)).astype(np.int64) % vocab
    kw = KeywordIndex()
    t0 = time.perf_counter()
    for i in range(n_chunks):
        kw._add_chunk(f"c{i}", " ".join(f"w{t}" for t in terms[i]))
    build_s = time.perf_counter() - t0
    out: dict = {
        "n_chunks": n_chunks,
        "postings_build_s": round(build_s, 1),
        "postings_backend": "native" if kw._native is not None else "python",
    }

    def sync(x):
        return np.asarray(x.ravel()[0])

    bq = min(256, args.batch)
    # Query terms come from the INFORMATIVE tail (rank >= 200), like real
    # keyword queries: the zipf head terms appear in a large fraction of
    # all chunks, and OR-gathering their postings measures stopword
    # scanning (measured 1 QPS at shard scale), not retrieval.
    query_texts = [
        " ".join(
            f"w{200 + (t % (vocab - 200))}"
            for t in rng.zipf(1.3, size=4).astype(np.int64)
        )
        for _ in range(bq)
    ]
    # Queries live on device: in production they come straight off the
    # encoder (vector_search embeds on device), so per-call host->device
    # query uploads are a dev-tunnel artifact (~27 ms blocking RPC per MB),
    # not part of the scan being measured.
    import jax.numpy as jnp

    dense_q = jnp.asarray(np.asarray(queries[:bq]), dtype=jnp.float32)
    k_side = 2 * args.num_results  # per-side depth: hybrid oversample=2
    term_ids = kw.resident_prepare(query_texts)
    assert term_ids is not None, "resident postings must serve the bench queries"
    kw_mask, masked = kw.resident_device_mask(None)

    def hybrid_fused(q, tids):
        """The production fused chain: three device programs, zero fetches."""
        dense_packed = index.search_chunks_device(
            q, num_hits=args.num_hits, num_results=k_side, adapter=adapter
        )
        kw_packed = kw.resident_block_device(
            tids, num_hits=k_side, mask=kw_mask, masked=masked
        )
        return rrf_fuse_topk(
            dense_packed, kw_packed, num_chunks=n_chunks,
            num_results=args.num_results,
        )

    fused_dev = hybrid_fused(dense_q, term_ids)  # warm/compile
    sync(fused_dev)

    # Correctness: the device fusion must equal the host RRF oracle over the
    # PRODUCTION per-side results (same check tests/test_hybrid_fused.py pins
    # on CPU, here on the real chip at shard scale).  r4 shipped a
    # methodology bug here: the oracle's keyword side was the exact
    # host-gather `search_batch` while the fused path consumes the resident
    # (LCAP-truncated, approx_max_k) device BM25 — on this tie-heavy zipf
    # corpus the two select different same-score candidates, so all 32
    # samples "mismatched" while the fusion itself was correct.  The oracle
    # now fuses the device's own per-side candidate lists (what the RRF
    # kernel actually sees); the exact-vs-resident keyword gap is measured
    # separately below as an approximation cost, not a fusion error.
    fused_np = np.asarray(hybrid_fused(dense_q, term_ids))
    fused_ords = np.ascontiguousarray(fused_np[1]).view(np.int32)
    dense_np = np.asarray(
        index.search_chunks_device(
            dense_q, num_hits=args.num_hits, num_results=k_side, adapter=adapter
        )
    )
    kw_packed_np = np.asarray(
        kw.resident_block_device(term_ids, num_hits=k_side, mask=kw_mask, masked=masked)
    )
    kw_ord_np = np.ascontiguousarray(kw_packed_np[1]).view(np.int32)
    rrf_mismatch = 0
    for i in range(min(32, bq)):
        v_ids = [f"c{int(o)}" for o in dense_np[1][i] if o >= 0]
        # approx_max_k winners are unordered; production sorts them on
        # device by (score desc, ordinal asc) and drops invalid slots.
        ks, ko = kw_packed_np[0][i], kw_ord_np[i]
        order = np.lexsort((ko, -ks))
        k_ids = [
            f"c{int(ko[j])}" for j in order if ks[j] > 0.0 and ko[j] < n_chunks
        ]
        want, _ = reciprocal_rank_fusion([v_ids, k_ids], weights=[0.75, 0.25])
        got = [f"c{int(o)}" for o in fused_ords[i] if o >= 0]
        if got != want[: args.num_results]:
            rrf_mismatch += 1
    out["device_rrf_mismatches_of_32"] = rrf_mismatch
    # Resident-BM25 approximation cost: how much the LCAP-truncated
    # approx_max_k keyword side changes the FUSED top-k membership vs fusing
    # with the exact host-gather BM25 ranking.  This is the documented,
    # deliberate approximation (impact-ordered pruning), reported as a
    # measured recall-style overlap rather than folded into "mismatches".
    kw_exact = kw.search_batch(query_texts[: min(32, bq)], num_hits=k_side)
    overlaps = []
    for i in range(min(32, bq)):
        v_ids = [f"c{int(o)}" for o in dense_np[1][i] if o >= 0]
        want_exact, _ = reciprocal_rank_fusion(
            [v_ids, kw_exact[i][0]], weights=[0.75, 0.25]
        )
        got = {f"c{int(o)}" for o in fused_ords[i] if o >= 0}
        exact_set = set(want_exact[: args.num_results])
        overlaps.append(
            len(got & exact_set) / max(len(exact_set), 1) if exact_set else 1.0
        )
    out["resident_bm25_fused_topk_overlap_vs_exact"] = round(
        float(np.mean(overlaps)), 4
    )

    # B=1 fused-hybrid latency: serialized on-device chains (the dense
    # latency method, bench.py header) — call k+1's dense query is derived
    # from call k's fused output, so the three-program hybrid pipeline
    # serializes on device and one sync times CHAIN_K full hybrid queries.
    CHAIN_K, CHAIN_M = 16, 8
    perturb = jax.jit(lambda q, p: q + p[0, 0, 0] * 1e-30)
    q1 = dense_q[:1]
    tid1 = term_ids[:1]

    def hybrid_chain(q):
        fused = None
        for _ in range(CHAIN_K):
            fused = hybrid_fused(q, tid1)
            q = perturb(q1, fused)
        return fused

    sync(hybrid_chain(q1))  # warm/compile the B=1 shapes
    if warm_only:
        return out
    chain_ms, rpc_inter = [], []
    for _ in range(CHAIN_M):
        t0 = time.perf_counter()
        sync(jnp.zeros((1,), jnp.float32))
        rpc_inter.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(hybrid_chain(q1))
        chain_ms.append((time.perf_counter() - t0) * 1e3)
    rpc_ms = float(np.median(rpc_inter)) * 1e3
    per_call = (np.asarray(chain_ms) - rpc_ms) / CHAIN_K
    out["hybrid_p50_ms"] = round(float(np.percentile(per_call, 50)), 3)
    out["hybrid_p95_ms"] = round(float(np.percentile(per_call, 95)), 3)
    out["hybrid_p50_raw_ms"] = round(
        float(np.percentile(np.asarray(chain_ms) / CHAIN_K, 50)), 3
    )
    out["hybrid_latency_method"] = (
        "serialized on-device chains of the B=1 fused hybrid program "
        f"({CHAIN_K} data-dependent dispatches per sample, one sync each, "
        "interleaved RPC baseline subtracted; raw = no subtraction)"
    )

    # Throughput: pipelined fused batches, ONE host fetch per batch (we sync
    # only the last — the per-batch fetch is overlapped in serving).
    reps = max(args.iters // 2, 4)
    t0 = time.perf_counter()
    outs = [hybrid_fused(dense_q, term_ids) for _ in range(reps)]
    sync(outs[-1])
    hybrid_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
    out["hybrid_qps"] = round(reps * bq / hybrid_s, 1)
    out["hybrid_fetches_per_batch"] = 1
    out["hybrid_batch"] = bq
    # Filtered dense scan: ~5%-selectivity chunk mask -> row mask.  The
    # mask is uploaded ONCE via the index's digest-cached device_row_mask
    # (the production path for a repeated session filter); re-uploading the
    # 1.25 MB host mask per call measured the dev tunnel's blocking
    # device_put (~9k QPS), not the scan.
    chunk_mask = rng.random(n_chunks) < 0.05
    row_mask = index.device_row_mask(chunk_mask[np.asarray(index.row_chunk)])
    all_q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
    packed = index.search_chunks_device(
        all_q, num_hits=args.num_hits,
        num_results=args.num_results, row_mask=row_mask, adapter=adapter,
    )
    sync(packed)  # warm
    t0 = time.perf_counter()
    outs = [
        index.search_chunks_device(
            all_q, num_hits=args.num_hits,
            num_results=args.num_results, row_mask=row_mask, adapter=adapter,
        )
        for _ in range(max(args.iters // 2, 2))
    ]
    sync(outs[-1])
    filtered_s = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
    out["filtered_qps"] = round(len(outs) * len(queries) / filtered_s, 1)
    out["filter_selectivity"] = 0.05
    # Correctness spot check: every filtered hit satisfies the mask.
    ords = np.asarray(packed)[1]
    valid_hits = ords[ords >= 0]
    assert chunk_mask[valid_hits.astype(np.int64)].all()
    return out


def rerank_bench(args, rpc_floor: float) -> dict:
    """Fused token-MaxSim rerank latency through the PRODUCTION encoder
    (search._rank_with_token_maxsim's device path — the number VERDICT r4
    flagged as claimed-but-unmeasured): 32 chunk-length candidates, cold
    (query+candidate encode + score) and warm (device token-state cache
    hits: query encode + score only)."""
    import time

    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.models.encoder import encoder_from_config

    config = RAGLiteConfig(store_path=":memory:")
    enc = encoder_from_config(config)
    if not hasattr(enc, "rerank_maxsim"):
        return {"skipped": f"default embedder {config.embedder} lacks fused rerank"}
    rng = np.random.default_rng(7)
    words = (
        "relativity simultaneity inertia electrodynamics observer velocity "
        "coordinate transformation magnetic field charge conductor motion "
        "light signal clock synchronous measuring rod length frame axis "
        "stationary system kinematics electromotive force energy radiation"
    ).split()
    cands = [" ".join(rng.choice(words, size=220)) for _ in range(32)]
    queries = [
        f"how does {rng.choice(words)} relate to {rng.choice(words)}"
        for _ in range(12)
    ]
    out: dict = {"candidates": len(cands), "embedder": config.embedder}
    enc.rerank_maxsim("warm the rerank programs please", cands)  # compile
    cold_ms, warm_ms = [], []
    for i, q in enumerate(queries):
        if i < 4:  # cold: every candidate re-encodes
            enc._rerank_cache.clear()
        t0 = time.perf_counter()
        enc.rerank_maxsim(q, cands)
        (cold_ms if i < 4 else warm_ms).append((time.perf_counter() - t0) * 1e3)
    out["rerank_cold_p50_ms_32"] = round(float(np.percentile(cold_ms, 50)), 1)
    out["rerank_warm_p50_ms_32"] = round(float(np.percentile(warm_ms, 50)), 1)
    out["rerank_warm_p50_minus_rpc_ms_32"] = round(
        max(float(np.percentile(warm_ms, 50)) - rpc_floor * 1e3, 0.0), 1
    )
    out["latency_method"] = (
        "wall-clock per rerank_maxsim call (host tokenize + uploads + "
        "dispatches + scores fetch); warm = candidate token states cached "
        "on device, so the call runs query encode + MaxSim score only; "
        "minus-rpc subtracts one tunnel RTT"
    )
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1_249_280)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--num-hits", type=int, default=40)
    parser.add_argument("--num-results", type=int, default=10)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--latency-reps", type=int, default=50)
    parser.add_argument("--dtype", choices=("int8", "bfloat16"), default="int8")
    parser.add_argument(
        "--pallas", choices=("auto", "on", "off"), default="auto",
        help="small-batch Pallas routing: auto follows the production config default",
    )
    parser.add_argument(
        "--warm-all-only", action="store_true",
        help="(internal) compile+run EVERY program the bench uses once to "
        "populate the persistent cache, then exit",
    )
    parser.add_argument(
        "--no-int4", action="store_true",
        help="disable the int4 two-stage routing (fallback when its fresh "
        "compile hangs on the remote compile service)",
    )
    parser.add_argument(
        "--chain-warm-timeout", type=float, default=900.0,
        help="seconds to allow fresh compiles in a bounded subprocess "
        "before degrading (no-int4 routing, then per-call latency)",
    )
    parser.add_argument("--no-gen", action="store_true",
                        help="skip the generation (decoder) section")
    parser.add_argument("--no-int8-gen", action="store_true",
                        help="skip the int8 (W8A8) decode A/B in the "
                        "generation section")
    parser.add_argument("--no-spec", action="store_true",
                        help="skip the speculative-decode measurement in "
                        "the generation section")
    parser.add_argument("--gen-preset", default="auto",
                        help="decoder preset: auto = base on TPU, tiny on CPU")
    parser.add_argument("--large-preset", default="auto",
                        help="4B-class section preset: auto = large on TPU, "
                        "skipped on CPU (pass a preset name to force)")
    parser.add_argument("--no-large-gen", action="store_true",
                        help="skip the 4B-class generation section")
    parser.add_argument("--gen-prompt", type=int, default=2048)
    parser.add_argument("--gen-chunks", type=int, default=6)
    parser.add_argument("--no-hybrid", action="store_true",
                        help="skip the hybrid/filtered search section")
    parser.add_argument("--no-rerank", action="store_true",
                        help="skip the fused token-MaxSim rerank section")
    parser.add_argument("--cpu", action="store_true",
                        help="pin JAX to CPU (smoke runs; the shell env var "
                        "is ignored when the TPU plugin is installed)")
    args = parser.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        # The env var alone is NOT honored when a TPU platform plugin
        # auto-registers at import (measured: a --cpu run landed on the
        # tunnel chip and contended with a concurrent TPU bench); the
        # config update is what actually pins the backend.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    # Persistent compilation cache: repeated bench runs (and the driver's
    # round-end run) skip XLA compiles entirely.
    from pathlib import Path

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.index.dense import DenseIndex

    if args.pallas == "auto":
        use_pallas = RAGLiteConfig(store_path=":memory:").use_pallas
    else:
        use_pallas = args.pallas == "on"
    if args.gen_preset == "auto":
        args.gen_preset = "base" if jax.default_backend() == "tpu" else "tiny"
    if args.large_preset == "auto":
        if jax.default_backend() == "tpu":
            args.large_preset = "large"
        else:
            args.no_large_gen = True  # an 8 GB random init has no CPU smoke
    if jax.default_backend() != "tpu":
        args.gen_prompt = min(args.gen_prompt, 256)  # CPU smoke stays fast

    n, d, b = args.rows, args.dim, args.batch
    key = jax.random.PRNGKey(0)
    k_rows, k_q, k_adapter = jax.random.split(key, 3)
    if args.dtype == "int8":
        rows = jax.random.randint(k_rows, (n, d), -127, 128, dtype=jnp.int8)
        row_scale = jax.random.uniform(k_rows, (n,), jnp.float32, 0.005, 0.01)
    else:
        rows = jax.random.normal(k_rows, (n, d), dtype=jnp.bfloat16)
        row_scale = None
    row_chunk = jnp.arange(n, dtype=jnp.int32) // 2  # 2 sub-vectors per chunk
    index = DenseIndex.from_device_arrays(
        rows, row_chunk, row_scale=row_scale, metric="cosine", use_pallas=use_pallas
    )
    if args.no_int4:
        index.use_int4_stage1 = False
    queries = jax.random.normal(k_q, (b, d), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    adapter = jax.random.normal(k_adapter, (d, d), dtype=jnp.float32) / np.sqrt(d)
    queries, adapter = jax.block_until_ready((queries, adapter))

    def run_device(q, exact=None):
        return index.search_chunks_device(
            q, num_hits=args.num_hits, num_results=args.num_results,
            adapter=adapter, exact=exact,
        )

    def sync(x):
        return np.asarray(x.ravel()[0])

    q1 = queries[:1]

    # B=1 device latency, tunnel-immune: each sample DISPATCHES CHAIN_K
    # data-dependent calls of the production B=1 routing (search_chunks's
    # fused program), where call k+1's query is derived from call k's device
    # output — the dependency serializes execution on device while the
    # async dispatches pipeline through the tunnel — and syncs once, so
    # per-query time = (chain - rpc) / K cannot hide inside the tunnel's
    # one-way trip (a naive per-call measurement reads ~0.5 ms here because
    # compute shorter than RTT/2 overlaps the fetch).  K must be long enough
    # that client dispatch overhead fully overlaps device execution:
    # measured on v5e, per-query converges at K>=32 (1.88 ms) and is
    # under/over-estimated at K=8/16.  Percentiles are over CHAIN_M
    # independent chain samples.  Crucially this reuses the already-cached
    # production program: no fresh monolithic compile (the remote compile
    # service repeatedly dropped a scan-wrapped variant after ~27 min).
    CHAIN_K, CHAIN_M = 32, max(args.latency_reps // 5, 6)
    perturb = jax.jit(lambda q, p: q + p[0, 0, 0] * 1e-30)

    def latency_chain(q):
        packed = None
        for _ in range(CHAIN_K):
            packed = index.search_chunks_device(
                q, num_hits=args.num_hits, num_results=args.num_results,
                adapter=adapter,
            )
            # Value-dependent (always-zero) perturbation chains the calls.
            q = perturb(q1, packed)
        return packed

    if args.warm_all_only:
        # Populate the persistent compile cache with EVERY program the bench
        # dispatches (large-batch approx + exact, B=32 and B=1 small-batch
        # routing, the latency chain, the perturbation op, the generation
        # prefill/decode programs) and exit.  The main process runs this
        # under a bounded subprocess first, so no in-process compile can
        # hang the driver's bench run.
        sync(run_device(queries))
        sync(run_device(queries, exact=True))
        sync(run_device(queries[:32]))
        sync(latency_chain(q1))
        if not args.no_hybrid:
            hybrid_bench(args, index, adapter, queries, 0.0, warm_only=True)
        if not args.no_rerank:
            rerank_bench(args, 0.0)
        if not args.no_gen:
            gen_bench(args, 0.0)
        if not args.no_large_gen:
            large_gen_bench(args, 0.0, warm_only=True)
        print("warm ok")  # noqa: T201
        return

    # Bound EVERY fresh compile in a subprocess sharing the persistent
    # cache (the dev tunnel's remote compile service intermittently hangs
    # for 30+ minutes on big fresh programs; a driver bench run must never
    # do that).  If the warm fails, retry without the int4 routing (its
    # Pallas program is the most likely fresh compile), and only then fall
    # through to unbounded in-process compiles as a last resort.
    import os
    import subprocess
    import sys

    def warm_subprocess(extra: list[str], timeout: float | None = None) -> bool:
        cmd = [
            sys.executable, str(Path(__file__).resolve()), "--warm-all-only",
            "--rows", str(args.rows), "--dim", str(args.dim),
            "--batch", str(args.batch), "--num-hits", str(args.num_hits),
            "--num-results", str(args.num_results), "--dtype", args.dtype,
            "--pallas", args.pallas,
            "--gen-preset", args.gen_preset, "--gen-prompt", str(args.gen_prompt),
            "--gen-chunks", str(args.gen_chunks),
            *(["--no-gen"] if args.no_gen else []),
            *(["--no-int8-gen"] if args.no_int8_gen else []),
            *(["--no-spec"] if args.no_spec else []),
            *(["--no-hybrid"] if args.no_hybrid else []),
            *(["--no-rerank"] if args.no_rerank else []),
            "--large-preset", args.large_preset,
            *(["--no-large-gen"] if args.no_large_gen else []),
            *(["--cpu"] if args.cpu else []),
            *extra,
        ]
        env = dict(os.environ)
        if jax.default_backend() == "cpu":  # keep smoke runs off the tunnel
            env["JAX_PLATFORMS"] = "cpu"
        try:
            subprocess.run(
                cmd, timeout=timeout or args.chain_warm_timeout, check=True,
                capture_output=True, env=env,
            )
        except (subprocess.SubprocessError, OSError):
            return False
        return True

    # STAGED warms, each its own bounded subprocess sharing the persistent
    # cache.  One monolithic warm let the 4B large-model compiles (the
    # slowest fresh programs) eat the whole timeout and spuriously degrade
    # the SEARCH latency path to no-int4 (measured: p50 2.2 ms instead of
    # ~1 ms).  Stage A decides the search routing alone; later stages only
    # gate their own sections.
    warm_failures: list[str] = []
    search_only = ["--no-gen", "--no-hybrid", "--no-rerank", "--no-large-gen"]
    chain_warm = warm_subprocess(
        search_only + (["--no-int4"] if args.no_int4 else [])
    )
    if not chain_warm and not args.no_int4:
        # The int4 Pallas compile may be the hang: degrade to the XLA-only
        # routing (the round-1 production path) and warm that instead.
        index.use_int4_stage1 = False
        args.no_int4 = True
        chain_warm = warm_subprocess(search_only + ["--no-int4"])
    int4_flag = ["--no-int4"] if args.no_int4 else []
    if not (args.no_gen and args.no_hybrid):  # stage B: hybrid + base gen
        if not warm_subprocess(["--no-large-gen", *int4_flag]):
            # Sections still run (last-resort in-process compiles over a
            # now-partial cache), but the failure is reported.
            warm_failures.append("hybrid+gen")
    if not args.no_large_gen:  # stage C: the 4B-class programs
        if not warm_subprocess(
            int4_flag, timeout=max(args.chain_warm_timeout, 1500.0)
        ):
            # The large section is the one we never run with unbounded
            # in-process compiles: skip it rather than risk a driver hang.
            args.no_large_gen = True
            warm_failures.append("large_gen (section skipped)")

    # Warm up / compile both batch shapes (cache hits after the subprocess;
    # sync via transfer: block_until_ready does not synchronize through the
    # dev tunnel).
    sync(run_device(queries))
    warm1 = index.search_chunks(
        q1, num_hits=args.num_hits, num_results=args.num_results, adapter=adapter
    )
    assert np.isfinite(warm1[0]).all()

    # Tunnel RPC floor: median cost of fetching one element of an
    # already-computed array (pure round-trip, no compute).
    tiny = jax.block_until_ready(jnp.zeros((1,), jnp.float32))
    rpc_samples = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(tiny[0])
        rpc_samples.append(time.perf_counter() - t0)
    rpc_floor = float(np.median(rpc_samples))

    # Chunk-level recall@num_results: production routing vs exact top-k.
    approx = np.asarray(run_device(queries))[1]
    exact_res = np.asarray(run_device(queries, exact=True))[1]
    hits = [
        len(set(approx[i]) & set(exact_res[i])) / exact_res.shape[1]
        for i in range(min(64, b))
    ]
    recall = float(np.mean(hits))
    # Same for the SMALL-BATCH routing (the latency path — int4 two-stage
    # when enabled), which differs from the large-batch program.
    m = min(64, b)
    small = np.concatenate(
        [np.asarray(run_device(queries[i : min(i + 32, m)]))[1] for i in range(0, m, 32)]
    )
    hits_small = [
        len(set(small[i]) & set(exact_res[i])) / exact_res.shape[1] for i in range(m)
    ]
    recall_small = float(np.mean(hits_small))

    # Pipelined throughput through the shipped device pipeline.
    t0 = time.perf_counter()
    outs = [run_device(queries) for _ in range(args.iters)]
    sync(outs[-1])
    elapsed = max(time.perf_counter() - t0 - rpc_floor, 1e-6)
    qps = args.iters * b / elapsed

    latency_method = (
        "percentiles over serialized on-device chains of the fused B=1 "
        f"production program ({CHAIN_K} data-dependent dispatches per "
        "sample, one sync each, interleaved RPC baseline subtracted)"
    )
    try:
        if not chain_warm:
            msg = "chain program did not compile within the warm timeout"
            raise RuntimeError(msg)
        sync(latency_chain(q1))  # cache hit after the subprocess warm
        chain_ms = []
        rpc_inter = []
        for _ in range(CHAIN_M):
            t0 = time.perf_counter()
            np.asarray(tiny[0])
            rpc_inter.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(latency_chain(q1))
            chain_ms.append((time.perf_counter() - t0) * 1e3)
        rpc_ms = float(np.median(rpc_inter)) * 1e3
        per_query_ms = (np.asarray(chain_ms) - rpc_ms) / CHAIN_K
        p50_ms = float(np.percentile(per_query_ms, 50))
        p95_ms = float(np.percentile(per_query_ms, 95))
        # Raw mode (VERDICT r3 task #10): the same chains WITHOUT the RPC
        # subtraction — an upper bound that needs no tunnel correction, so
        # the correction method can be cross-checked on any host.
        per_query_raw = np.asarray(chain_ms) / CHAIN_K
        p50_raw_ms = float(np.percentile(per_query_raw, 50))
    except Exception:
        # The dev tunnel's remote-compile service intermittently drops big
        # fresh compiles; fall back to per-call timing of the already-warm
        # public method so the bench always reports (method labeled).
        latency_method = (
            "per-call dispatch->fetch of search_chunks minus interleaved "
            "pure-RPC median (chain program unavailable: compile service; "
            "sub-RTT compute may be underestimated through the tunnel)"
        )
        lat, rpc_inter = [], []
        for _ in range(args.latency_reps):
            t0 = time.perf_counter()
            np.asarray(tiny[0])
            rpc_inter.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            index.search_chunks(
                q1, num_hits=args.num_hits, num_results=args.num_results,
                adapter=adapter,
            )
            lat.append((time.perf_counter() - t0) * 1e3)
        rpc_ms = float(np.median(rpc_inter)) * 1e3
        p50_ms = float(np.percentile(lat, 50)) - rpc_ms
        p95_ms = float(np.percentile(lat, 95)) - rpc_ms
        p50_raw_ms = float(np.percentile(lat, 50))

    generation = None
    if not args.no_gen:
        try:
            generation = gen_bench(args, rpc_floor)
        except Exception as e:  # noqa: BLE001 — the search numbers must
            generation = {"error": str(e)[:200]}  # still report
    hybrid = None
    if not args.no_hybrid:
        try:
            hybrid = hybrid_bench(args, index, adapter, queries, rpc_floor)
        except Exception as e:  # noqa: BLE001
            import traceback

            hybrid = {"error": f"{type(e).__name__}: {e}"[:200],
                      "trace": traceback.format_exc()[-400:]}
    rerank = None
    if not args.no_rerank:
        try:
            rerank = rerank_bench(args, rpc_floor)
        except Exception as e:  # noqa: BLE001
            rerank = {"error": f"{type(e).__name__}: {e}"[:200]}
    large_generation = None
    if not args.no_large_gen:
        # Runs LAST and with the int8 index still live: the section's point
        # is the measured co-residency of a 4B-class int8 model with the
        # 10M-chunk/8 shard on one 16 GB chip.
        try:
            large_generation = large_gen_bench(args, rpc_floor)
            # The axon tunnel does not expose device memory_stats; the
            # static accounting below is the fit evidence either way (the
            # section completing at all proves the allocator accepted it).
            idx_bytes = sum(
                int(buf.size) * buf.dtype.itemsize
                for buf in (
                    index._dev_rows, index._dev_sqnorm, index._dev_valid,
                    index._dev_scale, index._dev_row_chunk,
                    index._dev_packed4, index._dev_scale4,
                )
                if buf is not None
            )
            large_generation["index_resident_gb"] = round(idx_bytes / 2**30, 2)
            large_generation["hbm_static_total_gb"] = round(
                (idx_bytes
                 + large_generation["weight_gb_int8"] * 2**30
                 + large_generation["kv_cache_gb_b1"] * 2**30) / 2**30, 2
            )
        except Exception as e:  # noqa: BLE001
            import traceback

            large_generation = {"error": f"{type(e).__name__}: {e}"[:200],
                                "trace": traceback.format_exc()[-400:]}

    print(
        json.dumps(
            {
                "metric": (
                    f"DenseIndex.search_chunks QPS/chip @{n}x{d} {args.dtype} "
                    "(10M-chunk v5e-8 shard, shipped engine)"
                ),
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 5000.0, 3),
                "p50_ms": round(p50_ms, 3),
                "p95_ms": round(p95_ms, 3),
                "p50_raw_ms": round(p50_raw_ms, 3),
                "latency_method": latency_method,
                "tunnel_rpc_ms": round(rpc_ms, 2),
                "recall_at_10": round(recall, 4),
                "recall_at_10_small_batch": round(recall_small, 4),
                "batch": b,
                "num_hits": args.num_hits,
                "pallas_small_batch": bool(
                    use_pallas and jax.default_backend() == "tpu"
                ),
                "int4_two_stage_small_batch": bool(
                    index._use_int4_stage1(1, False)
                ),
                "generation": generation,
                "hybrid": hybrid,
                "rerank": rerank,
                "large_generation": large_generation,
                "warm_failures": warm_failures,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
