"""JAX decoder LLM + JSON-constrained decoding tests.

Reference analogue: tests/test_chatml_function_calling.py (grammar-constrained
tool calling via llama.cpp GBNF) — here the grammar is a first-party JSON
pushdown automaton driving logit masks (models/json_automaton.py).
"""

import json

import pytest

from raglite_tpu.models.json_automaton import JsonAutomaton


def _feed(doc: str) -> JsonAutomaton:
    automaton = JsonAutomaton()
    for byte in doc.encode():
        automaton.feed(byte)
    return automaton


@pytest.mark.parametrize(
    "doc",
    [
        "{}",
        '{"a": 1}',
        '{"a": [1, 2.5e-3, true, false, null, "x\\n\\u00e9"], "b": {"c": []}}',
        '{ "nested" : { "deep" : [ [ ] , [ 0 ] ] } }',
        '{"neg": -0.5, "exp": 1E+10}',
    ],
)
def test_automaton_accepts_valid_json(doc: str) -> None:
    automaton = _feed(doc)
    assert automaton.done() or automaton.can_end()


@pytest.mark.parametrize(
    ("prefix", "bad_byte"),
    [
        ("", ord("]")),  # top level must open an object
        ("{", ord(",")),
        ('{"a"', ord("}")),  # colon required
        ('{"a": 0', ord("1")),  # leading zero forbids more digits
        ('{"a": 1', ord("x")),
        ('{"a": [', ord(",")),
        ('{"a": tru', ord("x")),
    ],
)
def test_automaton_rejects_invalid_bytes(prefix: str, bad_byte: int) -> None:
    automaton = _feed(prefix)
    assert bad_byte not in automaton.allowed_bytes()
    with pytest.raises(ValueError, match="not allowed"):
        automaton.feed(bad_byte)


@pytest.mark.parametrize(
    "prefix",
    ["{", '{"a', '{"a": ', '{"a": [1,', '{"a": 1.', '{"key\\u00', '{"a": tr', '{"a": {"b": [{'],
)
def test_automaton_completion_always_parses(prefix: str) -> None:
    automaton = _feed(prefix)
    completed = prefix + automaton.completion_bytes().decode()
    json.loads(completed)  # must not raise
    assert automaton.can_end()


def test_jax_llm_plain_generation() -> None:
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    response = llm.complete([{"role": "user", "content": "hello"}], max_tokens=8)
    assert response.content is not None


def test_jax_llm_json_constrained_generation() -> None:
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    response = llm.complete(
        [{"role": "user", "content": "emit json"}],
        response_format={"type": "json_object"},
        max_tokens=48,
    )
    parsed = json.loads(response.content)
    assert isinstance(parsed, dict)


def test_jax_llm_streaming_yields_text() -> None:
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    pieces = [p for p in llm.stream([{"role": "user", "content": "hi"}], max_tokens=8) if isinstance(p, str)]
    assert "".join(pieces) is not None


def test_decoder_kv_cache_consistency() -> None:
    """Prefill-then-decode must match a full forward pass (same logits)."""
    import jax.numpy as jnp
    import numpy as np

    from raglite_tpu.models.decoder import DecoderModel, init_decoder_params

    cfg = dict(layers=2, d_model=64, heads=4, kv_heads=2, d_ff=128, vocab=64, max_len=64)
    params = init_decoder_params(cfg, seed=1, dtype=jnp.float32)
    model = DecoderModel(cfg)
    ids = np.array([[5, 9, 17, 3, 42, 7]], dtype=np.int32)

    # Full forward in one shot.
    cache = model.init_cache(1, 16, dtype=jnp.float32)
    full_logits, _ = model.forward(params, jnp.asarray(ids), cache, jnp.asarray(0))

    # Prefill 3 tokens then decode one at a time.
    cache = model.init_cache(1, 16, dtype=jnp.float32)
    _, cache = model.forward(params, jnp.asarray(ids[:, :3]), cache, jnp.asarray(0))
    step_logits = []
    for t in range(3, 6):
        logits, cache = model.forward(params, jnp.asarray(ids[:, t : t + 1]), cache, jnp.asarray(t))
        step_logits.append(np.asarray(logits[0, 0]))

    np.testing.assert_allclose(
        np.asarray(full_logits[0, 3:6]), np.stack(step_logits), rtol=2e-4, atol=2e-4
    )


def test_jax_llm_forced_tool_call_conforms_to_schema() -> None:
    """tool_choice='required' / named forces a schema-valid tool call
    (reference matrix: tests/test_chatml_function_calling.py there)."""
    import json

    from raglite_tpu.models.decoder import JaxChatLLM
    from raglite_tpu.models.llm import ToolCall

    tools = [
        {
            "type": "function",
            "function": {
                "name": "search_knowledge_base",
                "description": "Search the KB.",
                "parameters": {
                    "type": "object",
                    "properties": {"query": {"type": "string"}},
                    "required": ["query"],
                },
            },
        },
        {
            "type": "function",
            "function": {
                "name": "other_tool",
                "parameters": {"type": "object", "properties": {"n": {"type": "integer"}}},
            },
        },
    ]
    llm = JaxChatLLM("tiny")
    for choice in ("required", {"type": "function", "function": {"name": "other_tool"}}):
        response = llm.complete(
            [{"role": "user", "content": "find simultaneity"}],
            tools=tools,
            tool_choice=choice,
            max_tokens=48,
        )
        assert len(response.tool_calls) == 1
        call = response.tool_calls[0]
        assert isinstance(call, ToolCall)
        args = json.loads(call.arguments)
        if call.name == "search_knowledge_base":
            assert set(args) == {"query"} and isinstance(args["query"], str)
        else:
            assert set(args) == {"n"} and isinstance(args["n"], int)
    named = llm.complete(
        [{"role": "user", "content": "x"}],
        tools=tools,
        tool_choice={"type": "function", "function": {"name": "other_tool"}},
        max_tokens=32,
    )
    assert named.tool_calls[0].name == "other_tool"


def test_sampling_controls() -> None:
    """top-k / top-p / min-p / temperature sampling behavior
    (reference sampling defaults: _litellm.py:168-177)."""
    import numpy as np

    from raglite_tpu.models.decoder import JaxChatLLM

    rng = np.random.default_rng(0)
    logits = np.array([5.0, 4.0, 1.0, -2.0, -np.inf], dtype=np.float32)
    # Greedy at temperature 0.
    assert JaxChatLLM._sample_host(
        logits, temperature=0.0, top_p=1.0, top_k=0, min_p=0.0, rng=rng
    ) == 0
    # top_k=1 == greedy even at high temperature.
    for _ in range(5):
        assert JaxChatLLM._sample_host(
            logits, temperature=5.0, top_p=1.0, top_k=1, min_p=0.0, rng=rng
        ) == 0
    # top_p tiny keeps only the top token.
    for _ in range(5):
        assert JaxChatLLM._sample_host(
            logits, temperature=1.0, top_p=1e-6, top_k=0, min_p=0.0, rng=rng
        ) == 0
    # min_p close to 1 keeps only near-max tokens.
    for _ in range(5):
        assert JaxChatLLM._sample_host(
            logits, temperature=1.0, top_p=1.0, top_k=0, min_p=0.99, rng=rng
        ) == 0
    # Unconstrained sampling never picks the -inf token and explores.
    draws = {
        JaxChatLLM._sample_host(
            logits, temperature=2.0, top_p=1.0, top_k=0, min_p=0.0, rng=rng
        )
        for _ in range(200)
    }
    assert 4 not in draws
    assert len(draws) >= 2
    # Streaming accepts the sampling kwargs end-to-end.
    llm = JaxChatLLM("tiny")
    pieces = [
        p for p in llm.stream(
            [{"role": "user", "content": "hi"}],
            max_tokens=8, temperature=0.7, top_p=0.8, top_k=20, min_p=0.05, seed=7,
        )
        if isinstance(p, str)
    ]
    assert isinstance("".join(pieces), str)


def test_tool_choice_none_yields_no_tool_calls() -> None:
    """tool_choice='none' must produce zero tool calls (reference matrix:
    tests/test_chatml_function_calling.py there)."""
    from raglite_tpu.models.decoder import JaxChatLLM
    from raglite_tpu.models.llm import ToolCall

    llm = JaxChatLLM("tiny")
    tools = [{"type": "function", "function": {
        "name": "search_knowledge_base", "parameters": {"type": "object"}}}]
    items = list(
        llm.stream(
            [{"role": "user", "content": "find something"}],
            tools=tools, tool_choice="none", max_tokens=16,
        )
    )
    assert not any(isinstance(i, ToolCall) for i in items)


def test_stream_tool_tag_never_leaks_and_trailing_text_flows() -> None:
    """Round-2 review findings: '<tool_call' chars leaked into the text
    stream, and everything after '</tool_call>' was swallowed."""
    from raglite_tpu.models.decoder import JaxChatLLM
    from raglite_tpu.models.llm import ToolCall

    llm = JaxChatLLM("tiny")
    script = (
        'Before. <tool_call>{"name": "lookup", "arguments": {"q": "x"}}'
        "</tool_call> After the call."
    )

    def fake_decode(tokens):  # 1-char pieces, the worst case for the filter
        yield from script

    llm._decode_stream = fake_decode  # type: ignore[method-assign]
    llm._generate_tokens = lambda *a, **k: iter(())  # type: ignore[method-assign]
    tools = [{"type": "function", "function": {"name": "lookup",
                                               "parameters": {"type": "object"}}}]
    items = list(llm.stream([{"role": "user", "content": "hi"}], tools=tools))
    text = "".join(i for i in items if isinstance(i, str))
    calls = [i for i in items if isinstance(i, ToolCall)]
    assert text == "Before.  After the call."
    assert "<tool_call" not in text and "</tool_call" not in text
    assert len(calls) == 1 and calls[0].name == "lookup"
    # A lone '<' that never becomes a tag must still stream.
    script2 = "a < b and c."
    llm._decode_stream = lambda tokens: iter(script2)  # type: ignore[method-assign]
    items2 = list(llm.stream([{"role": "user", "content": "hi"}], tools=tools))
    assert "".join(i for i in items2 if isinstance(i, str)) == script2


def test_generation_budget_clamped_to_context() -> None:
    """max_tokens >= context_size must not discard the prompt (the old
    negative-slice idiom flipped sign)."""
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")  # context_size 1024
    out = llm.complete(
        [{"role": "user", "content": "hello world"}], max_tokens=4096
    )
    assert out.content is not None  # generated without crashing/empty prompt


def test_nucleus_sampling_keeps_crossing_token() -> None:
    from raglite_tpu.models.decoder import JaxChatLLM
    import numpy as np

    logits = np.log(np.array([0.79, 0.20, 0.01]))
    rng = np.random.default_rng(0)
    picks = {
        JaxChatLLM._sample_host(
            logits, temperature=1.0, top_p=0.8, top_k=0, min_p=0.0, rng=rng
        )
        for _ in range(300)
    }
    assert picks == {0, 1}  # crossing token 1 stays; token 2 is cut


def test_llama3_rope_scaling_applied() -> None:
    from raglite_tpu.models.decoder import compute_inv_freq
    import numpy as np

    base_cfg = dict(d_model=64, heads=4, rope_base=5e5)
    plain = compute_inv_freq(base_cfg)
    scaled = compute_inv_freq({
        **base_cfg,
        "rope_scaling": {
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
        },
    })
    assert scaled.shape == plain.shape
    # Low frequencies (long wavelengths) are divided by the factor; high
    # frequencies are untouched.
    assert np.isclose(scaled[-1], plain[-1] / 8.0, rtol=1e-5)
    assert np.isclose(scaled[0], plain[0], rtol=1e-5)
    linear = compute_inv_freq({**base_cfg, "rope_scaling": {"type": "linear", "factor": 2.0}})
    np.testing.assert_allclose(linear, plain / 2.0, rtol=1e-6)


def test_complete_batch_matches_single_greedy() -> None:
    """Batched decode (per-row cache offsets, different prompt lengths) must
    reproduce per-prompt greedy generation."""
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    batches = [
        [{"role": "user", "content": "short"}],
        [{"role": "user", "content": "a much longer prompt with many more words in it"}],
        [{"role": "user", "content": "mid-size prompt here"}],
    ]
    batched = llm.complete_batch(batches, max_tokens=8, temperature=0.0)
    for messages, got in zip(batches, batched):
        solo = llm.complete(messages, max_tokens=8, temperature=0.0)
        assert got.content == solo.content, (got.content, solo.content)


def test_complete_batch_schema_constrained() -> None:
    """Every row of a schema-constrained batch decodes to valid JSON for the
    schema (independent automatons per row)."""
    import json

    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    schema = {
        "type": "object",
        "properties": {"color": {"enum": ["red", "green"]}, "count": {"type": "integer"}},
        "required": ["color", "count"],
    }
    response_format = {"type": "json_schema", "json_schema": {"name": "x", "schema": schema}}
    out = llm.complete_batch(
        [[{"role": "user", "content": f"document {i}"}] for i in range(4)],
        response_format=response_format,
        max_tokens=48,
        temperature=0.0,
    )
    for r in out:
        payload = json.loads(r.content)
        assert payload["color"] in ("red", "green")
        assert isinstance(payload["count"], int)


def test_expand_document_metadata_batched_first_pass() -> None:
    """expand_document_metadata routes through complete_batch for the jax
    provider and still fills metadata for every document."""
    from typing import Annotated

    from pydantic import Field

    from raglite_tpu import Document, RAGLiteConfig
    from raglite_tpu.extract import expand_document_metadata

    config = RAGLiteConfig(store_path=":memory:", llm="jax:tiny", embedder="hash:256")
    docs = [
        Document.from_text(f"Report {i}: the sky is blue and the grass is green.")
        for i in range(3)
    ]
    fields = {"summary": Annotated[str | None, Field(description="one-line summary")]}
    out = list(expand_document_metadata(docs, fields, config=config))
    assert len(out) == 3  # all documents flow through (metadata may be None-ish)


def test_hf_tokenizer_special_ids_from_config(tmp_path) -> None:
    """EOS/BOS come from the checkpoint's config.json (authoritative), not
    from name guessing — Gemma names its specials <bos>/<eos>, which the
    probe list used to miss, assigning a CONTENT token as EOS so generation
    never stopped (regression)."""
    import json

    from tokenizers import Tokenizer, models

    from raglite_tpu.models.tokenizer import load_tokenizer

    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "hello": 3, "world": 4}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "config.json").write_text(
        json.dumps({"eos_token_id": 1, "bos_token_id": 2, "pad_token_id": 0})
    )
    loaded = load_tokenizer(str(tmp_path / "tokenizer.json"))
    assert (loaded.EOS, loaded.BOS, loaded.PAD) == (1, 2, 0)
    # Without config.json, the probe still finds gemma-style names.
    (tmp_path / "config.json").unlink()
    loaded = load_tokenizer(str(tmp_path / "tokenizer.json"))
    assert (loaded.EOS, loaded.BOS) == (1, 2)
    # Missing tokenizer.json raises by default (silent byte-tokenizer
    # fallback produced gibberish with no error).
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_tokenizer(str(tmp_path / "nope" / "tokenizer.json"))


def test_device_decode_loop_semantics() -> None:
    """The on-device chunked decode loop (DECODE_CHUNK-token dispatches)
    respects max_tokens, stops at stop ids, is deterministic at temperature
    0, and sampled generation stays within the byte-token mask."""
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny")
    messages = [{"role": "user", "content": "write something"}]
    greedy1 = llm.complete(messages, max_tokens=40, temperature=0.0)
    greedy2 = llm.complete(messages, max_tokens=40, temperature=0.0)
    assert greedy1.content == greedy2.content  # deterministic
    # max_tokens larger than one chunk exercises the multi-dispatch path.
    long = llm.complete(messages, max_tokens=100, temperature=0.0)
    assert long.content is not None
    sampled = llm.complete(
        messages, max_tokens=48, temperature=0.9, top_p=0.9, top_k=40, seed=7
    )
    assert sampled.content is not None  # decoded through the byte mask
    # Batched greedy equals single greedy (both through the device loop).
    batch = llm.complete_batch([messages, messages], max_tokens=40, temperature=0.0)
    assert batch[0].content == greedy1.content
    assert batch[1].content == greedy1.content


def test_hf_tokenizer_eos_id_list(tmp_path) -> None:
    """Llama-3-instruct-style configs list SEVERAL eos ids
    ([<|end_of_text|>, <|eot_id|>]); all of them must be preserved so the
    decoder stops on <|eot_id|>, not just on the first entry."""
    import json

    from tokenizers import Tokenizer, models

    from raglite_tpu.models.tokenizer import load_tokenizer

    vocab = {
        "<|begin_of_text|>": 0, "<|end_of_text|>": 1, "<|eot_id|>": 2,
        "hello": 3, "world": 4,
    }
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "config.json").write_text(
        json.dumps({"eos_token_id": [1, 2], "bos_token_id": 0})
    )
    loaded = load_tokenizer(str(tmp_path / "tokenizer.json"))
    assert loaded.EOS == 1
    assert loaded.EOS_IDS == (1, 2)
