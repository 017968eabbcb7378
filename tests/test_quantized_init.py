"""Layer-streaming int8 random init must be bit-identical to quantizing a
full bf16 init (same PRNG schedule, same per-channel scales).

The streaming path exists so the 4B `large` preset can be born straight
into the int8 decode layout: a full bf16 init (8.1 GB) plus its int8 copy
cannot co-reside with a search-index shard on a 16 GB v5e chip
(bench.py large_generation section measures the co-residency).
"""

import numpy as np

from raglite_tpu.models.decoder import (
    init_decoder_params,
    init_decoder_params_quantized,
    quantize_decoder_params,
)

CFG = dict(layers=3, d_model=128, heads=4, kv_heads=2, d_ff=256, vocab=512, max_len=256)


def test_streaming_quantized_init_matches_full_quantize() -> None:
    full = quantize_decoder_params(init_decoder_params(CFG, seed=7))
    streamed = init_decoder_params_quantized(CFG, seed=7)
    np.testing.assert_array_equal(
        np.asarray(full["tok_emb"]), np.asarray(streamed["tok_emb"])
    )
    for name in ("lm_head",):
        np.testing.assert_array_equal(
            np.asarray(full[name].q8), np.asarray(streamed[name].q8)
        )
        np.testing.assert_array_equal(
            np.asarray(full[name].s8), np.asarray(streamed[name].s8)
        )
        assert full[name].n_out == streamed[name].n_out
    assert len(full["layers"]) == len(streamed["layers"])
    for lf, ls in zip(full["layers"], streamed["layers"]):
        assert set(lf) == set(ls)
        for key in ("wqkv", "wo", "w_gate_up", "w_down"):
            np.testing.assert_array_equal(np.asarray(lf[key].q8), np.asarray(ls[key].q8))
            np.testing.assert_array_equal(np.asarray(lf[key].s8), np.asarray(ls[key].s8))
        assert lf["wqkv"].n_outs == ls["wqkv"].n_outs
        assert lf["w_gate_up"].n_outs == ls["w_gate_up"].n_outs
        np.testing.assert_array_equal(
            np.asarray(lf["attn_norm"]), np.asarray(ls["attn_norm"])
        )


def test_quantized_preset_spec_uses_streaming_init() -> None:
    """`JaxChatLLM('<preset>@int8')` must produce the quantized layout
    without ever holding a second full-precision copy (regression for the
    double-quantize guard in __init__)."""
    from raglite_tpu.models.decoder import JaxChatLLM
    from raglite_tpu.ops.quant_matmul import QuantLinear

    llm = JaxChatLLM("tiny@int8")
    assert isinstance(llm.params["lm_head"], QuantLinear)
    assert "wqkv" in llm.params["layers"][0]
    out = llm.complete(
        [{"role": "user", "content": "hello"}], temperature=0.0, max_tokens=4
    )
    assert isinstance(out.content, str)
