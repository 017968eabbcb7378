"""int8 quantized matmul: oracles, routing, and the @int8 decoder path.

The reference's decode hot loop runs llama.cpp's quantized GEMV
(/root/reference/src/raglite/_chatml_function_calling.py:527-580); our
analogue is ops/quant_matmul.py (W8A8 native int8 dot on decode rows,
W8A16 dequant on prefill — the measured lowering comparison is in that
module's docstring).  These tests pin (a) quantization error bounds,
(b) both matmul paths against integer-exact oracles, and (c) that a
quantized JaxChatLLM still generates, batches, and stays close to the
full-precision model on a tiny model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raglite_tpu.models.decoder import JaxChatLLM, quantize_decoder_params
from raglite_tpu.ops.quant_matmul import (
    QuantLinear,
    QuantLinearFused,
    int8_matmul_w8a8,
    int8_matmul_xla,
    quant_linear_apply,
    quant_linear_apply_fused,
    quantize_linear_int8,
    quantize_rows_int8,
)


def _pad_rows(x, kp):
    x = np.asarray(x, np.float64)
    return np.pad(x, ((0, 0), (0, kp - x.shape[1])))


def test_quantization_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(96, 200)).astype(np.float32) * 0.1
    ql = QuantLinear.from_dense(jnp.asarray(w))
    wd = np.asarray(ql.dense(jnp.float32))
    # symmetric per-channel: error <= scale/2 = absmax/254 per element
    bound = np.abs(w).max(axis=0) / 254.0 + 1e-8
    assert (np.abs(wd - w) <= bound[None, :]).all()
    # padding: K to 32, N to 128
    assert ql.q8.shape == (96, 256)
    assert ql.n_out == 200


@pytest.mark.parametrize(("m", "k", "n"), [(1, 128, 256), (8, 300, 500), (3, 32, 128)])
def test_w8a16_matches_integer_oracle(m, k, n):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    x = rng.normal(size=(m, k)).astype(np.float32)
    wq = quantize_linear_int8(w)
    o = (
        _pad_rows(x, wq["q8"].shape[0])
        @ np.asarray(wq["q8"], np.float64)
        * np.asarray(wq["s8"], np.float64)
    )[:, :n]
    y = np.asarray(int8_matmul_xla(jnp.asarray(x), wq["q8"], wq["s8"]))[:, :n]
    np.testing.assert_allclose(y, o, atol=2e-4)


@pytest.mark.parametrize(("m", "k", "n"), [(1, 128, 256), (8, 300, 500)])
def test_w8a8_matches_integer_oracle(m, k, n):
    """W8A8 is exact once both operands are quantized: int32 accumulation
    has no rounding, so replaying the same row/channel quantization on the
    host in integer arithmetic must reproduce the device result."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    x = rng.normal(size=(m, k)).astype(np.float32)
    wq = quantize_linear_int8(w)
    y = np.asarray(int8_matmul_w8a8(jnp.asarray(x), wq["q8"], wq["s8"]))[:, :n]
    xq, sx = quantize_rows_int8(jnp.asarray(np.pad(x, ((0, 0), (0, wq["q8"].shape[0] - k)))))
    acc = np.asarray(xq, np.int64) @ np.asarray(wq["q8"], np.int64)
    o = (acc.astype(np.float64) * np.asarray(sx, np.float64) * np.asarray(wq["s8"], np.float64))[:, :n]
    np.testing.assert_allclose(y, o, rtol=1e-6, atol=1e-6)
    # and the quantized product approximates the real one
    real = x @ w
    scale = np.abs(real).max() + 1e-9
    assert np.abs(y - real).max() / scale < 0.03


def test_w8a8_activation_quant_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 64)) * 3.0, jnp.float32)
    xq, sx = quantize_rows_int8(x)
    back = np.asarray(xq, np.float32) * np.asarray(sx)
    bound = np.abs(np.asarray(x)).max(axis=1, keepdims=True) / 254.0 + 1e-8
    assert (np.abs(back - np.asarray(x)) <= bound).all()
    # zero rows quantize safely
    xq0, sx0 = quantize_rows_int8(jnp.zeros((2, 8)))
    assert np.all(np.asarray(xq0) == 0) and np.all(np.asarray(sx0) == 1.0)


def test_quant_linear_apply_routes_and_reshapes(monkeypatch):
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.1, jnp.float32)
    ql = QuantLinear.from_dense(w)
    x3 = jnp.asarray(rng.normal(size=(2, 5, 64)), jnp.float32)
    o = np.einsum("btk,kn->btn", np.asarray(x3), np.asarray(ql.dense(jnp.float32)))
    for mode, tol in (("0", 2e-4), ("1", 0.05)):
        monkeypatch.setenv("RAGLITE_TPU_W8A8", mode)
        y = quant_linear_apply(x3, ql)
        assert y.shape == (2, 5, 96)
        assert y.dtype == x3.dtype
        np.testing.assert_allclose(np.asarray(y), o, atol=tol * max(1.0, np.abs(o).max()))


def test_quant_linear_is_pytree():
    w = jnp.ones((32, 128), jnp.float32)
    ql = QuantLinear.from_dense(w)
    leaves, treedef = jax.tree_util.tree_flatten(ql)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.n_out == 128
    # round-trips through jit as an argument
    y = jax.jit(lambda x, q: quant_linear_apply(x, q))(jnp.ones((2, 32)), ql)
    assert y.shape == (2, 128)


def test_quantize_decoder_params_structure():
    llm = JaxChatLLM("tiny")
    qp = quantize_decoder_params(llm.params)
    assert isinstance(qp["lm_head"], QuantLinear)
    for layer, fp_layer in zip(qp["layers"], llm.params["layers"]):
        assert isinstance(layer["wqkv"], QuantLinearFused)
        assert isinstance(layer["w_gate_up"], QuantLinearFused)
        assert isinstance(layer["wo"], QuantLinear)
        assert isinstance(layer["w_down"], QuantLinear)
        for k in ("wq", "wk", "wv", "w_gate", "w_up"):
            assert k not in layer  # replaced by the fused weights
        assert not isinstance(layer["attn_norm"], QuantLinear)
        # fused widths = the concatenated per-weight widths
        assert layer["wqkv"].n_outs == tuple(
            fp_layer[k].shape[1] for k in ("wq", "wk", "wv")
        )
    assert qp["tok_emb"] is llm.params["tok_emb"]


def test_fused_apply_matches_separate():
    rng = np.random.default_rng(5)
    ws = [jnp.asarray(rng.normal(size=(64, n)) * 0.1, jnp.float32) for n in (96, 32, 32)]
    fused = QuantLinearFused.from_dense(ws)
    x = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
    outs = quant_linear_apply_fused(x, fused)
    assert tuple(o.shape[1] for o in outs) == (96, 32, 32)
    for o, w in zip(outs, ws):
        # per-output-channel scales => fused quantization == separate
        sep = quant_linear_apply(x, QuantLinear.from_dense(w))
        np.testing.assert_allclose(np.asarray(o), np.asarray(sep), atol=1e-5)


def test_quantized_tiny_generates():
    q = JaxChatLLM("tiny@int8", seed=7)
    assert q.quantized
    msgs = [{"role": "user", "content": "Say something."}]
    text = q.complete(msgs, temperature=0.0, max_new_tokens=24).content
    assert isinstance(text, str)


def test_quantized_prefill_logits_close():
    fp = JaxChatLLM("tiny", seed=7)
    q = JaxChatLLM("tiny@int8", seed=7)
    ids = jnp.asarray([[5, 9, 250, 37, 101, 42, 77, 3]], jnp.int32)
    lf, _ = fp.model.forward(fp.params, ids, fp.model.init_cache(1, 64), jnp.asarray(0, jnp.int32))
    lq, _ = q.model.forward(q.params, ids, q.model.init_cache(1, 64), jnp.asarray(0, jnp.int32))
    lf, lq = np.asarray(lf), np.asarray(lq)
    denom = np.abs(lf).max() + 1e-6
    assert np.abs(lf - lq).max() / denom < 0.08, np.abs(lf - lq).max() / denom


def test_quantized_forward_w8a8_forced_close(monkeypatch):
    """The decode-regime W8A8 path (forced on CPU via the env override)
    stays close to the full-precision forward on a tiny model."""
    monkeypatch.setenv("RAGLITE_TPU_W8A8", "1")
    fp = JaxChatLLM("tiny", seed=7)
    q = JaxChatLLM("tiny@int8", seed=7)
    ids = jnp.asarray([[5, 9, 250, 37, 101, 42, 77, 3]], jnp.int32)
    lf, _ = fp.model.forward(fp.params, ids, fp.model.init_cache(1, 64), jnp.asarray(0, jnp.int32))
    lq, _ = jax.jit(q.model.forward, static_argnames=())(
        q.params, ids, q.model.init_cache(1, 64), jnp.asarray(0, jnp.int32)
    )
    lf, lq = np.asarray(lf), np.asarray(lq)
    denom = np.abs(lf).max() + 1e-6
    assert np.abs(lf - lq).max() / denom < 0.15, np.abs(lf - lq).max() / denom


def test_quantized_complete_batch():
    q = JaxChatLLM("tiny@int8", seed=7)
    prompts = [
        [{"role": "user", "content": "alpha"}],
        [{"role": "user", "content": "beta gamma"}],
    ]
    outs = q.complete_batch(prompts, temperature=0.0, max_new_tokens=12)
    assert len(outs) == 2
    for o in outs:
        assert isinstance(o.content, str)


def test_quantized_checkpoint_save_refused(tmp_path):
    q = JaxChatLLM("tiny@int8")
    with pytest.raises(ValueError, match="int8"):
        q.save_checkpoint(str(tmp_path / "ck"))
