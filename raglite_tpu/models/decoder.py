"""Decoder-only JAX LLM with KV cache and constrained decoding.

TPU-native replacement for the reference's llama.cpp generation stack
(/root/reference/src/raglite/_litellm.py:96-317, _lazy_llama.py):

- a Qwen-class decoder (RMSNorm, SwiGLU, grouped-query attention, RoPE) as
  a functional JAX model; weights load from safetensors when provided,
  deterministic random init otherwise;
- prefill + single-token decode are two jitted programs over a preallocated
  KV cache (static shapes; the sampling loop lives on the host so tokens
  stream);
- grammar-constrained JSON generation via per-step logit masking driven by
  an incremental JSON pushdown automaton — the TPU-side equivalent of
  llama.cpp's GBNF-constrained decode that the reference relies on for
  structured output and tool calling (_chatml_function_calling.py:411-501).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from raglite_tpu.models.json_automaton import JsonAutomaton
from raglite_tpu.models.tokenizer import ByteTokenizer
from raglite_tpu.ops.decode_attention import gqa_decode_attention, gqa_verify_attention
from raglite_tpu.ops.prefill_attention import gqa_prefill_attention, prefill_kernel_viable
from raglite_tpu.ops.quant_matmul import (
    QuantLinear,
    QuantLinearFused,
    quant_linear_apply,
    quant_linear_apply_fused,
)

# Per-(row, group) VMEM budget for the Pallas decode-attention kernel: K and
# V blocks are [hd, S] each and the pipeline double-buffers them, so the
# resident footprint is ~4 * hd * S * itemsize.  12 MB leaves headroom under
# the ~16 MB/core VMEM for q/out/accumulators; longer caches fall back to
# the XLA einsum path.
_DECODE_KERNEL_VMEM_BYTES = 12 * 1024 * 1024
# Widest window routed to the verify-attention kernel (spec drafts are
# K+1 <= ~9; anything larger is real prefill and wants the tiled kernel).
_VERIFY_KERNEL_MAX_T = 16

Params = dict[str, Any]

__all__ = ["DecoderModel", "init_decoder_params", "JaxChatLLM"]


def _linear(x: jax.Array, w) -> jax.Array:
    """``x @ w`` where ``w`` is a dense matrix or a QuantLinear (int8).
    Decode (few rows) is weight-streaming bound: int8 weights halve HBM
    traffic, and quant_linear_apply routes those row counts to a native
    s8xs8 MXU dot at HBM roofline (ops/quant_matmul.py has the measured
    lowering comparison) — the TPU-native analogue of llama.cpp's
    quantized GEMV hot loop the reference decodes through
    (_chatml_function_calling.py:527-580)."""
    if isinstance(w, QuantLinear):
        return quant_linear_apply(x, w)
    return x @ w


def quantize_decoder_params(params: Params) -> Params:
    """Quantize every decode-hot matmul weight to int8 (per-output-channel
    scales): attention qkv/o, MLP gate/up/down, and the lm_head.  Embedding
    (a gather), norms, and biases stay in their original dtype.

    Same-input weights are FUSED into one int8 matmul each (q/k/v ->
    ``wqkv``, gate/up -> ``w_gate_up``): per-output-channel scales make the
    fused quantization bit-identical, and decode at B=1 is op-count bound —
    4 dot+quantize+rescale chains per layer instead of 7."""
    out = {k: v for k, v in params.items() if k not in ("layers", "lm_head")}
    out["lm_head"] = QuantLinear.from_dense(params["lm_head"])
    out["layers"] = []
    for layer in params["layers"]:
        ql = {
            k: v
            for k, v in layer.items()
            if k not in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
        }
        ql["wqkv"] = QuantLinearFused.from_dense(
            [layer["wq"], layer["wk"], layer["wv"]]
        )
        ql["w_gate_up"] = QuantLinearFused.from_dense(
            [layer["w_gate"], layer["w_up"]]
        )
        ql["wo"] = QuantLinear.from_dense(layer["wo"])
        ql["w_down"] = QuantLinear.from_dense(layer["w_down"])
        out["layers"].append(ql)
    return out


def _rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32**2, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotary embedding. x: [B, H, T, Dh], positions: [B, T],
    inv_freq: [Dh/2] (precomputed; carries any rope_scaling)."""
    angles = positions[:, None, :, None].astype(jnp.float32) * inv_freq  # [B, 1, T, half]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def compute_inv_freq(cfg: dict) -> np.ndarray:
    """RoPE inverse frequencies [head_dim/2], applying the checkpoint's
    rope_scaling (HF "llama3" frequency-dependent scaling and "linear"
    position interpolation are supported — Llama 3.x checkpoints all ship
    rope_scaling, and ignoring it diverges from HF at every position)."""
    head_dim = cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
    base = float(cfg.get("rope_base", 10000.0))
    half = head_dim // 2
    inv_freq = base ** (-np.arange(half, dtype=np.float64) / half)
    scaling = cfg.get("rope_scaling") or {}
    rope_type = scaling.get("rope_type") or scaling.get("type")
    if rope_type == "llama3":
        factor = float(scaling["factor"])
        low = float(scaling.get("low_freq_factor", 1.0))
        high = float(scaling.get("high_freq_factor", 4.0))
        original = float(scaling.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * np.pi / inv_freq
        smooth = np.clip((original / wavelen - low) / max(high - low, 1e-9), 0.0, 1.0)
        scaled = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = np.where(
            wavelen < original / high, inv_freq,
            np.where(wavelen > original / low, inv_freq / factor, scaled),
        )
    elif rope_type == "linear":
        inv_freq = inv_freq / float(scaling["factor"])
    elif rope_type is not None:
        import warnings

        warnings.warn(
            f"unsupported rope_scaling type {rope_type!r}: using unscaled RoPE",
            stacklevel=2,
        )
    return inv_freq.astype(np.float32)


def init_decoder_params(cfg: dict, *, seed: int = 0, dtype=jnp.bfloat16) -> Params:
    d, ff, vocab = cfg["d_model"], cfg["d_ff"], cfg["vocab"]
    heads, kv_heads = cfg["heads"], cfg["kv_heads"]
    head_dim = d // heads
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 3 + 7 * cfg["layers"]))

    def dense(key, shape):
        return (jax.random.normal(key, shape) / np.sqrt(shape[0])).astype(dtype)

    params: Params = {
        "tok_emb": (jax.random.normal(next(keys), (vocab, d)) * 0.02).astype(dtype),
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": dense(next(keys), (d, vocab)),
        "layers": [],
    }
    for _ in range(cfg["layers"]):
        params["layers"].append(
            {
                "attn_norm": jnp.ones((d,), jnp.float32),
                "wq": dense(next(keys), (d, heads * head_dim)),
                "wk": dense(next(keys), (d, kv_heads * head_dim)),
                "wv": dense(next(keys), (d, kv_heads * head_dim)),
                "wo": dense(next(keys), (heads * head_dim, d)),
                "mlp_norm": jnp.ones((d,), jnp.float32),
                "w_gate": dense(next(keys), (d, ff)),
                "w_up": dense(next(keys), (d, ff)),
                "w_down": dense(next(keys), (ff, d)),
            }
        )
    return params


def init_decoder_params_quantized(cfg: dict, *, seed: int = 0,
                                  dtype=jnp.bfloat16) -> Params:
    """Random-init straight into the int8 decode layout, one layer at a
    time: each layer's bf16 weights are quantized and DROPPED before the
    next layer is initialized, so peak HBM is (int8 total + one bf16
    layer), not (bf16 total + int8 total).  At the 4B-class ``large``
    preset that is the difference between ~4.6 GB and ~12.7 GB of
    transient weights — the latter cannot co-reside with a 10M-chunk/8
    shard search index on a 16 GB v5e chip.  Output is bit-identical to
    ``quantize_decoder_params(init_decoder_params(cfg, seed=seed))``
    (same PRNG key schedule, same per-output-channel scales)."""
    d, ff, vocab = cfg["d_model"], cfg["d_ff"], cfg["vocab"]
    heads, kv_heads = cfg["heads"], cfg["kv_heads"]
    head_dim = d // heads
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 3 + 7 * cfg["layers"]))

    def dense(key, shape):
        return (jax.random.normal(key, shape) / np.sqrt(shape[0])).astype(dtype)

    out: Params = {
        "tok_emb": (jax.random.normal(next(keys), (vocab, d)) * 0.02).astype(dtype),
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": QuantLinear.from_dense(dense(next(keys), (d, vocab))),
        "layers": [],
    }
    for _ in range(cfg["layers"]):
        wq = dense(next(keys), (d, heads * head_dim))
        wk = dense(next(keys), (d, kv_heads * head_dim))
        wv = dense(next(keys), (d, kv_heads * head_dim))
        wo = dense(next(keys), (heads * head_dim, d))
        w_gate = dense(next(keys), (d, ff))
        w_up = dense(next(keys), (d, ff))
        w_down = dense(next(keys), (ff, d))
        ql = {
            "attn_norm": jnp.ones((d,), jnp.float32),
            "wqkv": QuantLinearFused.from_dense([wq, wk, wv]),
            "wo": QuantLinear.from_dense(wo),
            "mlp_norm": jnp.ones((d,), jnp.float32),
            "w_gate_up": QuantLinearFused.from_dense([w_gate, w_up]),
            "w_down": QuantLinear.from_dense(w_down),
        }
        del wq, wk, wv, wo, w_gate, w_up, w_down
        out["layers"].append(ql)
        if len(out["layers"]) % 4 == 0:
            # Let the device drain so dropped bf16 buffers actually free
            # before more layers are enqueued (async dispatch can otherwise
            # run the host arbitrarily far ahead of the allocator).
            jax.block_until_ready(out["layers"][-1]["w_down"].q8)
    return out


def load_safetensors_decoder(path: str, *, dtype=jnp.bfloat16):
    """Load a Qwen2/Qwen3/Llama/Mistral/Gemma(1-3)/Phi-3-family HF
    checkpoint directory into our layout (HF-gold parity tested for all
    eight in tests/test_pretrained_loaders.py).

    The pretrained-weights path the reference gets from llama.cpp GGUF
    loading (_litellm.py:96-148).  Expects ``config.json`` plus one or more
    ``*.safetensors`` shards (``model.safetensors`` or an index); returns
    ``(cfg, params, tokenizer)`` where tokenizer is the checkpoint's HF
    tokenizer when ``tokenizer.json`` is present.

    Layout notes (verified against transformers' Qwen2/Qwen3 modeling):
    - linear weights are stored [out, in] -> transposed into our [in, out];
    - Qwen2 has q/k/v biases; Qwen3 replaces them with per-head q/k RMS
      norms and may set head_dim != d_model/heads;
    - lm_head may be tied to the input embedding (tie_word_embeddings);
    - Gemma scales embeddings by sqrt(d), stores RMS norms as (1 + w)
      (folded at load), uses GeGLU, and (v2/v3) sandwich norms, logit
      softcapping (v2), alternating sliding-window layers, and a separate
      local RoPE base (v3);
    - Phi-3 packs qkv_proj and gate_up_proj (split at load) and applies a
      sliding window on every layer, as does Mistral.
    """
    import json
    import os

    from safetensors import safe_open

    from raglite_tpu.models.tokenizer import load_tokenizer

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    model_type = hf.get("model_type", "")
    is_gemma = model_type.startswith("gemma")
    num_layers = hf["num_hidden_layers"]
    # Per-layer local (sliding-window) attention: modern HF configs emit
    # layer_types; older ones imply the pattern from the family.
    layer_types = hf.get("layer_types")
    if layer_types:
        layer_sliding = [t == "sliding_attention" for t in layer_types]
    elif hf.get("sliding_window") and hf.get("use_sliding_window", True):
        # Qwen2/2.5 ship sliding_window values with use_sliding_window=false
        # and attend globally; honoring only the window size would wrongly
        # mask long prompts.
        if model_type == "gemma2":  # alternating, sliding on even layers
            layer_sliding = [i % 2 == 0 for i in range(num_layers)]
        elif model_type == "gemma3_text":  # 5 local : 1 global
            pattern = hf.get("sliding_window_pattern", 6)
            layer_sliding = [(i + 1) % pattern != 0 for i in range(num_layers)]
        elif model_type == "qwen2":  # window only above max_window_layers
            mwl = hf.get("max_window_layers", 0)
            layer_sliding = [i >= mwl for i in range(num_layers)]
        else:  # Mistral/Phi3: the window applies to every layer
            layer_sliding = [True] * num_layers
    else:
        layer_sliding = None
    cfg = dict(
        layers=num_layers,
        d_model=hf["hidden_size"],
        heads=hf["num_attention_heads"],
        kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        d_ff=hf["intermediate_size"],
        vocab=hf["vocab_size"],
        max_len=hf.get("max_position_embeddings", 32768),
        head_dim=hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"],
        rope_base=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        rope_scaling=hf.get("rope_scaling"),
        hidden_act=(
            "gelu_pytorch_tanh"
            if is_gemma
            and (hf.get("hidden_activation") or hf.get("hidden_act")) in (None, "gelu", "gelu_pytorch_tanh")
            else hf.get("hidden_activation") or hf.get("hidden_act", "silu")
        ),
        emb_scale=hf["hidden_size"] ** 0.5 if is_gemma else 1.0,
        attn_scale=(
            float(hf["query_pre_attn_scalar"]) ** -0.5
            if hf.get("query_pre_attn_scalar")
            else None
        ),
        attn_softcap=hf.get("attn_logit_softcapping"),
        final_softcap=hf.get("final_logit_softcapping"),
        sliding_window=hf.get("sliding_window"),
        layer_sliding=layer_sliding,
        rope_local_base=hf.get("rope_local_base_freq"),
    )
    shards = sorted(
        os.path.join(path, name)
        for name in os.listdir(path)
        if name.endswith(".safetensors")
    )
    tensors: dict[str, np.ndarray] = {}
    for shard in shards:
        with safe_open(shard, framework="np") as f:
            for name in f.keys():  # noqa: SIM118
                tensors[name] = f.get_tensor(name)

    def t(name: str, transpose: bool = False) -> jax.Array:
        x = tensors[name]
        return jnp.asarray(x.T if transpose else x, dtype=dtype)

    def t32(name: str) -> jax.Array:
        return jnp.asarray(tensors[name], dtype=jnp.float32)

    def norm(name: str) -> jax.Array:
        # Gemma RMSNorms scale by (1 + weight); folding the offset here keeps
        # one _rms_norm implementation for every family.
        w = t32(name)
        return w + 1.0 if is_gemma else w

    params: Params = {
        "tok_emb": t("model.embed_tokens.weight"),
        "final_norm": norm("model.norm.weight"),
        "lm_head": (
            t("lm_head.weight", transpose=True)
            if "lm_head.weight" in tensors
            else t("model.embed_tokens.weight", transpose=True)  # tied
        ),
        "layers": [],
    }
    q_size = cfg["heads"] * cfg["head_dim"]
    kv_size = cfg["kv_heads"] * cfg["head_dim"]
    for i in range(cfg["layers"]):
        b = f"model.layers.{i}."
        layer: dict[str, jax.Array] = {
            "attn_norm": norm(b + "input_layernorm.weight"),
            "wo": t(b + "self_attn.o_proj.weight", transpose=True),
            "w_down": t(b + "mlp.down_proj.weight", transpose=True),
        }
        if b + "self_attn.qkv_proj.weight" in tensors:  # Phi3: packed QKV
            qkv = tensors[b + "self_attn.qkv_proj.weight"]  # [q+2kv, d]
            layer["wq"] = jnp.asarray(qkv[:q_size].T, dtype=dtype)
            layer["wk"] = jnp.asarray(qkv[q_size : q_size + kv_size].T, dtype=dtype)
            layer["wv"] = jnp.asarray(qkv[q_size + kv_size :].T, dtype=dtype)
        else:
            layer["wq"] = t(b + "self_attn.q_proj.weight", transpose=True)
            layer["wk"] = t(b + "self_attn.k_proj.weight", transpose=True)
            layer["wv"] = t(b + "self_attn.v_proj.weight", transpose=True)
        if b + "mlp.gate_up_proj.weight" in tensors:  # Phi3: packed gate|up
            gate_up = tensors[b + "mlp.gate_up_proj.weight"]  # [2*ff, d]
            layer["w_gate"] = jnp.asarray(gate_up[: cfg["d_ff"]].T, dtype=dtype)
            layer["w_up"] = jnp.asarray(gate_up[cfg["d_ff"] :].T, dtype=dtype)
        else:
            layer["w_gate"] = t(b + "mlp.gate_proj.weight", transpose=True)
            layer["w_up"] = t(b + "mlp.up_proj.weight", transpose=True)
        if b + "pre_feedforward_layernorm.weight" in tensors:  # Gemma2/3 sandwich
            layer["post_attn_norm"] = norm(b + "post_attention_layernorm.weight")
            layer["mlp_norm"] = norm(b + "pre_feedforward_layernorm.weight")
            layer["post_mlp_norm"] = norm(b + "post_feedforward_layernorm.weight")
        else:  # Llama-family: post_attention_layernorm IS the pre-MLP norm
            layer["mlp_norm"] = norm(b + "post_attention_layernorm.weight")
        if b + "self_attn.q_proj.bias" in tensors:  # Qwen2
            layer["bq"] = t32(b + "self_attn.q_proj.bias")
            layer["bk"] = t32(b + "self_attn.k_proj.bias")
            layer["bv"] = t32(b + "self_attn.v_proj.bias")
        if b + "self_attn.q_norm.weight" in tensors:  # Qwen3 / Gemma3
            layer["q_norm"] = norm(b + "self_attn.q_norm.weight")
            layer["k_norm"] = norm(b + "self_attn.k_norm.weight")
        params["layers"].append(layer)
    # required=False: pure numerics use (parity tests) can run without the
    # tokenizer; generation through JaxChatLLM warns loudly in that case.
    tokenizer = load_tokenizer(os.path.join(path, "tokenizer.json"), required=False)
    return cfg, params, tokenizer


class DecoderModel:
    """Functional forward passes over an explicit KV cache.

    ``cfg`` optionally carries ``head_dim`` (Qwen3 decouples it from
    d_model/heads), ``rope_base`` (Qwen uses 1e6), and ``rms_eps``; layer
    params optionally carry q/k/v biases (Qwen2), per-head q/k RMS norms
    (Qwen3/Gemma3), and post-attention/post-MLP "sandwich" norms (Gemma2/3).
    Family knobs in ``cfg``: ``emb_scale`` (Gemma scales embeddings by
    sqrt(d)), ``hidden_act`` (SwiGLU vs GeGLU), ``attn_scale`` (Gemma2's
    query_pre_attn_scalar), ``attn_softcap``/``final_softcap`` (Gemma2 tanh
    capping), ``sliding_window`` + ``layer_sliding`` (per-layer local
    attention — Gemma2/3 alternate, Mistral/Phi3 window every layer), and
    ``rope_local_base`` (Gemma3's separate RoPE base for local layers)."""

    def __init__(self, cfg: dict) -> None:
        self.cfg = cfg
        self.head_dim = cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
        self.rms_eps = float(cfg.get("rms_eps", 1e-6))
        self.attn_scale = float(cfg.get("attn_scale") or self.head_dim**-0.5)
        self.emb_scale = float(cfg.get("emb_scale") or 1.0)
        self.attn_softcap = cfg.get("attn_softcap")
        self.final_softcap = cfg.get("final_softcap")
        self.hidden_act = cfg.get("hidden_act", "silu")
        self.sliding_window = cfg.get("sliding_window")
        self.layer_sliding = cfg.get("layer_sliding") or [False] * cfg["layers"]
        self.inv_freq = jnp.asarray(compute_inv_freq(cfg))
        if cfg.get("rope_local_base"):
            # Gemma3: local (sliding) layers use their own RoPE base and no
            # rope_scaling; global layers keep the scaled main table.
            local_cfg = {**cfg, "rope_base": cfg["rope_local_base"], "rope_scaling": None}
            self.inv_freq_local = jnp.asarray(compute_inv_freq(local_cfg))
        else:
            self.inv_freq_local = self.inv_freq
        # Decode (T=1) attention runs as a Pallas kernel on TPU: one program
        # per (row, kv group) streams that group's [hd, S] cache slices
        # through VMEM exactly once (ops/decode_attention.py).  The XLA
        # batched-dot lowering of the same contraction reaches ~37% of HBM
        # bandwidth (measured v5e, base preset).  RAGLITE_TPU_PALLAS_DECODE=0
        # forces the XLA path everywhere.
        self.use_pallas_decode = (
            os.environ.get("RAGLITE_TPU_PALLAS_DECODE", "auto") != "0"
            and jax.default_backend() == "tpu"
        )
        # Prefill (T > 1) attention likewise runs as a Pallas kernel on TPU
        # (ops/prefill_attention.py): the XLA path materializes the
        # [B, G, R, T, S] fp32 logits tensor in HBM, the measured prefill
        # ceiling (MFU 0.33, BENCH_r03).  RAGLITE_TPU_PALLAS_PREFILL=0
        # forces the XLA path.
        self.use_pallas_prefill = (
            os.environ.get("RAGLITE_TPU_PALLAS_PREFILL", "auto") != "0"
            and jax.default_backend() == "tpu"
        )
        #: Optional NamedSharding for KV cache buffers — set by
        #: parallel/tp_decoder.py so tensor-parallel caches are born on
        #: their KV-head shards instead of being replicated then resharded.
        self.cache_sharding = None

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        """KV cache as PER-LAYER leaves (lists of [B, KVH, hd, S]), not one
        stacked [L, ...] tensor: forward then updates each layer with a
        dynamic_update_slice on its own (donated) buffer, which XLA performs
        in place.  The stacked layout forced a jnp.stack over all layers
        per call — re-materializing the ENTIRE cache every decoded token
        (measured: the dominant decode cost at B=8, 2 GB rewritten per
        594M-model step).

        The sequence axis is MINOR-MOST (hd-major, S-minor) because that is
        the layout both attention contractions consume: with [B, KVH, S, hd]
        storage, XLA's layout assignment inserted a {2,3,1,0} transpose COPY
        of every k/v buffer inside the decode while_loop body — 48 full-cache
        copies per decoded token on the base preset (measured: 2 GB/step at
        B=8, ~5 ms of the 7.6 ms step).  Stored transposed, the optimized
        HLO has zero cache-sized copies."""
        L, kvh, hd = self.cfg["layers"], self.cfg["kv_heads"], self.head_dim

        def zeros():
            buf = jnp.zeros((batch, kvh, hd, max_len), dtype)
            if self.cache_sharding is not None:  # TP: born on the KVH shards
                buf = jax.device_put(buf, self.cache_sharding)
            return buf

        return {
            "k": [zeros() for _ in range(L)],
            "v": [zeros() for _ in range(L)],
        }

    def forward(
        self,
        params: Params,
        ids: jax.Array,  # [B, T]
        cache: dict,
        cache_len: jax.Array,  # scalar int32: tokens already in the cache
        last_positions: jax.Array | None = None,  # [B]: emit logits only there
    ) -> tuple[jax.Array, dict]:
        """Run T tokens starting at position ``cache_len``; returns logits
        [B, T, V] and the updated cache.  Works for both prefill (T = padded
        prompt length, cache_len = 0) and decode (T = 1).

        ``last_positions`` (a [B] vector of in-sequence indices) restricts
        the unembedding to one position per row, returning [B, V]:
        generation prefills only ever read the last prompt position, and
        the full [B, T, V] logits tensor is the dominant prefill cost at
        real vocab sizes (a [8, 2048, 151936] fp32 tensor is ~10 GB and a
        ~600x-larger lm_head matmul than the one row the sampler uses).

        ``cache_len`` may be a scalar (all rows aligned) or a [B] vector —
        the batched-generation path decodes sequences of different prompt
        lengths together, each row writing its KV at its own offset (trailing
        prompt padding is naturally masked out: it sits at positions >= the
        row's cache_len, i.e. "in the future" of every real token)."""
        cfg = self.cfg
        heads, kv_heads, hd = cfg["heads"], cfg["kv_heads"], self.head_dim
        B, T = ids.shape
        S = cache["k"][0].shape[3]
        per_row = getattr(cache_len, "ndim", 0) == 1
        row_offsets = cache_len if per_row else jnp.full((B,), cache_len, jnp.int32)
        positions = row_offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        x = params["tok_emb"][ids]
        if self.emb_scale != 1.0:  # Gemma: embeddings scaled by sqrt(d)
            x = x * jnp.asarray(self.emb_scale, x.dtype)
        new_k, new_v = [], []
        for li, layer in enumerate(params["layers"]):
            sliding = self.layer_sliding[li] and self.sliding_window
            inv_freq = self.inv_freq_local if self.layer_sliding[li] else self.inv_freq
            h = _rms_norm(x, layer["attn_norm"], self.rms_eps)
            if "wqkv" in layer:  # fused int8 projection (one dot for q/k/v)
                q, k, v = quant_linear_apply_fused(h, layer["wqkv"])
            else:
                q = _linear(h, layer["wq"])
                k = _linear(h, layer["wk"])
                v = _linear(h, layer["wv"])
            if "bq" in layer:  # Qwen2-style attention biases
                q = q + layer["bq"]
                k = k + layer["bk"]
                v = v + layer["bv"]
            q = q.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, kv_heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, kv_heads, hd).transpose(0, 2, 1, 3)
            if "q_norm" in layer:  # Qwen3-style per-head RMS norms
                q = _rms_norm(q, layer["q_norm"], self.rms_eps)
                k = _rms_norm(k, layer["k_norm"], self.rms_eps)
            q = _rope(q, positions, inv_freq)
            k = _rope(k, positions, inv_freq)
            cache_dtype = cache["k"][li].dtype
            # Cache stores sequence minor-most: write the [B, KVH, hd, T]
            # transpose of the new keys/values at each row's offset.
            k_t = k.transpose(0, 1, 3, 2).astype(cache_dtype)
            v_t = v.transpose(0, 1, 3, 2).astype(cache_dtype)
            if per_row:  # per-row write offsets (vmapped dus lowers to scatter)
                row_dus = jax.vmap(
                    lambda c, x, off: jax.lax.dynamic_update_slice(c, x, (0, 0, off))
                )
                k_cache = row_dus(cache["k"][li], k_t, row_offsets)
                v_cache = row_dus(cache["v"][li], v_t, row_offsets)
            else:
                k_cache = jax.lax.dynamic_update_slice(
                    cache["k"][li], k_t, (0, 0, 0, cache_len)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    cache["v"][li], v_t, (0, 0, 0, cache_len)
                )
            new_k.append(k_cache)
            new_v.append(v_cache)
            # Grouped-query attention over the full cache with causal+validity
            # mask.  The rep dimension stays FACTORED in the einsums (head h
            # shares kv group h // rep, matching HF's repeat_interleave):
            # materializing jnp.repeat(k_cache, rep) reads an [B, H, S, hd]
            # tensor from HBM every decode step — measured 8x decode
            # slowdown at B=8 on v5e — while the grouped contraction streams
            # the [B, KVH, hd, S] cache once.
            rep = heads // kv_heads
            # Operands stay in their storage dtypes with fp32 ACCUMULATION
            # (preferred_element_type): an .astype(f32) on the cache
            # operands makes XLA materialize full fp32 copies of k/v every
            # step — ~4 GB/step at B=8 on the base preset, measured as a
            # 3x decode slowdown over the bf16-operand contraction.
            qg = q.reshape(B, kv_heads, rep, T, hd)
            use_kernel = (
                T == 1
                and self.use_pallas_decode
                and 4 * hd * S * k_cache.dtype.itemsize <= _DECODE_KERNEL_VMEM_BYTES
            )
            # Small-T windows (speculative verify forwards, T <= 16) run a
            # kernel that reproduces the T=1 decode kernel's math per window
            # position, so draft verification shares plain greedy decode's
            # attention numerics (VERDICT r4 #3: the XLA einsum path's
            # different reduction order measurably flipped near-tie argmaxes,
            # BENCH_r04 spec_bitexact_vs_plain_greedy=false).
            use_verify_kernel = (
                1 < T <= _VERIFY_KERNEL_MAX_T
                and self.use_pallas_decode
                and 4 * hd * S * k_cache.dtype.itemsize <= _DECODE_KERNEL_VMEM_BYTES
            )
            use_prefill_kernel = (
                T > 1
                and not use_verify_kernel
                and self.use_pallas_prefill
                and prefill_kernel_viable(
                    rep, T, S, hd, k_cache.dtype.itemsize, _DECODE_KERNEL_VMEM_BYTES
                )
            )
            if use_kernel:
                # One Pallas program per (row, kv group) streams that group's
                # [hd, S] K/V slices through VMEM once and computes the whole
                # masked-softmax attention on-chip (ops/decode_attention.py).
                ctx = gqa_decode_attention(
                    qg[:, :, :, 0, :].astype(k_cache.dtype),
                    k_cache,
                    v_cache,
                    row_offsets,
                    scale=float(self.attn_scale),
                    softcap=float(self.attn_softcap or 0.0),
                    window=int(self.sliding_window if sliding else 0),
                )  # [B, KVH, REP, hd] fp32
                ctx = ctx[:, :, :, None, :]  # [B, KVH, REP, T=1, hd]
            elif use_verify_kernel:
                # Per window position t: the T=1 kernel's exact contractions
                # and full-S masked softmax at position row_offset + t
                # (ops/decode_attention.py:gqa_verify_attention).
                ctx = gqa_verify_attention(
                    qg.astype(k_cache.dtype),
                    k_cache,
                    v_cache,
                    row_offsets,
                    scale=float(self.attn_scale),
                    softcap=float(self.attn_softcap or 0.0),
                    window=int(self.sliding_window if sliding else 0),
                )  # [B, KVH, REP, T, hd] fp32
            elif use_prefill_kernel:
                # One program per (row, kv group, query tile): the fp32
                # logits tile lives entirely in VMEM instead of HBM — the
                # [B,G,R,T,S] materialization the XLA path pays is the
                # measured prefill ceiling (ops/prefill_attention.py).
                ctx = gqa_prefill_attention(
                    qg.astype(k_cache.dtype),
                    k_cache,
                    v_cache,
                    row_offsets,
                    scale=float(self.attn_scale),
                    softcap=float(self.attn_softcap or 0.0),
                    window=int(self.sliding_window if sliding else 0),
                )  # [B, KVH, REP, T, hd] fp32
            else:
                logits = (
                    jnp.einsum(
                        "bgrtd,bgds->bgrts",
                        qg.astype(k_cache.dtype),
                        k_cache,
                        preferred_element_type=jnp.float32,
                    )
                    * self.attn_scale
                )
                if self.attn_softcap:  # Gemma2 attention-logit soft capping
                    logits = self.attn_softcap * jnp.tanh(logits / self.attn_softcap)
                key_pos = jnp.arange(S, dtype=jnp.int32)
                mask = (
                    key_pos[None, None, None, None, :]
                    <= positions[:, None, None, :, None]
                )
                if sliding:  # local attention: keys in (pos - window, pos]
                    mask &= key_pos[None, None, None, None, :] > (
                        positions[:, None, None, :, None] - self.sliding_window
                    )
                logits = jnp.where(mask, logits, -1e9)
                probs = jax.nn.softmax(logits, axis=-1)  # fp32
                ctx = jnp.einsum(
                    "bgrts,bgds->bgrtd",
                    probs.astype(v_cache.dtype),
                    v_cache,
                    preferred_element_type=jnp.float32,
                )
            ctx = ctx.reshape(B, heads, T, hd)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, heads * hd).astype(x.dtype)
            attn_out = _linear(ctx, layer["wo"])
            if "post_attn_norm" in layer:  # Gemma2/3 sandwich norm
                attn_out = _rms_norm(attn_out, layer["post_attn_norm"], self.rms_eps)
            x = x + attn_out
            # Gated MLP: SwiGLU (Llama/Qwen/Mistral) or GeGLU (Gemma).
            h = _rms_norm(x, layer["mlp_norm"], self.rms_eps)
            if "w_gate_up" in layer:  # fused int8 projection (one dot)
                gate_pre, up = quant_linear_apply_fused(h, layer["w_gate_up"])
                gate_pre, up = gate_pre.astype(jnp.float32), up.astype(jnp.float32)
            else:
                gate_pre = _linear(h, layer["w_gate"]).astype(jnp.float32)
                up = _linear(h, layer["w_up"]).astype(jnp.float32)
            gate = (
                jax.nn.gelu(gate_pre, approximate=True)
                if self.hidden_act == "gelu_pytorch_tanh"
                else jax.nn.silu(gate_pre)
            )
            mlp_out = _linear((gate * up).astype(x.dtype), layer["w_down"])
            if "post_mlp_norm" in layer:  # Gemma2/3 sandwich norm
                mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"], self.rms_eps)
            x = x + mlp_out
        x = _rms_norm(x, params["final_norm"], self.rms_eps)
        if last_positions is not None:
            x = x[jnp.arange(B), last_positions]  # [B, d]
        logits_out = _linear(x, params["lm_head"]).astype(jnp.float32)
        if self.final_softcap:  # Gemma2 final-logit soft capping
            logits_out = self.final_softcap * jnp.tanh(logits_out / self.final_softcap)
        return logits_out, {"k": new_k, "v": new_v}


@partial(jax.jit, static_argnames=("model",))
def _prefill(model: DecoderModel, params, ids, cache):
    return model.forward(params, ids, cache, jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("model",))
def _prefill_last(model: DecoderModel, params, ids, cache, lens):
    """Prefill emitting only each row's last-prompt-position logits [B, V]
    (the only row generation samples from) — skips the [B, T, V] logits
    tensor and ~T-times-larger unembedding matmul of the full prefill."""
    return model.forward(
        params, ids, cache, jnp.asarray(0, jnp.int32), last_positions=lens - 1
    )


from raglite_tpu.utils.padding import bucket as _bucket_any


def _bucket(n: int, minimum: int = 64) -> int:  # prompt buckets start small
    return _bucket_any(n, minimum)


def _max_new(sampling: dict, default: int) -> int:
    """Generation budget from sampling kwargs.  The protocol key is the
    OpenAI-style ``max_tokens``; ``max_new_tokens`` (the HF-style spelling)
    is accepted as an alias because silently ignoring a limit kwarg runs
    generations ~4x longer than the caller asked for."""
    return int(sampling.get("max_tokens", sampling.get("max_new_tokens", default)))


class JaxChatLLM:
    """Chat LLM over the JAX decoder (the ``jax:<preset|path>`` provider).

    Implements the LLM protocol of models/llm.py with ChatML-style prompt
    formatting, streamed generation, a ``<tool_call>{json}</tool_call>``
    tool protocol, and JSON-constrained decoding for response formats —
    feature parity with the reference's custom llama.cpp chat handler
    (_chatml_function_calling.py:230-580), grammar enforcement included.
    """

    supports_function_calling = True
    supports_response_format = True

    _PRESETS = {
        "tiny": dict(layers=2, d_model=128, heads=4, kv_heads=2, d_ff=256, vocab=512, max_len=1024),
        "small": dict(layers=8, d_model=512, heads=8, kv_heads=4, d_ff=1408, vocab=32768, max_len=4096),
        "base": dict(layers=24, d_model=1024, heads=16, kv_heads=8, d_ff=2816, vocab=151936, max_len=8192),
        # 4B-class (the reference's default local LLM is a Qwen3-4B-class
        # GGUF, _config.py:50-64): 36 layers x d2560, GQA 20q/4kv
        # (head_dim 128), SwiGLU ff 9728, untied 151936 lm_head = 4.03B
        # params.  bf16 weights are 8.1 GB; @int8 they are 4.0 GB and
        # co-reside with the 10M-chunk/8 int8 index shard on a 16 GB v5e
        # (bench.py large_generation section measures the fit).
        "large": dict(layers=36, d_model=2560, heads=20, kv_heads=4, d_ff=9728, vocab=151936, max_len=8192),
    }

    def __init__(self, spec: str = "tiny", *, seed: int = 0, dtype=jnp.bfloat16) -> None:
        # "<spec>@int8": int8 weight-only decode (halves decode-step HBM
        # traffic; the reference's analogue is llama.cpp's quantized GGUF,
        # selected by its model-string grammar `<repo>/<file>@<n_ctx>`,
        # _litellm.py:96-148).
        self.quantized = spec.endswith("@int8")
        if self.quantized:
            spec = spec[: -len("@int8")]
        if spec.startswith("ckpt:"):
            # orbax checkpoint written by save_checkpoint() below.
            from raglite_tpu.models.checkpoint import load_checkpoint

            params, cfg = load_checkpoint(spec.removeprefix("ckpt:"))
            self.params = params
            self.tokenizer = ByteTokenizer(vocab_size=cfg["vocab"])
        elif spec.startswith("hf:"):
            # Pretrained HF safetensors checkpoint (Qwen2/Qwen3 layout) with
            # the checkpoint's own tokenizer — the real-weights path the
            # reference gets via llama.cpp GGUF (_litellm.py:96-148).
            cfg, self.params, self.tokenizer = load_safetensors_decoder(
                spec.removeprefix("hf:"), dtype=dtype
            )
        else:
            cfg = dict(self._PRESETS.get(spec, self._PRESETS["tiny"]))
            if self.quantized:
                # Layer-streaming init: peak HBM = int8 total + one bf16
                # layer (a full bf16 init of the 4B `large` preset cannot
                # co-reside with a search index shard on a 16 GB chip).
                self.params = init_decoder_params_quantized(
                    cfg, seed=seed, dtype=dtype
                )
            else:
                self.params = init_decoder_params(cfg, seed=seed, dtype=dtype)
            self.tokenizer = ByteTokenizer(vocab_size=cfg["vocab"])
        self.cfg = cfg
        if self.quantized and not isinstance(
            self.params.get("lm_head"), QuantLinear
        ):
            self.params = quantize_decoder_params(self.params)
        self.model = DecoderModel(cfg)
        self._byte_level = isinstance(self.tokenizer, ByteTokenizer)
        # Byte-level automatons (grammar-constrained JSON) need the byte
        # tokenizer; HF-BPE models fall back to schema-in-prompt (the
        # extract layer handles both, reference: _extract.py:36-63).
        self.supports_response_format = self._byte_level
        self.context_size = cfg["max_len"]
        # Chat stop tokens: EVERY checkpoint eos id (Llama-3 instruct lists
        # [<|end_of_text|>, <|eot_id|>] — stopping only on the first runs to
        # max_new_tokens appending junk) plus the ChatML end marker when the
        # vocab has one.
        self._stop_ids = set(getattr(self.tokenizer, "EOS_IDS", (self.tokenizer.EOS,)))
        self._stop_ids.add(self.tokenizer.EOS)
        if not self._byte_level:
            for name in ("<|im_end|>", "<|endoftext|>", "<|eot_id|>", "<end_of_turn>"):
                tid = self.tokenizer.token_id(name)
                if tid is not None:
                    self._stop_ids.add(tid)

    def save_checkpoint(self, path: str) -> None:
        """Write an orbax checkpoint loadable via ``jax:ckpt:<path>``."""
        from raglite_tpu.models.checkpoint import save_checkpoint

        if self.quantized:
            # Checkpoints stay full-precision; quantization is a load-time
            # transform (append @int8 to the spec when reloading).
            msg = "save_checkpoint on an @int8-quantized model; save the full-precision model instead"
            raise ValueError(msg)
        save_checkpoint(path, self.params, self.cfg)

    # --- Prompting --------------------------------------------------------

    def _format_messages(
        self, messages: list[dict[str, Any]], tools: list[dict[str, Any]] | None
    ) -> str:
        """ChatML with an embedded tool manifest (reference's handler builds
        the analogous Jinja2 template, _chatml_function_calling.py:263-322)."""
        parts = []
        if tools:
            manifest = "\n".join(
                f"- {t['function']['name']}: {t['function'].get('description', '')}"
                for t in tools
            )
            parts.append(
                "<|im_start|>system\nYou may call tools by emitting "
                '<tool_call>{"name": ..., "arguments": {...}}</tool_call>.\n'
                f"Available tools:\n{manifest}<|im_end|>\n"
            )
        for m in messages:
            role = m.get("role", "user")
            content = m.get("content") or ""
            parts.append(f"<|im_start|>{role}\n{content}<|im_end|>\n")
        parts.append("<|im_start|>assistant\n")
        return "".join(parts)

    # --- Generation -------------------------------------------------------

    #: Recommended sampling defaults for Qwen-class models (the reference
    #: registers the same for its local provider, _litellm.py:168-177).
    #: Deliberately NOT applied implicitly — generation defaults to greedy
    #: for determinism; splat these into the call for chat-quality sampling:
    #: ``llm.stream(msgs, **JaxChatLLM.RECOMMENDED_SAMPLING)``.
    RECOMMENDED_SAMPLING = {"temperature": 0.7, "top_p": 0.8, "top_k": 20, "min_p": 0.0}

    @staticmethod
    def _sample_host(
        logits: np.ndarray,
        *,
        temperature: float,
        top_p: float,
        top_k: int,
        min_p: float,
        rng: np.random.Generator,
    ) -> int:
        """Temperature + top-k + nucleus (top-p) + min-p sampling over one
        logit vector (host-side; the device loop uses greedy/gumbel)."""
        if temperature <= 0.0:
            return int(np.argmax(logits))
        finite = np.isfinite(logits)
        scaled = np.where(finite, logits / max(temperature, 1e-4), -np.inf)
        probs = np.exp(scaled - np.max(scaled[finite]))
        probs = np.where(finite, probs, 0.0)
        probs /= probs.sum()
        if top_k and top_k > 0:
            cutoff = np.partition(probs, -top_k)[-top_k]
            probs = np.where(probs >= cutoff, probs, 0.0)
        if min_p and min_p > 0.0:
            probs = np.where(probs >= min_p * probs.max(), probs, 0.0)
        if top_p and top_p < 1.0:
            probs /= probs.sum()  # renormalize after top-k/min-p zeroing
            order = np.argsort(probs)[::-1]
            sorted_probs = probs[order]
            csum = np.cumsum(sorted_probs)
            # Standard nucleus: keep every token whose PRECEDING mass is
            # below top_p — the threshold-crossing token stays in the set
            # (an exclusive `csum <= p` collapses to near-greedy whenever
            # the top token holds most of the mass).
            keep = (csum - sorted_probs) < top_p
            mask = np.zeros_like(probs, dtype=bool)
            mask[order[keep]] = True
            probs = np.where(mask, probs, 0.0)
        probs /= probs.sum()
        return int(rng.choice(len(probs), p=probs))

    def _stop_ids_device(self) -> jnp.ndarray:
        stops = np.full((8,), -7, np.int32)  # -7 matches no sampled token
        for i, sid in enumerate(sorted(self._stop_ids)[:8]):
            stops[i] = sid
        return jnp.asarray(stops)

    def _device_token_stream(  # noqa: PLR0913
        self,
        cache,
        cache_lens,
        first_logits,  # [B, V] device array (B=1 here)
        done,
        *,
        max_new_tokens: int,
        logits_mask,
        temperature: float,
        top_p: float,
        top_k: int,
        min_p: float,
        seed: int,
        hist: np.ndarray | None = None,
        hist_len: int = 0,
        speculate: bool = False,
    ) -> Iterator[int]:
        """Stream tokens from the on-device decode loop, one dispatch per
        DECODE_CHUNK tokens.  With ``speculate`` (and ``hist``, the prompt
        token history), the dispatch runs prompt-lookup speculative decoding
        (models/speculative.py): n-gram drafts from the history are verified
        K-at-a-time in one forward, so copy-heavy RAG answers emit several
        tokens per weight-streaming pass."""
        stops = self._stop_ids_device()
        key = jax.random.PRNGKey(seed)
        last = first_logits
        emitted = 0
        if speculate and hist is not None:
            from raglite_tpu.models.speculative import speculate_chunk_device

            hist_dev = jnp.asarray(hist, jnp.int32)[None, :]
            hl = jnp.asarray([hist_len], jnp.int32)
            reject = jnp.full((1,), -1, jnp.int32)
            tot_iters = 0
            while emitted < max_new_tokens:
                (
                    out, cache, cache_lens, last, reject, done, key,
                    hist_dev, hl, n_iters,
                ) = speculate_chunk_device(
                    self.model,
                    cache,
                    self.params,
                    cache_lens,
                    last,
                    reject,
                    logits_mask,
                    done,
                    stops,
                    key,
                    hist_dev,
                    hl,
                    num_tokens=DECODE_CHUNK,
                    draft_len=SPEC_DRAFT_LEN,
                    pad_id=int(self.tokenizer.PAD),
                    temperature=float(temperature),
                    top_p=float(top_p),
                    top_k=int(top_k),
                    min_p=float(min_p),
                )
                tokens = np.asarray(out[0])
                tot_iters += int(n_iters)
                for token in tokens:
                    if token == _NO_TOKEN or emitted >= max_new_tokens:
                        break
                    yield int(token)
                    emitted += 1
                # Verified-tokens-per-forward telemetry for bench/tests.
                self.spec_stats = {"tokens": emitted, "verify_iters": tot_iters}
                if emitted >= max_new_tokens or bool(np.asarray(done)[0]):
                    return
                if not np.any(tokens != _NO_TOKEN):
                    return  # budget-capped chunk emitted nothing new
            return
        while emitted < max_new_tokens:
            out, cache, cache_lens, last, done, key = _decode_chunk_device(
                self.model,
                cache,
                self.params,
                cache_lens,
                last,
                logits_mask,
                done,
                stops,
                key,
                num_steps=DECODE_CHUNK,
                temperature=float(temperature),
                top_p=float(top_p),
                top_k=int(top_k),
                min_p=float(min_p),
            )
            tokens = np.asarray(out[0])
            for token in tokens:
                if token == _NO_TOKEN or emitted >= max_new_tokens:
                    return
                yield int(token)
                emitted += 1
            if bool(np.asarray(done)[0]):
                return

    def _generate_tokens(
        self,
        prompt: str,
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_p: float = 0.0,
        json_constrained: bool = False,
        automaton=None,
        seed: int = 0,
    ) -> Iterator[int]:
        """``automaton`` (any object with allowed_bytes/feed/done/can_end/
        completion_bytes — JsonAutomaton or SchemaAutomaton) constrains the
        byte stream; ``json_constrained`` is the schema-less shorthand."""
        tok = self.tokenizer
        # Clamp the generation budget to the window, then keep the newest
        # prompt tokens that fit: the naive `ids[-(ctx - max_new - 1):]`
        # flips sign when max_new + 1 >= ctx (keeping the WRONG slice) and
        # `[-0:]` keeps everything instead of nothing.
        max_new_tokens = max(1, min(max_new_tokens, self.context_size - 32))
        budget = max(self.context_size - max_new_tokens - 1, 16)
        ids = tok.encode(prompt)[-budget:]
        if self._byte_level:
            ids = [tok.BOS, *ids]
        pad = _bucket(len(ids))
        batch_ids = np.full((1, pad), tok.PAD, dtype=np.int32)
        batch_ids[0, : len(ids)] = ids
        # DECODE_CHUNK headroom: a speculative chunk commits up to
        # num_tokens (=DECODE_CHUNK) tokens to KV before the host sees the
        # budget is spent, so without headroom a bucket-boundary prompt
        # (pad == len(ids)) with _bucket(max_new) == max_new lets the verify
        # window's dynamic_update_slice clamp and corrupt the newest valid
        # KV entries.  Plain decode never exceeds _bucket(max_new) (it emits
        # exactly DECODE_CHUNK per dispatch and DECODE_CHUNK | bucket), but
        # the headroom is one chunk of KV slots — cheap insurance either way.
        max_total = pad + _bucket(max_new_tokens) + DECODE_CHUNK
        cache = self.model.init_cache(1, max_total)
        last_dev, cache = _prefill_last(
            self.model, self.params, jnp.asarray(batch_ids), cache,
            jnp.asarray([len(ids)], jnp.int32),
        )
        cache_len = len(ids)
        if automaton is None and json_constrained and self._byte_level:
            automaton = JsonAutomaton()
        if not self._byte_level:
            # Grammar automatons are byte-level; pretrained BPE models run
            # unconstrained (schema-in-prompt fallback upstream).
            automaton = None
            mask = np.zeros((self.cfg["vocab"],), dtype=np.float32)
        else:
            # Base mask: only byte tokens and EOS are ever valid outputs for
            # the byte tokenizer (ids beyond OFFSET+255 are unused vocab).
            base_mask = np.full((self.cfg["vocab"],), -np.inf, dtype=np.float32)
            base_mask[tok._OFFSET : tok._OFFSET + 256] = 0.0
            base_mask[tok.EOS] = 0.0
            mask = base_mask
        if automaton is None:
            # Unconstrained: the whole decode loop runs on device in
            # DECODE_CHUNK-token dispatches (sampling + stop checks
            # included) — one host fetch per chunk, not per token.
            # Prompt-lookup speculation is on by default for greedy decode.
            # Greedy equivalence holds only when the verify forward shares
            # the plain T=1 loop's attention numerics — the small-T verify
            # kernel (ops/decode_attention.py:gqa_verify_attention) provides
            # that on TPU; bench.py A/Bs the full generate path per chip
            # (spec_bitexact_vs_plain_greedy — r4, on the XLA einsum verify
            # path, measured near-tie argmax flips; the verify kernel was
            # added to close exactly that gap).  RAGLITE_TPU_SPECULATE=always
            # extends it to sampled decode (speculative-sampling acceptance —
            # the target distribution is preserved but the PRNG stream
            # differs from plain decode), =0 disables.
            spec_mode = os.environ.get("RAGLITE_TPU_SPECULATE", "auto")
            speculate = spec_mode != "0" and (
                temperature == 0.0 or spec_mode in ("1", "always")
            )
            hist0 = None
            if speculate:
                hist0 = np.full((max_total,), tok.PAD, dtype=np.int32)
                hist0[: len(ids)] = ids
            yield from self._device_token_stream(
                cache,
                jnp.asarray([cache_len], jnp.int32),
                last_dev,
                jnp.zeros((1,), bool),
                max_new_tokens=max_new_tokens,
                logits_mask=jnp.asarray(mask),
                temperature=temperature,
                top_p=top_p,
                top_k=top_k,
                min_p=min_p,
                seed=seed,
                hist=hist0,
                hist_len=len(ids),
                speculate=speculate,
            )
            return
        last_logits = np.asarray(last_dev[0])

        def byte_mask() -> np.ndarray:
            m = np.full((self.cfg["vocab"],), -np.inf, dtype=np.float32)
            allowed = automaton.allowed_bytes()
            idx = np.fromiter((b + ByteTokenizer._OFFSET for b in allowed), dtype=np.int64)
            if idx.size:
                m[idx] = 0.0
            if automaton.can_end():
                m[tok.EOS] = 0.0
            return m

        rng = np.random.default_rng(seed)
        # First token from the prefill logits (host-side to keep one code path).
        for _ in range(max_new_tokens):
            if automaton is not None:
                mask = byte_mask()
            masked = last_logits + mask
            token = self._sample_host(
                masked, temperature=temperature, top_p=top_p, top_k=top_k,
                min_p=min_p, rng=rng,
            )
            if token in self._stop_ids:
                break
            yield token
            if automaton is not None and token >= ByteTokenizer._OFFSET:
                automaton.feed(token - ByteTokenizer._OFFSET)
                if automaton.done():
                    return
            step_logits, cache = _jax_forward_one(
                self.model, self.params, token, cache, cache_len
            )
            last_logits = np.asarray(step_logits)
            cache_len += 1
        # Budget exhausted (or EOS) mid-document: emit the closing suffix so
        # constrained output is always valid JSON.
        if automaton is not None and not automaton.done():
            for byte in automaton.completion_bytes():
                yield byte + ByteTokenizer._OFFSET

    def _generate_batch(
        self,
        prompts: list[str],
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        min_p: float = 0.0,
        automatons: list | None = None,
        seed: int = 0,
    ) -> list[list[int]]:
        """Generate for MANY prompts in one batched decode loop: one [B, T]
        prefill + one [B, 1] forward per step (the reference gets this from
        litellm.batch_completion fan-out, _extract.py:196-205; here the
        batch shares every device program).  Sequences may have different
        prompt lengths — each row decodes at its own cache offset.  Returns
        one token list per prompt (automaton completion bytes included)."""
        tok = self.tokenizer
        n = len(prompts)
        if n == 0:
            return []
        max_new_tokens = max(1, min(max_new_tokens, self.context_size - 32))
        budget = max(self.context_size - max_new_tokens - 1, 16)
        encoded: list[list[int]] = []
        for p in prompts:
            ids = tok.encode(p)[-budget:]
            if self._byte_level:
                ids = [tok.BOS, *ids]
            encoded.append(ids or [tok.BOS])
        # Pad the batch to a bucket so the jitted programs compile per
        # (B, T) bucket, not per call; dummy rows are ignored.
        from raglite_tpu.utils.padding import round_up as _round_up_b

        bpad = _round_up_b(n, 8)
        pad = _bucket(max(len(i) for i in encoded))
        batch_ids = np.full((bpad, pad), tok.PAD, dtype=np.int32)
        lens = np.full((bpad,), 1, dtype=np.int32)
        for i, ids in enumerate(encoded):
            batch_ids[i, : len(ids)] = ids
            lens[i] = len(ids)
        # DECODE_CHUNK headroom for speculative over-commit (see the stream
        # path above for the overflow scenario this prevents).
        max_total = pad + _bucket(max_new_tokens) + DECODE_CHUNK
        cache = self.model.init_cache(bpad, max_total)
        last_dev, cache = _prefill_last(
            self.model, self.params, jnp.asarray(batch_ids), cache, jnp.asarray(lens)
        )
        cache_lens = jnp.asarray(lens)

        if automatons is None:
            automatons = [None] * n
        if not self._byte_level:
            automatons = [None] * n  # grammar automatons are byte-level
            base_mask = np.zeros((self.cfg["vocab"],), dtype=np.float32)
        else:
            base_mask = np.full((self.cfg["vocab"],), -np.inf, dtype=np.float32)
            base_mask[ByteTokenizer._OFFSET : ByteTokenizer._OFFSET + 256] = 0.0
            base_mask[tok.EOS] = 0.0
        if all(a is None for a in automatons):
            # Unconstrained batch: run the whole decode on device in
            # DECODE_CHUNK-step dispatches (one fetch per chunk for the
            # entire batch instead of one per token).  Prompt-lookup
            # speculation batches too (per-row drafts/accepts/offsets) under
            # the same gating as the stream path: greedy by default,
            # RAGLITE_TPU_SPECULATE=always for sampled, =0 off.
            spec_mode = os.environ.get("RAGLITE_TPU_SPECULATE", "auto")
            speculate = spec_mode != "0" and (
                temperature == 0.0 or spec_mode in ("1", "always")
            )
            hist0 = None
            if speculate:
                hist0 = np.full((bpad, max_total), tok.PAD, dtype=np.int32)
                hist0[:, :pad] = batch_ids
            return self._generate_batch_device(
                cache,
                cache_lens,
                last_dev,
                n,
                bpad,
                max_new_tokens=max_new_tokens,
                logits_mask=jnp.asarray(base_mask),
                temperature=temperature,
                top_p=top_p,
                top_k=top_k,
                min_p=min_p,
                seed=seed,
                hist=hist0,
                hist_lens=lens if speculate else None,
                speculate=speculate,
            )
        last_logits = np.asarray(last_dev)

        def byte_mask(automaton) -> np.ndarray:
            m = np.full((self.cfg["vocab"],), -np.inf, dtype=np.float32)
            idx = np.fromiter(
                (b + ByteTokenizer._OFFSET for b in automaton.allowed_bytes()),
                dtype=np.int64,
            )
            if idx.size:
                m[idx] = 0.0
            if automaton.can_end():
                m[tok.EOS] = 0.0
            return m

        rng = np.random.default_rng(seed)
        outputs: list[list[int]] = [[] for _ in range(n)]
        done = np.zeros(bpad, dtype=bool)
        done[n:] = True  # dummy padding rows never generate
        step_tokens = np.full((bpad,), tok.PAD, dtype=np.int32)
        for _ in range(max_new_tokens):
            for i in range(n):
                if done[i]:
                    continue
                automaton = automatons[i]
                mask = byte_mask(automaton) if automaton is not None else base_mask
                token = self._sample_host(
                    last_logits[i] + mask, temperature=temperature, top_p=top_p,
                    top_k=top_k, min_p=min_p, rng=rng,
                )
                if token in self._stop_ids:
                    done[i] = True
                    continue
                outputs[i].append(token)
                step_tokens[i] = token
                if automaton is not None and token >= ByteTokenizer._OFFSET:
                    automaton.feed(token - ByteTokenizer._OFFSET)
                    if automaton.done():
                        done[i] = True
            if done.all():
                break
            logits_dev, cache = _jax_forward_step_batch(
                self.model, self.params, jnp.asarray(step_tokens), cache, cache_lens
            )
            last_logits = np.asarray(logits_dev)
            cache_lens = cache_lens + 1
        for i in range(n):
            automaton = automatons[i]
            if automaton is not None and not automaton.done():
                outputs[i].extend(
                    byte + ByteTokenizer._OFFSET for byte in automaton.completion_bytes()
                )
        return outputs

    def _generate_batch_device(  # noqa: PLR0913
        self,
        cache,
        cache_lens,
        first_logits,
        n: int,
        bpad: int,
        *,
        max_new_tokens: int,
        logits_mask,
        temperature: float,
        top_p: float,
        top_k: int,
        min_p: float,
        seed: int,
        hist: np.ndarray | None = None,
        hist_lens: np.ndarray | None = None,
        speculate: bool = False,
    ) -> list[list[int]]:
        """Batched on-device decode: chunked while_loop dispatches shared by
        the whole batch; dummy padding rows start done.  With ``speculate``,
        each chunk runs batched prompt-lookup speculation — rows accept
        drafts at their own rates and emit variable token counts per chunk,
        so per-row budgets are tracked host-side."""
        stops = self._stop_ids_device()
        key = jax.random.PRNGKey(seed)
        done = jnp.asarray(np.arange(bpad) >= n)
        outputs: list[list[int]] = [[] for _ in range(n)]
        finished = np.zeros(n, dtype=bool)
        last = first_logits
        if speculate and hist is not None:
            from raglite_tpu.models.speculative import speculate_chunk_device

            hist_dev = jnp.asarray(hist, jnp.int32)
            hl = jnp.asarray(hist_lens, jnp.int32)
            reject = jnp.full((bpad,), -1, jnp.int32)
            while not finished.all():
                (
                    out, cache, cache_lens, last, reject, done, key,
                    hist_dev, hl, _,
                ) = speculate_chunk_device(
                    self.model,
                    cache,
                    self.params,
                    cache_lens,
                    last,
                    reject,
                    logits_mask,
                    done,
                    stops,
                    key,
                    hist_dev,
                    hl,
                    num_tokens=DECODE_CHUNK,
                    draft_len=SPEC_DRAFT_LEN,
                    pad_id=int(self.tokenizer.PAD),
                    temperature=float(temperature),
                    top_p=float(top_p),
                    top_k=int(top_k),
                    min_p=float(min_p),
                )
                tokens = np.asarray(out[:n])
                done_np = np.asarray(done[:n])
                progressed = False
                for i in range(n):
                    if finished[i]:
                        continue
                    room = max_new_tokens - len(outputs[i])
                    for token in tokens[i][:room]:
                        if token == _NO_TOKEN:
                            break
                        outputs[i].append(int(token))
                        progressed = True
                    if done_np[i] or len(outputs[i]) >= max_new_tokens:
                        finished[i] = True
                if not progressed:  # every live row emitted nothing: stuck
                    break
                # Rows at their budget stop consuming; mark them done on
                # device so they stop burning verify work too.
                if finished.all():
                    break
                done = done | jnp.asarray(
                    np.concatenate([finished, np.ones(bpad - n, bool)])
                )
            return outputs
        emitted = 0
        while emitted < max_new_tokens and not finished.all():
            out, cache, cache_lens, last, done, key = _decode_chunk_device(
                self.model,
                cache,
                self.params,
                cache_lens,
                last,
                logits_mask,
                done,
                stops,
                key,
                num_steps=DECODE_CHUNK,
                temperature=float(temperature),
                top_p=float(top_p),
                top_k=int(top_k),
                min_p=float(min_p),
            )
            tokens = np.asarray(out[:n])
            budget = max_new_tokens - emitted
            for i in range(n):
                if finished[i]:
                    continue
                for token in tokens[i][:budget]:
                    if token == _NO_TOKEN:
                        finished[i] = True
                        break
                    outputs[i].append(int(token))
            emitted += min(DECODE_CHUNK, budget)
            finished |= np.asarray(done[:n])
        return outputs

    def complete_batch(
        self,
        messages_batch: list[list[dict[str, Any]]],
        *,
        response_format: dict[str, Any] | None = None,
        **sampling: Any,
    ) -> list["ChatResponse"]:
        """Batched :meth:`complete` (no tools): B conversations share one
        prefill + one forward per decode step.  Parity target:
        ``litellm.batch_completion`` in the reference's metadata expansion
        (_extract.py:196-205)."""
        from raglite_tpu.models.llm import ChatResponse

        prompts = [self._format_messages(m, None) for m in messages_batch]
        automatons = None
        if response_format and self._byte_level:
            from raglite_tpu.models.schema_automaton import SchemaAutomaton

            schema = (response_format.get("json_schema") or {}).get("schema")
            if schema:
                automatons = [SchemaAutomaton(schema) for _ in prompts]
            elif response_format.get("type") in ("json_object", "json_schema"):
                automatons = [JsonAutomaton() for _ in prompts]
        token_lists = self._generate_batch(
            prompts,
            max_new_tokens=_max_new(sampling, 512),
            temperature=float(sampling.get("temperature", 0.0)),
            top_p=float(sampling.get("top_p", 1.0)),
            top_k=int(sampling.get("top_k", 0)),
            min_p=float(sampling.get("min_p", 0.0)),
            automatons=automatons,
            seed=int(sampling.get("seed", 0)),
        )
        return [
            ChatResponse(content="".join(self._decode_stream(iter(tokens))) or None)
            for tokens in token_lists
        ]

    # --- LLM protocol -----------------------------------------------------

    def _decode_stream(self, tokens: Iterator[int]) -> Iterator[str]:
        """Incremental UTF-8 decode of generated tokens."""
        if not self._byte_level:
            # BPE path: decode the growing id list and emit the text delta
            # (multi-token unicode sequences resolve as they complete).
            ids: list[int] = []
            emitted = ""
            for token in tokens:
                ids.append(token)
                text = self.tokenizer.decode(ids)
                if text.endswith("�"):  # incomplete utf-8 sequence
                    continue
                if len(text) > len(emitted):
                    yield text[len(emitted) :]
                    emitted = text
            return
        buffer = bytearray()
        for token in tokens:
            if token >= ByteTokenizer._OFFSET:
                buffer.append(token - ByteTokenizer._OFFSET)
                try:
                    yield buffer.decode("utf-8")
                    buffer.clear()
                except UnicodeDecodeError:
                    continue  # wait for more continuation bytes
        if buffer:
            yield buffer.decode("utf-8", errors="replace")

    def _forced_tool_call(self, messages, tools, tool_choice, sampling):
        """Two-phase grammar-forced tool call (the reference forces the
        decision with a GBNF grammar, then the arguments with the tool's
        JSON-schema grammar, _chatml_function_calling.py:411-525)."""
        import json as _json
        import uuid as _uuid

        from raglite_tpu.models.llm import ToolCall
        from raglite_tpu.models.schema_automaton import SchemaAutomaton

        by_name = {t["function"]["name"]: t for t in tools}
        if not self._byte_level:
            # Pretrained BPE models: prompt-forced instead of grammar-forced.
            name0 = (
                tool_choice.get("function", {}).get("name")
                if isinstance(tool_choice, dict)
                else next(iter(by_name))
            )
            tool = by_name.get(name0) or next(iter(by_name.values()))
            prompt = self._format_messages(messages, tools) + (
                f'<tool_call>{{"name": "{tool["function"]["name"]}", "arguments": '
            )
            tokens = self._generate_tokens(
                prompt,
                max_new_tokens=_max_new(sampling, 128),
                temperature=float(sampling.get("temperature", 0.0)),
            )
            raw = "".join(self._decode_stream(tokens)).split("</tool_call>")[0].strip()
            try:
                _json.loads(raw)
                arguments = raw
            except ValueError:
                arguments = "{}"
            return ToolCall(
                id=f"call_{_uuid.uuid4().hex[:8]}",
                name=tool["function"]["name"],
                arguments=arguments,
            )
        if isinstance(tool_choice, dict):
            name = tool_choice.get("function", {}).get("name") or next(iter(by_name))
        elif len(by_name) == 1:
            name = next(iter(by_name))
        else:
            # Phase 1: constrained choice of the tool name.
            prompt = self._format_messages(messages, tools) + "Choose a tool.\n"
            chooser = SchemaAutomaton(
                {"type": "object", "properties": {"name": {"enum": list(by_name)}}}
            )
            tokens = self._generate_tokens(
                prompt, max_new_tokens=64, temperature=0.0, automaton=chooser
            )
            choice = "".join(self._decode_stream(tokens))
            name = _json.loads(choice).get("name", next(iter(by_name)))
        tool = by_name.get(name) or next(iter(by_name.values()))
        # Phase 2: arguments constrained by the tool's parameter schema.
        schema = tool["function"].get("parameters") or {"type": "object"}
        prompt = self._format_messages(messages, tools) + f"Arguments for {name}:\n"
        tokens = self._generate_tokens(
            prompt,
            max_new_tokens=_max_new(sampling, 128),
            temperature=float(sampling.get("temperature", 0.0)),
            json_constrained=True,
            automaton=SchemaAutomaton(schema),
        )
        arguments = "".join(self._decode_stream(tokens))
        return ToolCall(id=f"call_{_uuid.uuid4().hex[:8]}", name=name, arguments=arguments)

    def stream(self, messages, *, tools=None, tool_choice=None, **sampling):
        from raglite_tpu.models.llm import ToolCall

        if tool_choice == "none":
            # Reference semantics (_chatml_function_calling.py): "none" must
            # produce zero tool calls — no tool manifest, no parsing.
            tools = None
        forced = tools and (
            tool_choice == "required" or isinstance(tool_choice, dict)
        )
        if forced:
            yield self._forced_tool_call(messages, tools, tool_choice, sampling)
            return
        prompt = self._format_messages(messages, tools)
        max_new = _max_new(sampling, 128)
        text_parts: list[str] = []
        # Incremental tool-tag filter: content inside <tool_call>...</tool_call>
        # must never reach the text stream (it is parsed into ToolCall items
        # below), content outside it must ALL stream — including text after a
        # tool call — and a partial "<tool_call" at the buffer tail is held
        # back until it either completes or turns out to be plain text.
        OPEN, CLOSE = "<tool_call>", "</tool_call>"
        pending = ""
        in_tool = False

        def drain(pending: str, in_tool: bool, final: bool):
            emit = []
            while True:
                if in_tool:
                    end = pending.find(CLOSE)
                    if end < 0:
                        if final:
                            pending = ""
                        break
                    pending = pending[end + len(CLOSE) :]
                    in_tool = False
                    continue
                start = pending.find(OPEN)
                if start >= 0:
                    emit.append(pending[:start])
                    pending = pending[start + len(OPEN) :]
                    in_tool = True
                    continue
                # Hold back a tail that could still become the opening tag.
                hold = 0
                if not final:
                    for k in range(min(len(OPEN) - 1, len(pending)), 0, -1):
                        if pending.endswith(OPEN[:k]):
                            hold = k
                            break
                cut = len(pending) - hold
                emit.append(pending[:cut])
                pending = pending[cut:]
                break
            return "".join(emit), pending, in_tool

        for piece in self._decode_stream(
            self._generate_tokens(
                prompt,
                max_new_tokens=max_new,
                temperature=float(sampling.get("temperature", 0.0)),
                top_p=float(sampling.get("top_p", 1.0)),
                top_k=int(sampling.get("top_k", 0)),
                min_p=float(sampling.get("min_p", 0.0)),
                seed=int(sampling.get("seed", 0)),
            )
        ):
            text_parts.append(piece)
            if tools:
                pending += piece
                emit, pending, in_tool = drain(pending, in_tool, final=False)
                if emit:
                    yield emit
            else:
                yield piece
        if not tools:
            return
        emit, pending, in_tool = drain(pending, in_tool, final=True)
        if emit:
            yield emit
        joined = "".join(text_parts)
        # Parse any completed tool calls (reference parses the model's
        # function_calls block the same way, _chatml_function_calling.py).
        import json as _json
        import re as _re
        import uuid as _uuid

        for m in _re.finditer(r"<tool_call>(.*?)</tool_call>", joined, flags=_re.S):
            try:
                call = _json.loads(m.group(1))
                yield ToolCall(
                    id=f"call_{_uuid.uuid4().hex[:8]}",
                    name=str(call.get("name", "")),
                    arguments=_json.dumps(call.get("arguments", {})),
                )
            except (ValueError, TypeError):
                continue

    def complete(self, messages, *, tools=None, tool_choice=None, response_format=None, **sampling):
        from raglite_tpu.models.llm import ChatResponse, ToolCall

        if response_format is not None and not self._byte_level:
            # BPE models: schema-in-prompt (the extract layer's fallback
            # path, reference: _extract.py:36-63) — no byte-level automaton.
            import json as _json

            schema = (response_format or {}).get("json_schema", {}).get("schema")
            prompt = self._format_messages(messages, tools)
            prompt += (
                "Respond ONLY with a JSON object"
                + (f" matching this schema:\n{_json.dumps(schema)}" if schema else "")
                + "\n"
            )
            tokens = self._generate_tokens(
                prompt,
                max_new_tokens=_max_new(sampling, 256),
                temperature=float(sampling.get("temperature", 0.0)),
            )
            return ChatResponse(content="".join(self._decode_stream(tokens)))
        if response_format is not None:
            prompt = self._format_messages(messages, tools)
            prompt += "Respond with a JSON object.\n"
            # A json_schema response format compiles to a schema automaton so
            # output conforms to the SPECIFIC schema, not just JSON — the
            # reference's json_schema_to_gbnf equivalent
            # (_chatml_function_calling.py:483-501).
            schema = None
            if isinstance(response_format, dict):
                schema = response_format.get("json_schema", {}).get("schema")
            automaton = None
            if schema:
                from raglite_tpu.models.schema_automaton import SchemaAutomaton

                automaton = SchemaAutomaton(schema)
            tokens = self._generate_tokens(
                prompt,
                max_new_tokens=_max_new(sampling, 256),
                temperature=float(sampling.get("temperature", 0.0)),
                json_constrained=True,
                automaton=automaton,
            )
            content = "".join(self._decode_stream(tokens))
            return ChatResponse(content=content)
        parts: list[str] = []
        tool_calls: list[ToolCall] = []
        for item in self.stream(messages, tools=tools, tool_choice=tool_choice, **sampling):
            if isinstance(item, ToolCall):
                tool_calls.append(item)
            else:
                parts.append(item)
        return ChatResponse(content="".join(parts) or None, tool_calls=tool_calls)


#: Tokens emitted per device decode dispatch.  Each dispatch runs up to
#: DECODE_CHUNK forward+sample steps in ONE on-device while_loop, so the
#: host round-trip cost (28-32 ms through the dev tunnel, ~0.1 ms on a
#: production host) is paid once per chunk instead of once per token — the
#: round-2 loop fetched logits to the host EVERY token, capping B=1 decode
#: at ~35 tokens/s through the tunnel regardless of model size.  Must
#: divide the cache-length buckets (64-multiples).
DECODE_CHUNK = 32

#: Sentinel in device decode output for "row was already done".
_NO_TOKEN = -1

#: Draft tokens verified per speculative forward (window = draft + 1).  At
#: B=1 the forward is weight-streaming bound, so an 8-token window costs
#: the same HBM traffic as one token; larger windows raise the ceiling on
#: copy-heavy text but waste nothing on misses either way.
SPEC_DRAFT_LEN = int(os.environ.get("RAGLITE_TPU_SPEC_K", "7"))
if not 1 <= SPEC_DRAFT_LEN <= DECODE_CHUNK - 1:
    # A draft length >= DECODE_CHUNK would make every speculative row
    # freeze immediately (no window fits the chunk budget), so generation
    # would silently return empty via the no-progress guard — fail loudly
    # at import instead.
    msg = (
        f"RAGLITE_TPU_SPEC_K={SPEC_DRAFT_LEN} is invalid: speculative draft "
        f"length must be in [1, {DECODE_CHUNK - 1}] (window of draft+1 "
        f"tokens must fit a {DECODE_CHUNK}-token decode chunk)"
    )
    raise ValueError(msg)


@partial(
    jax.jit,
    static_argnames=("model", "num_steps", "temperature", "top_p", "top_k", "min_p"),
    donate_argnums=(1,),
)
def _decode_chunk_device(  # noqa: PLR0913
    model: DecoderModel,
    cache,
    params,
    cache_lens,  # [B] int32
    last_logits,  # [B, V] fp32 — logits the next token is sampled from
    logits_mask,  # [V] fp32 additive mask (0 / -inf), applied every step
    done,  # [B] bool
    stop_ids,  # [K] int32 (pad with -7)
    key,  # jax PRNG key
    *,
    num_steps: int,
    temperature: float,
    top_p: float,
    top_k: int,
    min_p: float,
):
    """Up to ``num_steps`` decode iterations fully on device: sample (with
    the same temperature/top-k/top-p/min-p semantics as the host sampler),
    stop-token check, KV append, next forward — one dispatch, one fetch.
    Grammar-constrained decoding cannot use this path (its byte masks are
    host-side automatons); unconstrained chat/extraction generation does.

    Returns (tokens [B, num_steps] with _NO_TOKEN after each row's stop,
    cache, cache_lens, last_logits, done, key).
    """
    B = last_logits.shape[0]

    def sample(logits, sub):
        logits = logits + logits_mask[None, :]
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
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
            # Keep tokens whose PRECEDING mass is below top_p (host parity).
            keep = (csum - sorted_probs) < top_p
            kept_min = jnp.min(
                jnp.where(keep, sorted_probs, jnp.inf), axis=-1, keepdims=True
            )
            probs = jnp.where(probs >= kept_min, probs, 0.0)
        return jax.random.categorical(
            sub, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1
        ).astype(jnp.int32)

    def cond(carry):
        step, done = carry[0], carry[5]
        return (step < num_steps) & ~jnp.all(done)

    def body(carry):
        step, cache, cache_lens, logits, out, done, key = carry
        key, sub = jax.random.split(key)
        token = sample(logits, sub)
        is_stop = jnp.any(token[:, None] == stop_ids[None, :], axis=1)
        done_next = done | is_stop
        out = out.at[:, step].set(jnp.where(done_next, _NO_TOKEN, token))
        feed = jnp.where(done_next, 0, token)
        new_logits, cache = model.forward(params, feed[:, None], cache, cache_lens)
        cache_lens = cache_lens + jnp.where(done_next, 0, 1).astype(cache_lens.dtype)
        return (step + 1, cache, cache_lens, new_logits[:, -1], out, done_next, key)

    out0 = jnp.full((B, num_steps), _NO_TOKEN, jnp.int32)
    carry = (jnp.asarray(0, jnp.int32), cache, cache_lens, last_logits, out0, done, key)
    _, cache, cache_lens, last_logits, out, done, key = jax.lax.while_loop(
        cond, body, carry
    )
    return out, cache, cache_lens, last_logits, done, key


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _jax_forward_one(model: DecoderModel, params, token: int, cache, cache_len: int):
    """Single-token decode forward; returns last-position logits [V].

    The KV cache buffer is donated: the dynamic_update_slice happens
    in place instead of copying the whole cache every step."""
    ids = jnp.asarray([[token]], dtype=jnp.int32)
    logits, cache = model.forward(params, ids, cache, jnp.asarray(cache_len, jnp.int32))
    return logits[0, -1], cache


@partial(jax.jit, static_argnames=("model",), donate_argnums=(3,))
def _jax_forward_step_batch(
    model: DecoderModel, params, tokens: jax.Array, cache, cache_lens: jax.Array
):
    """One decode step for a BATCH of sequences at per-row cache offsets;
    returns last-position logits [B, V].  The cache is donated (in-place
    scatter)."""
    logits, cache = model.forward(params, tokens[:, None], cache, cache_lens)
    return logits[:, -1], cache
