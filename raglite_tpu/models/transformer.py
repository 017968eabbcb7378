"""Functional JAX transformer encoder (XLM-RoBERTa family, e.g. bge-m3).

Replaces the reference's llama.cpp-embedded GGUF encoder
(/root/reference/src/raglite/_litellm.py:96-148) with a first-party model:
parameters are a plain pytree (trivially shardable with
``jax.sharding.NamedSharding`` — see parallel/mesh.py), the forward pass is
pure and jit/pjit-compatible, and all matmuls run in bfloat16 on the MXU
with fp32 accumulation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def _dense_init(key, shape, dtype):
    fan_in = shape[0]
    return (jax.random.normal(key, shape) / np.sqrt(fan_in)).astype(dtype)


def init_encoder_params(cfg: dict, *, seed: int = 0, dtype=jnp.bfloat16) -> Params:
    """Deterministic parameter init for the encoder."""
    d, ff, vocab, max_len = cfg["d_model"], cfg["d_ff"], cfg["vocab"], cfg["max_len"]
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 4 + 8 * cfg["layers"]))
    params: Params = {
        "tok_emb": (jax.random.normal(next(keys), (vocab, d)) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(next(keys), (max_len, d)) * 0.02).astype(dtype),
        "emb_ln_scale": jnp.ones((d,), dtype=jnp.float32),
        "emb_ln_bias": jnp.zeros((d,), dtype=jnp.float32),
        "layers": [],
        "final_ln_scale": jnp.ones((d,), dtype=jnp.float32),
        "final_ln_bias": jnp.zeros((d,), dtype=jnp.float32),
    }
    for _ in range(cfg["layers"]):
        params["layers"].append(
            {
                "wq": _dense_init(next(keys), (d, d), dtype),
                "wk": _dense_init(next(keys), (d, d), dtype),
                "wv": _dense_init(next(keys), (d, d), dtype),
                "wo": _dense_init(next(keys), (d, d), dtype),
                "bq": jnp.zeros((d,), dtype=jnp.float32),
                "bk": jnp.zeros((d,), dtype=jnp.float32),
                "bv": jnp.zeros((d,), dtype=jnp.float32),
                "bo": jnp.zeros((d,), dtype=jnp.float32),
                "attn_ln_scale": jnp.ones((d,), dtype=jnp.float32),
                "attn_ln_bias": jnp.zeros((d,), dtype=jnp.float32),
                "w1": _dense_init(next(keys), (d, ff), dtype),
                "b1": jnp.zeros((ff,), dtype=jnp.float32),
                "w2": _dense_init(next(keys), (ff, d), dtype),
                "b2": jnp.zeros((d,), dtype=jnp.float32),
                "mlp_ln_scale": jnp.ones((d,), dtype=jnp.float32),
                "mlp_ln_bias": jnp.zeros((d,), dtype=jnp.float32),
            }
        )
    return params


def _layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


class EncoderModel:
    """Post-LN bidirectional transformer encoder."""

    def __init__(self, cfg: dict) -> None:
        self.cfg = cfg
        self.ln_eps = float(cfg.get("ln_eps", 1e-5))
        # HF "gelu" is the exact erf form; "gelu_new"/"gelu_pytorch_tanh" are
        # the tanh approximation. Matching matters: with trained biases the
        # two diverge by ~1e-3 per activation, compounding through layers.
        self.gelu_approx = cfg.get("hidden_act", "gelu") in ("gelu_new", "gelu_pytorch_tanh")

    def apply_tokens(self, params: Params, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """ids [B, T] int32, mask [B, T] bool -> hidden states [B, T, d] fp32."""
        cfg = self.cfg
        heads = cfg["heads"]
        d = cfg["d_model"]
        head_dim = d // heads
        x = params["tok_emb"][ids] + params["pos_emb"][: ids.shape[1]][None]
        x = _layer_norm(x, params["emb_ln_scale"], params["emb_ln_bias"], self.ln_eps)
        attn_bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        for layer in params["layers"]:
            # Self-attention (post-LN residual).
            q = jnp.einsum("btd,de->bte", x, layer["wq"], preferred_element_type=jnp.float32) + layer["bq"]
            k = jnp.einsum("btd,de->bte", x, layer["wk"], preferred_element_type=jnp.float32) + layer["bk"]
            v = jnp.einsum("btd,de->bte", x, layer["wv"], preferred_element_type=jnp.float32) + layer["bv"]
            B, T, _ = q.shape
            q = q.reshape(B, T, heads, head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, heads, head_dim).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqe,bhke->bhqk", q, k) / np.sqrt(head_dim) + attn_bias
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhqk,bhke->bhqe", probs, v.astype(x.dtype))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, d)
            attn_out = (
                jnp.einsum("btd,de->bte", ctx, layer["wo"], preferred_element_type=jnp.float32)
                + layer["bo"]
            )
            x = _layer_norm(x + attn_out.astype(x.dtype), layer["attn_ln_scale"], layer["attn_ln_bias"], self.ln_eps)
            # Feed-forward (post-LN residual).
            h = jnp.einsum("btd,df->btf", x, layer["w1"], preferred_element_type=jnp.float32)
            h = jax.nn.gelu(h + layer["b1"], approximate=self.gelu_approx).astype(x.dtype)
            out = jnp.einsum("btf,fd->btd", h, layer["w2"], preferred_element_type=jnp.float32)
            out = out + layer["b2"]
            x = _layer_norm(x + out.astype(x.dtype), layer["mlp_ln_scale"], layer["mlp_ln_bias"], self.ln_eps)
        # Optional final LN (our presets train with one; XLM-R/BERT-family
        # checkpoints have none — an "identity" LN would still re-standardize
        # every token vector, corrupting loaded-checkpoint outputs).
        if "final_ln_scale" in params:
            x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], self.ln_eps)
        return x.astype(jnp.float32)


def save_npz_encoder(path: str, params: Params, cfg: dict, *, dtype=None) -> None:
    """Serialize encoder params as one flat npz (portable, ships in-package
    like models/data/boundary_model.npz; orbax stays the sharded-checkpoint
    path).  Keys: top-level names plus ``layers.<i>.<name>``."""
    import json as _json

    flat: dict[str, np.ndarray] = {}
    for k, v in params.items():
        if k == "layers":
            for i, layer in enumerate(v):
                for name, arr in layer.items():
                    flat[f"layers.{i}.{name}"] = np.asarray(arr)
        else:
            flat[k] = np.asarray(v)
    if dtype is not None:
        # Squeeze storage (fp16 halves the package payload); LN params and
        # biases stay fp32 — they are tiny and numerically sensitive.
        flat = {
            k: (v.astype(dtype) if v.ndim >= 2 else v.astype(np.float32))
            for k, v in flat.items()
        }
    flat["__config__"] = np.frombuffer(_json.dumps(cfg).encode(), dtype=np.uint8)
    np.savez_compressed(path, **flat)


def load_npz_encoder(path: str, *, dtype=jnp.bfloat16):
    """Load an npz written by :func:`save_npz_encoder`.

    Returns ``(cfg, params, None)`` — the tokenizer (if any) lives next to
    the npz as ``tokenizer.json`` and is loaded by the caller.
    """
    import json as _json

    z = np.load(path)
    cfg = _json.loads(bytes(z["__config__"]).decode())
    params: Params = {"layers": [dict() for _ in range(cfg["layers"])]}
    for key in z.files:
        if key == "__config__":
            continue
        arr = z[key]
        target = jnp.asarray(arr, dtype=dtype if arr.ndim >= 2 else jnp.float32)
        if key.startswith("layers."):
            _, idx, name = key.split(".", 2)
            params["layers"][int(idx)][name] = target
        else:
            params[key] = target
    return cfg, params, None


def save_hf_encoder(out_dir: str, params: Params, cfg: dict, *, tokenizer_json: str | None = None) -> str:
    """Write encoder params as a standard HF-layout safetensors checkpoint.

    Inverse of :func:`load_safetensors_encoder`'s weight mapping: BERT-style
    names, 0-based positions, weights transposed back to HF's [out, in]
    convention.  A trained final LayerNorm (our presets have one; classic
    XLM-R/BERT do not) is emitted as ``final_norm.{weight,bias}``, which the
    loader below understands — this makes the export↔load round trip exact
    and is how the "bring your own safetensors encoder" path
    (reference default bge-m3, /root/reference/src/raglite/_config.py:50-64)
    is demonstrated end-to-end in the zero-egress image.

    Storage dtype mirrors the npz convention: fp16 for matrices, fp32 for
    LN params and biases.
    """
    import json
    import os
    import shutil

    from safetensors.numpy import save_file

    def mat(a) -> np.ndarray:
        return np.asarray(jnp.asarray(a, jnp.float32)).astype(np.float16)

    def mat_t(a) -> np.ndarray:
        # HF stores Linear weights [out, in]; a bare .T view is F-contiguous
        # and safetensors serializes the raw buffer, so force a C-order copy.
        return np.ascontiguousarray(mat(a).T)

    def vec(a) -> np.ndarray:
        return np.asarray(jnp.asarray(a, jnp.float32))

    tensors: dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": mat(params["tok_emb"]),
        "embeddings.position_embeddings.weight": mat(params["pos_emb"]),
        "embeddings.LayerNorm.weight": vec(params["emb_ln_scale"]),
        "embeddings.LayerNorm.bias": vec(params["emb_ln_bias"]),
    }
    for i, layer in enumerate(params["layers"]):
        b = f"encoder.layer.{i}."
        tensors[b + "attention.self.query.weight"] = mat_t(layer["wq"])
        tensors[b + "attention.self.key.weight"] = mat_t(layer["wk"])
        tensors[b + "attention.self.value.weight"] = mat_t(layer["wv"])
        tensors[b + "attention.output.dense.weight"] = mat_t(layer["wo"])
        tensors[b + "attention.self.query.bias"] = vec(layer["bq"])
        tensors[b + "attention.self.key.bias"] = vec(layer["bk"])
        tensors[b + "attention.self.value.bias"] = vec(layer["bv"])
        tensors[b + "attention.output.dense.bias"] = vec(layer["bo"])
        tensors[b + "attention.output.LayerNorm.weight"] = vec(layer["attn_ln_scale"])
        tensors[b + "attention.output.LayerNorm.bias"] = vec(layer["attn_ln_bias"])
        tensors[b + "intermediate.dense.weight"] = mat_t(layer["w1"])
        tensors[b + "intermediate.dense.bias"] = vec(layer["b1"])
        tensors[b + "output.dense.weight"] = mat_t(layer["w2"])
        tensors[b + "output.dense.bias"] = vec(layer["b2"])
        tensors[b + "output.LayerNorm.weight"] = vec(layer["mlp_ln_scale"])
        tensors[b + "output.LayerNorm.bias"] = vec(layer["mlp_ln_bias"])
    if "final_ln_scale" in params:
        tensors["final_norm.weight"] = vec(params["final_ln_scale"])
        tensors["final_norm.bias"] = vec(params["final_ln_bias"])

    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    hf_cfg = {
        "model_type": "bert",
        "num_hidden_layers": cfg["layers"],
        "hidden_size": cfg["d_model"],
        "num_attention_heads": cfg["heads"],
        "intermediate_size": cfg["d_ff"],
        "vocab_size": cfg["vocab"],
        "max_position_embeddings": cfg["max_len"],
        "layer_norm_eps": float(cfg.get("ln_eps", 1e-5)),
        "hidden_act": cfg.get("hidden_act", "gelu"),
        "pad_token_id": 0,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)
    if tokenizer_json is not None:
        shutil.copyfile(tokenizer_json, os.path.join(out_dir, "tokenizer.json"))
    return out_dir


def load_safetensors_encoder(path: str, *, dtype=jnp.bfloat16):
    """Load an XLM-R-family HF checkpoint directory into our param layout.

    Expects ``model.safetensors`` plus ``tokenizer.json`` in ``path``.
    Checkpoints with a trailing LayerNorm (``final_norm.{weight,bias}``, as
    written by :func:`save_hf_encoder`) load it; classic XLM-R/BERT layouts
    have none and the forward pass skips the stage.
    """
    import json
    import os

    from safetensors import safe_open

    from raglite_tpu.models.tokenizer import load_tokenizer

    if os.path.isdir(path):
        st_path = os.path.join(path, "model.safetensors")
        cfg_path = os.path.join(path, "config.json")
        tok_path = os.path.join(path, "tokenizer.json")
    else:
        st_path = path
        cfg_path = os.path.join(os.path.dirname(path), "config.json")
        tok_path = os.path.join(os.path.dirname(path), "tokenizer.json")
    with open(cfg_path) as f:
        hf = json.load(f)
    cfg = dict(
        layers=hf["num_hidden_layers"],
        d_model=hf["hidden_size"],
        heads=hf["num_attention_heads"],
        d_ff=hf["intermediate_size"],
        vocab=hf["vocab_size"],
        max_len=hf["max_position_embeddings"],
        ln_eps=hf.get("layer_norm_eps", 1e-5),
        hidden_act=hf.get("hidden_act", "gelu"),
    )
    tensors: dict[str, np.ndarray] = {}
    with safe_open(st_path, framework="np") as f:
        for name in f.keys():  # noqa: SIM118
            tensors[name] = f.get_tensor(name)

    def t(name: str) -> jax.Array:
        return jnp.asarray(tensors[name], dtype=dtype)

    def t32(name: str) -> jax.Array:
        return jnp.asarray(tensors[name], dtype=jnp.float32)

    p = "roberta." if any(k.startswith("roberta.") for k in tensors) else ""
    # XLM-R/RoBERTa checkpoints reserve position rows [0, padding_idx] and
    # assign the first content token position padding_idx+1 (= 2): slice the
    # table so our 0-based `pos_emb[:T]` indexing lines up with HF's
    # create_position_ids_from_input_ids.  BERT-style checkpoints are 0-based.
    pos = np.asarray(tensors[f"{p}embeddings.position_embeddings.weight"])
    if hf.get("model_type") in ("xlm-roberta", "roberta") or hf.get("pad_token_id") == 1:
        pos = pos[hf.get("pad_token_id", 1) + 1 :]
        cfg["max_len"] = pos.shape[0]
    # Fold the (single-type) token_type embedding into every position row —
    # exact, since XLM-R has type_vocab_size == 1.
    tt_name = f"{p}embeddings.token_type_embeddings.weight"
    if tt_name in tensors:
        pos = pos + np.asarray(tensors[tt_name])[0][None, :]
    params: Params = {
        "tok_emb": t(f"{p}embeddings.word_embeddings.weight"),
        "pos_emb": jnp.asarray(pos, dtype=dtype),
        "emb_ln_scale": t32(f"{p}embeddings.LayerNorm.weight"),
        "emb_ln_bias": t32(f"{p}embeddings.LayerNorm.bias"),
        "layers": [],
        # XLM-R/BERT have no final LN: omit the params entirely so
        # apply_tokens skips the stage (a scale-1/bias-0 LN is NOT identity —
        # it would re-standardize each token vector).
    }
    for i in range(cfg["layers"]):
        b = f"{p}encoder.layer.{i}."
        params["layers"].append(
            {
                "wq": t(b + "attention.self.query.weight").T,
                "wk": t(b + "attention.self.key.weight").T,
                "wv": t(b + "attention.self.value.weight").T,
                "wo": t(b + "attention.output.dense.weight").T,
                "bq": t32(b + "attention.self.query.bias"),
                "bk": t32(b + "attention.self.key.bias"),
                "bv": t32(b + "attention.self.value.bias"),
                "bo": t32(b + "attention.output.dense.bias"),
                "attn_ln_scale": t32(b + "attention.output.LayerNorm.weight"),
                "attn_ln_bias": t32(b + "attention.output.LayerNorm.bias"),
                "w1": t(b + "intermediate.dense.weight").T,
                "b1": t32(b + "intermediate.dense.bias"),
                "w2": t(b + "output.dense.weight").T,
                "b2": t32(b + "output.dense.bias"),
                "mlp_ln_scale": t32(b + "output.LayerNorm.weight"),
                "mlp_ln_bias": t32(b + "output.LayerNorm.bias"),
            }
        )
    if f"{p}final_norm.weight" in tensors:
        params["final_ln_scale"] = t32(f"{p}final_norm.weight")
        params["final_ln_bias"] = t32(f"{p}final_norm.bias")
    tokenizer = load_tokenizer(tok_path, required=False)
    return cfg, params, tokenizer
