"""Tensor-parallel generation on the virtual CPU mesh.

The reference's generation is one llama.cpp process (no >1-device story);
parallel/tp_decoder.py shards the JAX decoder Megatron-style over a
``model`` mesh axis.  These tests pin: sharding placement, forward-logits
agreement with the single-device model, the production decode loop running
sharded end-to-end, and the guard rails (GQA divisibility, @int8 refusal).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raglite_tpu.models.decoder import JaxChatLLM
from raglite_tpu.parallel.tp_decoder import (
    decoder_param_specs,
    shard_chat_llm,
    tp_mesh,
)


def test_param_specs_placement():
    llm = JaxChatLLM("tiny")
    specs = decoder_param_specs(llm.params)
    layer = specs["layers"][0]
    assert layer["wq"] == P(None, "model")
    assert layer["wo"] == P("model", None)
    assert layer["w_down"] == P("model", None)
    assert specs["lm_head"] == P(None, "model")
    assert specs["tok_emb"] == P()
    assert layer["attn_norm"] == P()


def test_sharded_forward_matches_single_device():
    single = JaxChatLLM("tiny", seed=11)
    sharded = shard_chat_llm(JaxChatLLM("tiny", seed=11), tp=2)
    assert sharded.tp_mesh.shape["model"] == 2
    # weights really live sharded
    wq = sharded.params["layers"][0]["wq"]
    assert len(wq.sharding.device_set) == 2
    ids = jnp.asarray([[3, 7, 11, 201, 5, 9, 42, 77]], jnp.int32)
    lf, _ = single.model.forward(
        single.params, ids, single.model.init_cache(1, 64), jnp.asarray(0, jnp.int32)
    )
    ls, cache = sharded.model.forward(
        sharded.params, ids, sharded.model.init_cache(1, 64), jnp.asarray(0, jnp.int32)
    )
    lf, ls = np.asarray(lf), np.asarray(ls)
    denom = np.abs(lf).max() + 1e-6
    # bf16 partial sums re-associate across shards; agreement is loose-tol
    assert np.abs(lf - ls).max() / denom < 0.02, np.abs(lf - ls).max() / denom
    # the cache was written on its KV-head shards
    assert len(cache["k"][0].sharding.device_set) == 2


def test_sharded_generation_end_to_end():
    sharded = shard_chat_llm(JaxChatLLM("tiny", seed=3), tp=2)
    msgs = [{"role": "user", "content": "Say something."}]
    text = sharded.complete(msgs, temperature=0.0, max_tokens=16).content
    assert isinstance(text, str)
    outs = sharded.complete_batch(
        [[{"role": "user", "content": "a"}], [{"role": "user", "content": "bb"}]],
        temperature=0.0,
        max_tokens=8,
    )
    assert len(outs) == 2 and all(isinstance(o.content, str) for o in outs)


def test_gqa_divisibility_guard():
    # tiny has heads=4, kv_heads=2: tp=8 divides neither
    with pytest.raises(ValueError, match="must divide"):
        shard_chat_llm(JaxChatLLM("tiny"), tp=8)


def test_quantized_model_refuses_tp():
    with pytest.raises(ValueError, match="int8"):
        shard_chat_llm(JaxChatLLM("tiny@int8"), tp=2)


def test_tp_mesh_axis():
    mesh = tp_mesh(4)
    assert mesh.axis_names == ("model",)
    assert mesh.shape["model"] == 4
