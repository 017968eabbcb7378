"""Tensor-parallel generation: shard the decoder over a ``model`` mesh axis.

The reference's generation is a single llama.cpp process — it has no story
for models bigger than one device.  Here the decoder's weights shard
Megatron-style over a ``model`` mesh axis and the SAME jitted forward /
decode-loop programs run under GSPMD, with XLA inserting the two
all-reduces per layer (after the attention output projection and the MLP
down projection) over ICI:

- ``wq``/``wk``/``wv`` (and biases) shard on the output axis -> each device
  owns ``heads/tp`` query heads and ``kv_heads/tp`` KV groups; the KV cache
  shards on its KV-head axis, so cache reads/writes are fully local;
- ``wo`` shards on the input axis (row-parallel) -> psum;
- ``w_gate``/``w_up`` column-parallel, ``w_down`` row-parallel -> psum;
- ``lm_head`` column-parallel -> logits shard on the vocab axis and the
  sampler's argmax/top-k runs distributed.

Embeddings and norms replicate (tiny next to the matmul weights).

Requires ``kv_heads % tp == 0`` (the natural GQA limit — v5e pods give
tp in {2, 4, 8} for the 8-KV-group presets).  The @int8 fused weights
concatenate q/k/v columns, which a contiguous GSPMD split would shard
across the WRONG boundaries — quantized models refuse to shard rather than
silently mis-decompose.

Validated on the virtual CPU mesh (tests/test_tp_decoder.py): sharded
forward logits match single-device, and the production decode loop runs
sharded end-to-end.  On real multi-chip hardware the Pallas decode-
attention kernel would need a shard_map wrapper; under TP the model falls
back to the XLA attention path (the cache stays local either way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["decoder_param_specs", "shard_chat_llm", "tp_mesh"]


def tp_mesh(tp: int = 0, *, axis: str = "model") -> Mesh:
    """A 1-D ``model`` mesh over the first ``tp`` local devices (0 = all)."""
    devices = jax.devices()
    n = tp or len(devices)
    return Mesh(devices[:n], (axis,))


def decoder_param_specs(params: dict, *, axis: str = "model") -> dict:
    """PartitionSpec pytree for :class:`DecoderModel` params (see module
    docstring for the placement).  Unknown leaves replicate."""
    col, row = P(None, axis), P(axis, None)
    by_name = {
        "wq": col, "wk": col, "wv": col,
        "bq": P(axis), "bk": P(axis), "bv": P(axis),
        "wo": row,
        "w_gate": col, "w_up": col, "w_down": row,
    }
    specs: dict = {}
    for key, value in params.items():
        if key == "layers":
            specs["layers"] = [
                {k: by_name.get(k, P()) for k in layer} for layer in value
            ]
        elif key == "lm_head":
            specs[key] = col
        else:
            specs[key] = P()
    return specs


def _check_divisible(cfg: dict, tp: int) -> None:
    for field in ("heads", "kv_heads"):
        if cfg[field] % tp:
            msg = (
                f"tensor parallelism {tp} must divide {field}={cfg[field]} "
                "(each device owns whole attention groups)"
            )
            raise ValueError(msg)
    if cfg["d_ff"] % tp:
        msg = f"tensor parallelism {tp} must divide d_ff={cfg['d_ff']}"
        raise ValueError(msg)


def shard_chat_llm(llm, mesh: Mesh | None = None, *, tp: int = 0):
    """Place a :class:`JaxChatLLM`'s weights for tensor-parallel generation.

    Returns ``llm`` (mutated in place): params re-placed with TP shardings,
    KV caches created sharded on their KV-head axis, and the Pallas decode-
    attention kernel disabled in favor of the GSPMD XLA path.  All public
    generation APIs (``complete``, ``stream``, ``complete_batch``) then run
    tensor-parallel transparently — the jitted programs recompile for the
    sharded layout on first use.
    """
    if getattr(llm, "quantized", False):
        msg = "@int8 fused weights cannot TP-shard (fused q/k/v column split); shard the full-precision model"
        raise ValueError(msg)
    mesh = mesh or tp_mesh(tp)
    axis = mesh.axis_names[0]
    _check_divisible(llm.cfg, mesh.shape[axis])
    specs = decoder_param_specs(llm.params, axis=axis)
    llm.params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        llm.params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    # Cache [B, KVH, hd, S] shards on KVH, matching the k/v projections.
    llm.model.cache_sharding = NamedSharding(mesh, P(None, axis, None, None))
    llm.model.use_pallas_decode = False  # XLA attention path under GSPMD
    llm.tp_mesh = mesh
    return llm
