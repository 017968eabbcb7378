"""int8 quantized matmul for the decode hot loop.

Decode (T=1) is weight-streaming bound: every generated token reads every
matmul weight of the model out of HBM once (the reference's equivalent hot
loop is llama.cpp's quantized GEMV — /root/reference/src/raglite/
_chatml_function_calling.py:527-580 drives it).  Storing the weights int8
with per-output-channel scales halves that traffic.

Lowering choice (all measured on v5e, lm_head-shaped GEMV 1024x151936,
slope-timed over serialized lax.scan chains):

- bf16 baseline:              420 us  (741 GB/s — near the ~819 GB/s roofline)
- dequant-to-bf16 inside a
  Pallas kernel (W8A16):      565 us  (275 GB/s — VPU int8->bf16 convert
                                       bound: one elementwise convert per
                                       weight element beats the MXU to the
                                       bottleneck)
- ``x @ q.astype(bf16)``
  in XLA (W8A16):             ~1.4x   (materializes a bf16 weight copy in
                                       HBM: read-int8 + write-bf16 + read-bf16)
- native s8 x s8 dot, s32
  accumulation (W8A8):        213 us  (729 GB/s, 1.97x — HBM roofline; a
                                       hand-written Pallas s8 kernel matched
                                       it at 214 us, so plain XLA wins on
                                       simplicity)

So the shipped path is **W8A8 with dynamic per-row activation scales**: the
MXU consumes the int8 weight blocks directly (no dequant pass over the
weight), activations are quantized per token row at runtime (they are tiny
in the decode regime), and the int32 accumulator is rescaled by
``sx[m] * sw[n]`` in fp32.  Weight-only precision (W8A16) remains available
as ``int8_matmul_xla`` and is what prefill and CPU route to — prefill is
MXU-compute bound, so the one-off dequant copy amortizes over the sequence
and keeps full activation precision where it is free.

Layout: weights are [K, N] (in-features major, matching ``x @ w``), scales
are per-output-channel [N].  Quantization pads K to 32 (int8 sublane tile)
and N to 128 (lane tile); callers slice the padded output back to the
logical width.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from raglite_tpu.utils.padding import round_up as _round_up

__all__ = [
    "QUANT_KINDS",
    "QuantLinear",
    "QuantLinearFused",
    "dequantize_linear",
    "int8_matmul_w8a8",
    "int8_matmul_xla",
    "quant_linear_apply",
    "quant_linear_apply_fused",
    "quantize_linear_int8",
    "quantize_rows_int8",
]

QUANT_KINDS = ("int8",)

#: int32 accumulation overflows past K * 127 * 127 = 2^31; no model here is
#: within two orders of magnitude of this, but guard the invariant.
_MAX_K = (2**31) // (127 * 127)


def quantize_linear_int8(w: jax.Array | np.ndarray) -> dict:
    """Symmetric per-output-channel int8 quantization of a [K, N] weight.

    Returns ``{"q8": int8 [Kp, Np], "s8": f32 [1, Np]}`` with
    ``w ≈ q8[:K, :N] * s8[0, :N]``, padded to TPU tile multiples (K to 32,
    N to 128) so the hot path never re-pads the large operand.
    """
    w = jnp.asarray(w)
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    K, N = q.shape
    if K > _MAX_K:
        msg = f"int8 matmul reduction dim {K} would overflow int32 accumulation"
        raise ValueError(msg)
    Kp, Np = _round_up(K, 32), _round_up(N, 128)
    if (Kp, Np) != (K, N):
        q = jnp.pad(q, ((0, Kp - K), (0, Np - N)))
        s = jnp.pad(s, (0, Np - N), constant_values=1.0)
    return {"q8": q, "s8": s[None, :]}


def dequantize_linear(wq: dict, n_out: int, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the logical [K, n_out] weight (tests / interop)."""
    return (wq["q8"].astype(jnp.float32) * wq["s8"])[:, :n_out].astype(dtype)


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8 quantization of activations [M, K].

    Returns ``(xq int8 [M, K], sx f32 [M, 1])`` with ``x ≈ xq * sx``.
    Cheap in the decode regime (M = batch rows), recomputed every call.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    sx = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_matmul_w8a8(x: jax.Array, q8: jax.Array, s8: jax.Array) -> jax.Array:
    """``x @ (q8 * s8)`` via a native s8 x s8 MXU dot; returns [M, Np] f32.

    The weight is consumed int8 straight from HBM (the 2x traffic win);
    activations are quantized per row on the fly and the int32 accumulator
    is rescaled in fp32.
    """
    K = x.shape[1]
    if K != q8.shape[0]:
        x = jnp.pad(x, ((0, 0), (0, q8.shape[0] - K)))
    xq, sx = quantize_rows_int8(x)
    acc = jax.lax.dot_general(
        xq, q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx * s8


def int8_matmul_xla(x: jax.Array, q8: jax.Array, s8: jax.Array) -> jax.Array:
    """W8A16 path (CPU, prefill): dequant copy + matmul; returns [M, Np] f32.

    Keeps full activation precision; the bf16 weight copy it materializes
    is a one-off cost the MXU-bound prefill amortizes over the sequence.
    """
    K = x.shape[1]
    if K != q8.shape[0]:
        x = jnp.pad(x, ((0, 0), (0, q8.shape[0] - K)))
    y = jnp.einsum(
        "mk,kn->mn",
        x,
        q8.astype(x.dtype),
        preferred_element_type=jnp.float32,
        # f32 activations need full f32 passes (the MXU's default single-
        # bf16 pass loses ~2^-8 on the operand); bf16 runs natively anyway.
        precision=(
            jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        ),
    )
    return y * s8


@jax.tree_util.register_pytree_node_class
class QuantLinear:
    """An int8 weight-only linear weight living in a params pytree.

    Drop-in leaf-group replacing a dense ``[K, n_out]`` matrix: the int8
    blocks and scales are traced children (so jit/donation/sharding see
    them), while the logical output width is static aux data (it drives
    slicing, which must be trace-time constant).
    """

    def __init__(self, q8: jax.Array, s8: jax.Array, n_out: int) -> None:
        self.q8, self.s8, self.n_out = q8, s8, int(n_out)

    def tree_flatten(self):
        return (self.q8, self.s8), self.n_out

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @classmethod
    def from_dense(cls, w: jax.Array) -> "QuantLinear":
        wq = quantize_linear_int8(w)
        return cls(wq["q8"], wq["s8"], w.shape[1])

    def dense(self, dtype=jnp.bfloat16) -> jax.Array:
        return dequantize_linear({"q8": self.q8, "s8": self.s8}, self.n_out, dtype)


@jax.tree_util.register_pytree_node_class
class QuantLinearFused:
    """Several same-input QuantLinears fused into ONE int8 matmul.

    The decode step is dominated not just by HBM bytes but by op COUNT: at
    B=1 each of the 7 per-layer matmuls pays its own activation-quantize,
    dot dispatch, and rescale.  Weights that consume the same activation
    (q/k/v off the attention norm; gate/up off the MLP norm) concatenate on
    the output axis — per-output-channel scales make the fused quantization
    bit-identical to quantizing each part separately — so one quantize, one
    MXU dot, and one rescale produce all the parts, which are then sliced
    back out (a trivial [rows, N] slice).
    """

    def __init__(self, q8: jax.Array, s8: jax.Array, n_outs: tuple[int, ...]) -> None:
        self.q8, self.s8, self.n_outs = q8, s8, tuple(int(n) for n in n_outs)

    def tree_flatten(self):
        return (self.q8, self.s8), self.n_outs

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @classmethod
    def from_dense(cls, ws: list[jax.Array]) -> "QuantLinearFused":
        n_outs = tuple(int(w.shape[1]) for w in ws)
        wq = quantize_linear_int8(jnp.concatenate(ws, axis=1))
        return cls(wq["q8"], wq["s8"], n_outs)


#: Row counts up to this take the W8A8 native-int8 dot on TPU (decode —
#: weight-streaming bound, activation-quant noise on a handful of rows);
#: more rows (prefill) are MXU-bound and keep W8A16 activation precision.
_W8A8_MAX_ROWS = 32


def _routed_matmul(x2: jax.Array, q8: jax.Array, s8: jax.Array, rows: int) -> jax.Array:
    mode = os.environ.get("RAGLITE_TPU_W8A8", "auto")
    use_w8a8 = mode == "1" or (
        mode != "0" and rows <= _W8A8_MAX_ROWS and jax.default_backend() == "tpu"
    )
    if use_w8a8:
        return int8_matmul_w8a8(x2, q8, s8)
    return int8_matmul_xla(x2, q8, s8)


def quant_linear_apply_fused(
    x: jax.Array, w: QuantLinearFused
) -> tuple[jax.Array, ...]:
    """One quantize + one int8 dot, sliced into ``len(w.n_outs)`` outputs
    (each [..., n_i] in ``x``'s dtype)."""
    lead, K = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    y = _routed_matmul(x.reshape(rows, K), w.q8, w.s8, rows).astype(x.dtype)
    outs, off = [], 0
    for n in w.n_outs:
        outs.append(y[:, off : off + n].reshape(*lead, n))
        off += n
    return tuple(outs)


def quant_linear_apply(x: jax.Array, w: QuantLinear) -> jax.Array:
    """``x @ w`` for a QuantLinear weight; ``x`` is [..., K], output keeps
    ``x``'s dtype (matching the all-bf16 baseline's precision: the MXU
    accumulates fp32 either way and the baseline rounds to bf16 on output).

    Routing: TPU and few rows -> W8A8 native int8 dot (decode); otherwise
    the W8A16 dequant-copy path (prefill, CPU).  ``RAGLITE_TPU_W8A8=1``
    forces W8A8 everywhere, ``=0`` forces W8A16 everywhere.
    """
    lead, K = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    y = _routed_matmul(x.reshape(rows, K), w.q8, w.s8, rows)
    return y[:, : w.n_out].reshape(*lead, w.n_out).astype(x.dtype)
