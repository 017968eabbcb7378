"""A/B the int8 W8A8 decode matmul against the bf16 XLA matmul on TPU.

Decode (T=1) is weight-streaming bound, so the figure of merit is effective
HBM bandwidth: bytes-of-weight / time-per-op.  Timing uses the slope method
(time an on-device lax.scan chain at two rep counts and difference) so the
~27-30 ms tunnel-RPC floor cancels — see bench.py's sync() methodology and
.claude/skills/verify/SKILL.md.  Weights are jit ARGUMENTS, not closures
(closed-over device arrays get baked into the program as constants — a
150 MB compile request for the lm_head weight, rejected by the tunnel
compile service).  The chain carries a non-foldable dependence on each
product (``c += y * 1e-38``, which rounds to zero at runtime but defeats
loop-invariant hoisting; a ``0.0 * y`` term gets constant-folded and the
matmul hoists out of the loop entirely — "measuring" 1900 GB/s).

Only the largest (lm_head) shape has per-op time comfortably above the
tunnel jitter; smaller per-layer matmuls are reported but noisy — the
end-to-end decode A/B lives in scripts/decode_kernel_check.py.

Usage: python scripts/quant_kernel_check.py [--reps 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

# Base-preset decode shapes: MLP up-projection and the lm_head.
SHAPES = [
    (1, 1024, 2816),
    (8, 1024, 2816),
    (1, 1024, 151936),
    (8, 1024, 151936),
]


def sync(x) -> float:
    return float(np.asarray(jax.device_get(x.ravel()[0])))


def chain(fn, reps: int):
    def run(x0, *ws):
        def body(c, _):
            y = fn(c, *ws)
            eps = (y[0, :1] * 1e-38).astype(c.dtype)  # non-foldable serializer
            return c + eps, y[0, 0]

        return jax.lax.scan(body, x0, None, length=reps)[1][-1]

    return jax.jit(run)


def time_op(fn, x, ws, reps: int) -> float:
    lo, hi = chain(fn, reps), chain(fn, 2 * reps)
    sync(lo(x, *ws))
    sync(hi(x, *ws))  # warm both programs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(lo(x, *ws))
        t1 = time.perf_counter()
        sync(hi(x, *ws))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / reps)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=256)
    args = ap.parse_args()

    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raglite_tpu.ops.quant_matmul import int8_matmul_w8a8, quantize_linear_int8

    rng = np.random.default_rng(0)
    for B, K, N in SHAPES:
        w = (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
        wq = quantize_linear_int8(w)
        q8, s8 = jax.device_put(wq["q8"]), jax.device_put(wq["s8"])
        wb = jax.device_put(jnp.asarray(w, jnp.bfloat16))
        x = jax.device_put(jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16))
        y = np.asarray(int8_matmul_w8a8(x, q8, s8))[:, :N]
        real = np.asarray(x, np.float32) @ w
        err = float(np.abs(y - real).max() / (np.abs(real).max() + 1e-9))
        t_bf = time_op(lambda c, w_: (c @ w_).astype(jnp.float32), x, (wb,), args.reps)
        t_q = time_op(int8_matmul_w8a8, x, (q8, s8), args.reps)
        print(
            f"B={B} K={K} N={N}: bf16 {t_bf * 1e6:.1f}us "
            f"({K * N * 2 / t_bf / 1e9:.0f} GB/s) | w8a8 {t_q * 1e6:.1f}us "
            f"({K * N / t_q / 1e9:.0f} GB/s) | speedup {t_bf / t_q:.2f}x "
            f"| rel_err {err:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
