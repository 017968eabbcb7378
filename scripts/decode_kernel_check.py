"""A/B the Pallas decode-attention kernel against the XLA einsum path on TPU.

Parity first (one decode step, kernel vs einsum, same cache), then decode
tokens/s at B=1 and B=8 through the production chunked decode loop with the
kernel toggled via DecoderModel.use_pallas_decode.

Usage: python scripts/decode_kernel_check.py [--preset base] [--prompt 2048]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="base")
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument(
        "--quant",
        choices=["none", "int8"],
        default="none",
        help="load the preset @int8 (W8A8 decode matmuls, ops/quant_matmul.py)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pathlib import Path

    cache_dir = Path(__file__).parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raglite_tpu.models.decoder import (
        DECODE_CHUNK,
        JaxChatLLM,
        _decode_chunk_device,
        _prefill_last,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    spec = args.preset + ("@int8" if args.quant == "int8" else "")
    llm = JaxChatLLM(spec)
    model, params, cfg = llm.model, llm.params, llm.cfg
    T = min(args.prompt, cfg["max_len"] - 512)

    # ---- parity: one decode step, kernel vs einsum ----
    B = 2
    S = T + 512
    ids = jnp.ones((B, T), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    cache = model.init_cache(B, S)
    last, cache = _prefill_last(model, params, ids, cache, lens)
    tok = jnp.asarray([[5], [9]], jnp.int32)
    model.use_pallas_decode = False
    ref, _ = jax.jit(model.forward, static_argnames=())(params, tok, cache, lens)
    model.use_pallas_decode = True
    got, _ = jax.jit(model.forward)(params, tok, cache, lens)
    ref_n, got_n = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    denom = np.maximum(np.abs(ref_n), 1.0)
    max_rel = float(np.max(np.abs(ref_n - got_n) / denom))
    top_ref = np.argsort(-ref_n[:, -1])[:, :5]
    top_got = np.argsort(-got_n[:, -1])[:, :5]
    print(f"parity: max_rel_err={max_rel:.4g} top5_match={np.array_equal(top_ref, top_got)}")

    # ---- decode throughput A/B ----
    stops = jnp.full((8,), -7, jnp.int32)
    mask = jnp.zeros((cfg["vocab"],), jnp.float32)

    def sync(x):
        return np.asarray(x.ravel()[0])

    from raglite_tpu.models.decoder import DecoderModel

    for use_kernel in (False, True):
        # Fresh model object per toggle: the jitted decode loop is cached on
        # the (static) model's identity, so mutating the flag in place would
        # silently reuse the previously compiled path.
        model = DecoderModel(cfg)
        model.use_pallas_decode = use_kernel
        for B in (1, 8):
            ids = jnp.ones((B, T), jnp.int32)
            lens = jnp.full((B,), T, jnp.int32)
            cache = model.init_cache(B, T + 512)
            last, cache = _prefill_last(model, params, ids, cache, lens)
            key = jax.random.PRNGKey(0)
            done = jnp.zeros((B,), bool)
            state = (cache, lens, last, done, key)

            def chunk(state):
                cache, lens, last, done, key = state
                toks, cache, lens, last, done, key = _decode_chunk_device(
                    model, cache, params, lens, last, mask, done, stops, key,
                    num_steps=DECODE_CHUNK, temperature=0.0, top_p=1.0,
                    top_k=0, min_p=0.0,
                )
                return toks, (cache, lens, last, done, key)

            toks, state = chunk(state)  # compile
            sync(toks)
            t0 = time.perf_counter()
            for _ in range(args.chunks):
                toks, state = chunk(state)
            sync(toks)
            dt = time.perf_counter() - t0
            n_tok = args.chunks * DECODE_CHUNK
            label = "pallas" if use_kernel else "xla"
            print(
                f"{label} B={B}: {n_tok * B / dt:.1f} tok/s "
                f"({dt / n_tok * 1e3:.2f} ms/step)"
            )


if __name__ == "__main__":
    main()
