"""A/B the Pallas prefill-attention kernel against the XLA einsum path on TPU.

Parity first (one full prefill, kernel vs einsum, same weights), then
prefill tokens/s + MFU at B=1 and B=8 through the production _prefill_last
path with the kernel toggled via DecoderModel.use_pallas_prefill.

Usage: python scripts/prefill_kernel_check.py [--preset base] [--prompt 2048]
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
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = Path(__file__).parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raglite_tpu.models.decoder import DecoderModel, JaxChatLLM, _prefill_last

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    llm = JaxChatLLM(args.preset)
    params, cfg = llm.params, llm.cfg
    T = min(args.prompt, cfg["max_len"] - 512)
    p_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    p_mat = p_total - int(np.prod(params["tok_emb"].shape))
    hd = cfg.get("head_dim") or cfg["d_model"] // cfg["heads"]
    peak = 197e12 if "v5" in str(jax.devices()[0]).lower() else None

    def sync(x):
        return np.asarray(x.ravel()[0])

    # ---- parity: one prefill, kernel vs einsum (same inputs) ----
    B, S = 2, T + 512
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg["vocab"], (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    outs = {}
    for use_kernel in (False, True):
        model = DecoderModel(cfg)
        model.use_pallas_prefill = use_kernel
        last, _ = _prefill_last(model, params, ids, model.init_cache(B, S), lens)
        outs[use_kernel] = np.asarray(last, np.float32)
    ref_n, got_n = outs[False], outs[True]
    denom = np.maximum(np.abs(ref_n), 1.0)
    max_rel = float(np.max(np.abs(ref_n - got_n) / denom))
    top_ref = np.argsort(-ref_n)[:, :5]
    top_got = np.argsort(-got_n)[:, :5]
    print(f"parity: max_rel_err={max_rel:.4g} top5_match={np.array_equal(top_ref, top_got)}")

    # ---- prefill throughput A/B ----
    for use_kernel in (False, True):
        model = DecoderModel(cfg)
        model.use_pallas_prefill = use_kernel
        label = "pallas" if use_kernel else "xla"
        for B in (1, 8):
            ids_b = jnp.ones((B, T), jnp.int32)
            lens_b = jnp.full((B,), T, jnp.int32)
            cache0 = model.init_cache(B, T + 512)
            last, _ = _prefill_last(model, params, ids_b, cache0, lens_b)
            sync(last)
            t0 = time.perf_counter()
            outs_l = [
                _prefill_last(model, params, ids_b, cache0, lens_b)[0]
                for _ in range(args.reps)
            ]
            sync(outs_l[-1])
            dt = time.perf_counter() - t0
            tok_s = args.reps * B * T / dt
            attn = 4 * cfg["layers"] * (T * T / 2) * cfg["heads"] * hd
            flops = 2 * p_mat * T + attn
            mfu = args.reps * B * flops / dt / peak if peak else float("nan")
            print(f"{label} B={B}: {tok_s:.0f} tok/s  MFU={mfu:.3f}")


if __name__ == "__main__":
    main()
