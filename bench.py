"""Benchmark: the SHIPPED vector-search engine on one TPU chip.

Round 1 benched an inline reimplementation of the query pipeline; this
version drives the production code itself: ``DenseIndex.search_chunks`` —
adapter matmul + fused distance matmul + sub-vector top-k + on-device
multi-vector group-max + final chunk ranking (raglite_tpu/index/dense.py),
the exact engine ``raglite_tpu.vector_search_batch`` calls — at the
per-chip shard size of the 10M-chunk / v5e-8 target (1.25M sub-vectors x
1024 dims, int8 with per-row dequant scales).

The index is built with ``DenseIndex.from_device_arrays`` from data
generated ON DEVICE: the dev-tunnel host->device link runs ~15 MB/s, so a
1.3 GB host upload would measure the tunnel, not the engine (on production
hosts the one-time upload rides PCIe).

Timing method (tunnel-honest):
- Throughput: ``iters`` batches of ``search_chunks_device`` dispatched
  back-to-back (the pipelined-serving pattern; every op of the public
  method minus the final host fetch), synced once by fetching one element.
- p50/p95 latency: percentiles over serialized on-device CHAINS of the
  fused B=1 production program (32 data-dependent dispatches per sample,
  one sync each, interleaved pure-RPC median subtracted) — per-call timing
  through the ~30 ms dev tunnel both hides and inflates true latency.
  The B=1 routing is the int4 two-stage scan when enabled (the default).
- recall@10: chunk-level agreement of the production routing vs the exact
  top-k routing on the same index, for BOTH the large-batch program and
  the small-batch (latency) routing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1_249_280)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--num-hits", type=int, default=40)
    parser.add_argument("--num-results", type=int, default=10)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--latency-reps", type=int, default=50)
    parser.add_argument("--dtype", choices=("int8", "bfloat16"), default="int8")
    parser.add_argument(
        "--pallas", choices=("auto", "on", "off"), default="auto",
        help="small-batch Pallas routing: auto follows the production config default",
    )
    parser.add_argument(
        "--warm-all-only", action="store_true",
        help="(internal) compile+run EVERY program the bench uses once to "
        "populate the persistent cache, then exit",
    )
    parser.add_argument(
        "--no-int4", action="store_true",
        help="disable the int4 two-stage routing (fallback when its fresh "
        "compile hangs on the remote compile service)",
    )
    parser.add_argument(
        "--chain-warm-timeout", type=float, default=900.0,
        help="seconds to allow fresh compiles in a bounded subprocess "
        "before degrading (no-int4 routing, then per-call latency)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: repeated bench runs (and the driver's
    # round-end run) skip XLA compiles entirely.
    from pathlib import Path

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.index.dense import DenseIndex

    if args.pallas == "auto":
        use_pallas = RAGLiteConfig(store_path=":memory:").use_pallas
    else:
        use_pallas = args.pallas == "on"

    n, d, b = args.rows, args.dim, args.batch
    key = jax.random.PRNGKey(0)
    k_rows, k_q, k_adapter = jax.random.split(key, 3)
    if args.dtype == "int8":
        rows = jax.random.randint(k_rows, (n, d), -127, 128, dtype=jnp.int8)
        row_scale = jax.random.uniform(k_rows, (n,), jnp.float32, 0.005, 0.01)
    else:
        rows = jax.random.normal(k_rows, (n, d), dtype=jnp.bfloat16)
        row_scale = None
    row_chunk = jnp.arange(n, dtype=jnp.int32) // 2  # 2 sub-vectors per chunk
    index = DenseIndex.from_device_arrays(
        rows, row_chunk, row_scale=row_scale, metric="cosine", use_pallas=use_pallas
    )
    if args.no_int4:
        index.use_int4_stage1 = False
    queries = jax.random.normal(k_q, (b, d), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    adapter = jax.random.normal(k_adapter, (d, d), dtype=jnp.float32) / np.sqrt(d)
    queries, adapter = jax.block_until_ready((queries, adapter))

    def run_device(q, exact=None):
        return index.search_chunks_device(
            q, num_hits=args.num_hits, num_results=args.num_results,
            adapter=adapter, exact=exact,
        )

    def sync(x):
        return np.asarray(x.ravel()[0])

    q1 = queries[:1]

    # B=1 device latency, tunnel-immune: each sample DISPATCHES CHAIN_K
    # data-dependent calls of the production B=1 routing (search_chunks's
    # fused program), where call k+1's query is derived from call k's device
    # output — the dependency serializes execution on device while the
    # async dispatches pipeline through the tunnel — and syncs once, so
    # per-query time = (chain - rpc) / K cannot hide inside the tunnel's
    # one-way trip (a naive per-call measurement reads ~0.5 ms here because
    # compute shorter than RTT/2 overlaps the fetch).  K must be long enough
    # that client dispatch overhead fully overlaps device execution:
    # measured on v5e, per-query converges at K>=32 (1.88 ms) and is
    # under/over-estimated at K=8/16.  Percentiles are over CHAIN_M
    # independent chain samples.  Crucially this reuses the already-cached
    # production program: no fresh monolithic compile (the remote compile
    # service repeatedly dropped a scan-wrapped variant after ~27 min).
    CHAIN_K, CHAIN_M = 32, max(args.latency_reps // 5, 6)
    perturb = jax.jit(lambda q, p: q + p[0, 0, 0] * 1e-30)

    def latency_chain(q):
        packed = None
        for _ in range(CHAIN_K):
            packed = index.search_chunks_device(
                q, num_hits=args.num_hits, num_results=args.num_results,
                adapter=adapter,
            )
            # Value-dependent (always-zero) perturbation chains the calls.
            q = perturb(q1, packed)
        return packed

    if args.warm_all_only:
        # Populate the persistent compile cache with EVERY program the bench
        # dispatches (large-batch approx + exact, B=32 and B=1 small-batch
        # routing, the latency chain, the perturbation op) and exit.  The
        # main process runs this under a bounded subprocess first, so no
        # in-process compile can hang the driver's bench run.
        sync(run_device(queries))
        sync(run_device(queries, exact=True))
        sync(run_device(queries[:32]))
        sync(latency_chain(q1))
        print("warm ok")  # noqa: T201
        return

    # Bound EVERY fresh compile in a subprocess sharing the persistent
    # cache (the dev tunnel's remote compile service intermittently hangs
    # for 30+ minutes on big fresh programs; a driver bench run must never
    # do that).  If the warm fails, retry without the int4 routing (its
    # Pallas program is the most likely fresh compile), and only then fall
    # through to unbounded in-process compiles as a last resort.
    import os
    import subprocess
    import sys

    def warm_subprocess(extra: list[str]) -> bool:
        cmd = [
            sys.executable, str(Path(__file__).resolve()), "--warm-all-only",
            "--rows", str(args.rows), "--dim", str(args.dim),
            "--batch", str(args.batch), "--num-hits", str(args.num_hits),
            "--num-results", str(args.num_results), "--dtype", args.dtype,
            "--pallas", args.pallas, *extra,
        ]
        env = dict(os.environ)
        if jax.default_backend() == "cpu":  # keep smoke runs off the tunnel
            env["JAX_PLATFORMS"] = "cpu"
        try:
            subprocess.run(
                cmd, timeout=args.chain_warm_timeout, check=True,
                capture_output=True, env=env,
            )
        except (subprocess.SubprocessError, OSError):
            return False
        return True

    chain_warm = warm_subprocess(["--no-int4"] if args.no_int4 else [])
    if not chain_warm and not args.no_int4:
        # The int4 Pallas compile may be the hang: degrade to the XLA-only
        # routing (the round-1 production path) and warm that instead.
        index.use_int4_stage1 = False
        chain_warm = warm_subprocess(["--no-int4"])

    # Warm up / compile both batch shapes (cache hits after the subprocess;
    # sync via transfer: block_until_ready does not synchronize through the
    # dev tunnel).
    sync(run_device(queries))
    warm1 = index.search_chunks(
        q1, num_hits=args.num_hits, num_results=args.num_results, adapter=adapter
    )
    assert np.isfinite(warm1[0]).all()

    # Tunnel RPC floor: median cost of fetching one element of an
    # already-computed array (pure round-trip, no compute).
    tiny = jax.block_until_ready(jnp.zeros((1,), jnp.float32))
    rpc_samples = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(tiny[0])
        rpc_samples.append(time.perf_counter() - t0)
    rpc_floor = float(np.median(rpc_samples))

    # Chunk-level recall@num_results: production routing vs exact top-k.
    approx = np.asarray(run_device(queries))[1]
    exact_res = np.asarray(run_device(queries, exact=True))[1]
    hits = [
        len(set(approx[i]) & set(exact_res[i])) / exact_res.shape[1]
        for i in range(min(64, b))
    ]
    recall = float(np.mean(hits))
    # Same for the SMALL-BATCH routing (the latency path — int4 two-stage
    # when enabled), which differs from the large-batch program.
    m = min(64, b)
    small = np.concatenate(
        [np.asarray(run_device(queries[i : min(i + 32, m)]))[1] for i in range(0, m, 32)]
    )
    hits_small = [
        len(set(small[i]) & set(exact_res[i])) / exact_res.shape[1] for i in range(m)
    ]
    recall_small = float(np.mean(hits_small))

    # Pipelined throughput through the shipped device pipeline.
    t0 = time.perf_counter()
    outs = [run_device(queries) for _ in range(args.iters)]
    sync(outs[-1])
    elapsed = time.perf_counter() - t0 - rpc_floor
    qps = args.iters * b / elapsed

    latency_method = (
        "percentiles over serialized on-device chains of the fused B=1 "
        f"production program ({CHAIN_K} data-dependent dispatches per "
        "sample, one sync each, interleaved RPC baseline subtracted)"
    )
    try:
        if not chain_warm:
            msg = "chain program did not compile within the warm timeout"
            raise RuntimeError(msg)
        sync(latency_chain(q1))  # cache hit after the subprocess warm
        chain_ms = []
        rpc_inter = []
        for _ in range(CHAIN_M):
            t0 = time.perf_counter()
            np.asarray(tiny[0])
            rpc_inter.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(latency_chain(q1))
            chain_ms.append((time.perf_counter() - t0) * 1e3)
        rpc_ms = float(np.median(rpc_inter)) * 1e3
        per_query_ms = (np.asarray(chain_ms) - rpc_ms) / CHAIN_K
        p50_ms = float(np.percentile(per_query_ms, 50))
        p95_ms = float(np.percentile(per_query_ms, 95))
    except Exception:
        # The dev tunnel's remote-compile service intermittently drops big
        # fresh compiles; fall back to per-call timing of the already-warm
        # public method so the bench always reports (method labeled).
        latency_method = (
            "per-call dispatch->fetch of search_chunks minus interleaved "
            "pure-RPC median (chain program unavailable: compile service; "
            "sub-RTT compute may be underestimated through the tunnel)"
        )
        lat, rpc_inter = [], []
        for _ in range(args.latency_reps):
            t0 = time.perf_counter()
            np.asarray(tiny[0])
            rpc_inter.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            index.search_chunks(
                q1, num_hits=args.num_hits, num_results=args.num_results,
                adapter=adapter,
            )
            lat.append((time.perf_counter() - t0) * 1e3)
        rpc_ms = float(np.median(rpc_inter)) * 1e3
        p50_ms = float(np.percentile(lat, 50)) - rpc_ms
        p95_ms = float(np.percentile(lat, 95)) - rpc_ms

    print(
        json.dumps(
            {
                "metric": (
                    f"DenseIndex.search_chunks QPS/chip @{n}x{d} {args.dtype} "
                    "(10M-chunk v5e-8 shard, shipped engine)"
                ),
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 5000.0, 3),
                "p50_ms": round(p50_ms, 3),
                "p95_ms": round(p95_ms, 3),
                "latency_method": latency_method,
                "tunnel_rpc_ms": round(rpc_ms, 2),
                "recall_at_10": round(recall, 4),
                "recall_at_10_small_batch": round(recall_small, 4),
                "batch": b,
                "num_hits": args.num_hits,
                "pallas_small_batch": bool(
                    use_pallas and jax.default_backend() == "tpu"
                ),
                "int4_two_stage_small_batch": bool(
                    index._use_int4_stage1(1, False)
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
