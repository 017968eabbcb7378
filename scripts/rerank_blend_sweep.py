"""Sweep ``config.reranker_blend`` over the rerank IR variant.

Reuses an ALREADY-BUILT multivector store from a prior
scripts/semantic_ir_bench.py run (same --docs/--queries/--adapter-queries
=> identical deterministic protocol, so scores are directly comparable to
that run's sem-multivector / sem-mv+rerank rows).  blend=0.0 is the
reranker's order verbatim (the default), 1.0 degenerates to the retrieval
order; intermediate values RRF-fuse the two (search._blend_with_retrieval_order).
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=2122)
    parser.add_argument("--queries", type=int, default=1000)
    parser.add_argument("--adapter-queries", type=int, default=1000)
    parser.add_argument("--workdir", required=True,
                        help="semantic_ir_bench workdir holding sem_mv/")
    parser.add_argument("--embedder", required=True)
    parser.add_argument("--blends", default="0.0,0.25,0.5,0.75")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import semantic_ir_bench as sib
    from dataclasses import replace

    from raglite_tpu import RAGLiteConfig
    from raglite_tpu.search import search_and_rerank_chunks
    from raglite_tpu.store import store_from_config

    texts, queries, _ = sib.load_protocol(
        args.docs, args.queries, args.adapter_queries
    )
    workdir = Path(args.workdir)
    config_mv = RAGLiteConfig(
        store_path=str(workdir / "sem_mv"), embedder=args.embedder, llm="echo",
        vector_search_multivector=True, vector_search_query_adapter=False,
    )
    store = store_from_config(config_mv)
    if len(store.documents) < len(texts):
        msg = f"store at {workdir}/sem_mv is not fully built; run semantic_ir_bench first"
        raise SystemExit(msg)

    rows = []
    for blend in [float(b) for b in args.blends.split(",")]:
        cfg = replace(config_mv, reranker_blend=blend)

        def rerank_fn(query, cfg=cfg):
            chunks = search_and_rerank_chunks(query, num_results=40, config=cfg)
            return sib.doc_ranking(
                [c.id for c in chunks],
                list(range(len(chunks), 0, -1)),  # rank order as scores
                store,
            )

        rows.append(
            sib.evaluate_variant(f"rerank-blend-{blend}", rerank_fn, queries, store)
        )
        print(rows[-1], flush=True)

    out = workdir / "blend_sweep.json"
    out.write_text(json.dumps({"embedder": args.embedder, "rows": rows}, indent=1))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
