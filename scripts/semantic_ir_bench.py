"""End-to-end IR quality on SEMANTIC embeddings (VERDICT r3 task #1).

Every round-2 IR number was produced with the lexical hash featurizer; the
quality levers the framework inherits from the reference — the multivector
blend (α=0.15, /root/reference/src/raglite/_insert.py:125-145), the linear
query adapter (_query_adapter.py:41), MaxSim reranking (_search.py:364-397),
and hybrid RRF (_search.py:257-280) — only *mean* anything on semantic
embeddings.  This script measures them with the TPU-trained encoder
(embedder="flax:sem", scripts/train_encoder.py) on a held-out corpus the
encoder never saw.

Protocol (inverse-cloze, leakage-free):
- Corpus: N held-out documents (data/corpus/heldout.jsonl — excluded from
  tokenizer + encoder training by id-hash).
- Queries: for each sampled document, one mid-document sentence (>= 10
  words) is REMOVED from the text before insertion and becomes the query;
  the document is the single relevant item (doc-level qrels, like the
  reference's RAGLiteEvaluator doc-level ScoredDoc, _bench.py:101-115).
- Adapter training uses query/doc pairs from DISJOINT documents, converted
  to Eval rows and fed through the production update_query_adapter.
- Metrics: MRR@10 (= AP@10 with a single relevant doc) and nDCG@10,
  doc-level, aggregated by max chunk score per document.

Variants measured (all through the production search stack):
  hash-single        hash:1024 featurizer (round-2 hermetic default)
  sem-single         flax:sem, single-vector (multivector off)
  sem-multivector    flax:sem, multivector blend on
  sem-mv+adapter     + trained linear query adapter
  sem-mv+rerank      + MaxSim late-interaction rerank
  sem-hybrid         multivector dense + BM25 + RRF

Usage: python scripts/semantic_ir_bench.py [--docs 1200] [--queries 200]
       [--out PARITY-fragment path]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Persistent XLA compile cache: fresh processes reuse compiled programs
# instead of re-compiling through the (intermittently stalling) tunnel
# compile service.
import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

HELDOUT = REPO / "data" / "corpus" / "heldout.jsonl"

_SENT = re.compile(r"[^.!?\n]+[.!?]")


def load_protocol(n_docs: int, n_queries: int, n_adapter: int, seed: int = 0):
    """Returns (documents to insert, eval queries, adapter-train queries).

    Each query is (query_text, gold_doc_text_id); its sentence is removed
    from the inserted text.
    """
    rng = np.random.default_rng(seed)
    raw = [json.loads(line) for line in open(HELDOUT)]
    rng.shuffle(raw)
    raw = [d for d in raw if len(d["text"]) >= 500][:n_docs]
    queries: list[tuple[str, str]] = []
    adapter_queries: list[tuple[str, str]] = []
    texts: dict[str, str] = {}
    want_q = rng.permutation(len(raw))
    query_docs = set(want_q[: n_queries + n_adapter].tolist())
    for i, doc in enumerate(raw):
        text = doc["text"]
        if i in query_docs:
            sentences = [m.group(0).strip() for m in _SENT.finditer(text)]
            candidates = [
                s for s in sentences[1:-1] if len(s.split()) >= 10 and len(s) < 400
            ]
            if candidates:
                sentence = candidates[int(rng.integers(len(candidates)))]
                text = text.replace(sentence, " ", 1)
                if len(queries) < n_queries:
                    queries.append((sentence, doc["id"]))
                else:
                    adapter_queries.append((sentence, doc["id"]))
        texts[doc["id"]] = text
    return texts, queries, adapter_queries


def build_store(texts: dict[str, str], config) -> None:
    from raglite_tpu import Document, insert_documents

    docs = [
        Document.from_text(text, filename=f"{doc_id}.md", id=doc_id)
        for doc_id, text in texts.items()
    ]
    insert_documents(docs, config=config)


def doc_ranking(chunk_ids, scores, store, k: int = 10) -> list[str]:
    """Doc-level ranking: max chunk score per document, like the
    reference's doc-level ScoredDoc aggregation (_bench.py:101-115)."""
    best: dict[str, float] = {}
    order: dict[str, int] = {}
    for rank, (cid, score) in enumerate(zip(chunk_ids, scores)):
        chunk = store.get_chunk(cid)
        if chunk is None:
            continue
        did = chunk.document_id
        if did not in best or score > best[did]:
            best[did] = float(score)
            order.setdefault(did, rank)
    ranked = sorted(best, key=lambda d: (-best[d], order[d]))
    return ranked[:k]


def evaluate_variant(name, search_fn, queries, store, k: int = 10) -> dict:
    mrr, ndcg, hits = [], [], 0
    t0 = time.time()
    for query, gold in queries:
        ranked = search_fn(query)
        if gold in ranked:
            rank = ranked.index(gold) + 1
            mrr.append(1.0 / rank)
            ndcg.append(1.0 / np.log2(rank + 1))
            hits += 1
        else:
            mrr.append(0.0)
            ndcg.append(0.0)
    return {
        "variant": name,
        "mrr_at_10": round(float(np.mean(mrr)), 4),
        "ndcg_at_10": round(float(np.mean(ndcg)), 4),
        "recall_at_10": round(hits / len(queries), 4),
        "queries": len(queries),
        "seconds": round(time.time() - t0, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=2000)
    parser.add_argument("--queries", type=int, default=200)
    # >= 1k adapter-training evals (VERDICT r4 task #8; the reference trains
    # on up to 4096, _query_adapter.py:156 — r3's 217 was the thin corner).
    parser.add_argument("--adapter-queries", type=int, default=1000)
    parser.add_argument("--margin-sweep", default="",
                        help="comma-separated optimize_gap values to sweep "
                        "for the adapter variant (e.g. '0.02,0.05,0.1,0.2')")
    parser.add_argument("--workdir", default=str(REPO / "data" / "irbench"))
    parser.add_argument("--embedder", default="flax:sem",
                        help="semantic embedder spec for the sem-* variants "
                        "(e.g. 'flax:sem' or 'flax:/path/to/export-dir'); "
                        "pair a non-default embedder with its own --workdir "
                        "so stores built with another embedder are not reused")
    parser.add_argument("--skip-hash", action="store_true")
    parser.add_argument("--skip-rerank", action="store_true",
                        help="skip the sem-mv+rerank variant and the rerank-32 "
                        "latency block (for A/B runs where the dense rows are "
                        "the question)")
    parser.add_argument("--rerank-queries", type=int, default=0,
                        help="evaluate the rerank variant on only the first N "
                        "queries (rerank is ~2.6 s/query at 160 candidates); "
                        "emits a matched sem-multivector row over the same "
                        "subset so the head-to-head stays apples-to-apples")
    parser.add_argument("--cpu", action="store_true",
                        help="pin JAX to CPU (the shell env var is ignored "
                        "when the TPU plugin is installed)")
    args = parser.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dataclasses import replace

    from raglite_tpu import RAGLiteConfig
    from raglite_tpu.documents import Eval
    from raglite_tpu.query_adapter import update_query_adapter
    from raglite_tpu.search import (
        hybrid_search,
        search_and_rerank_chunks,
        vector_search,
    )
    from raglite_tpu.store import store_from_config

    texts, queries, adapter_queries = load_protocol(
        args.docs, args.queries, args.adapter_queries
    )
    print(f"corpus: {len(texts)} docs, {len(queries)} eval queries, "
          f"{len(adapter_queries)} adapter-train queries", flush=True)
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    configs = {}
    if not args.skip_hash:
        configs["hash"] = RAGLiteConfig(
            store_path=str(workdir / "hash"), embedder="hash:1024", llm="echo"
        )
    configs["sem_single"] = RAGLiteConfig(
        store_path=str(workdir / "sem_single"), embedder=args.embedder, llm="echo",
        # TRUE single-vector store: one pooled whole-chunk embedding (the
        # late-chunking default stores per-chunklet sub-vectors regardless
        # of the multivector flag, faithfully to the reference).
        embedding_type="standard",
        vector_search_multivector=False, vector_search_query_adapter=False,
    )
    configs["sem_mv"] = RAGLiteConfig(
        store_path=str(workdir / "sem_mv"), embedder=args.embedder, llm="echo",
        vector_search_multivector=True, vector_search_query_adapter=False,
    )
    for name, config in configs.items():
        store = store_from_config(config)
        if len(store.documents) < len(texts):
            t0 = time.time()
            build_store(texts, config)
            print(f"built {name} store in {time.time()-t0:.0f}s", flush=True)

    results = []

    def dense_fn(config, **kw):
        store = store_from_config(config)

        def run(query):
            ids, scores = vector_search(query, num_results=40, config=config, **kw)
            return doc_ranking(ids, scores, store)

        return run

    if "hash" in configs:
        results.append(
            evaluate_variant("hash-single", dense_fn(configs["hash"]), queries,
                             store_from_config(configs["hash"]))
        )
        print(results[-1], flush=True)
    results.append(
        evaluate_variant("sem-single", dense_fn(configs["sem_single"]), queries,
                         store_from_config(configs["sem_single"]))
    )
    print(results[-1], flush=True)
    results.append(
        evaluate_variant("sem-multivector", dense_fn(configs["sem_mv"]), queries,
                         store_from_config(configs["sem_mv"]))
    )
    print(results[-1], flush=True)

    # Query adapter: Eval rows from the DISJOINT adapter-train queries, gold
    # chunk ids = the gold document's chunks, through the production
    # update_query_adapter (NNLS dual + Procrustes).
    config_mv = configs["sem_mv"]
    store_mv = store_from_config(config_mv)
    evals = []
    doc_chunks: dict[str, list[str]] = {}
    for cid in store_mv.chunk_order:
        chunk = store_mv.chunks.get(cid)
        if chunk is not None:
            doc_chunks.setdefault(chunk.document_id, []).append(cid)
    from raglite_tpu.embed import embed_queries

    adapter_q_emb = embed_queries([q for q, _ in adapter_queries], config=config_mv)
    for i, (query, gold_doc) in enumerate(adapter_queries):
        gold_chunks = doc_chunks.get(gold_doc, [])
        if not gold_chunks:
            continue
        # Gold = the doc's 2 chunks most similar to the query, not the whole
        # document: the reference's adapter gold comes from LLM-JUDGED
        # relevant chunks (_eval.py:97-133) — whole-doc gold poisons the
        # NNLS targets with unrelated chunks (measured: MRR 0.478 -> 0.228).
        q_emb = np.asarray(adapter_q_emb[i], np.float32)
        scored = []
        for cid in gold_chunks:
            matrix = np.asarray(store_mv.embeddings[cid], np.float32)
            scored.append((float(np.max(matrix @ q_emb)), cid))
        scored.sort(reverse=True)
        gold_top = [cid for _, cid in scored[:2]]
        evals.append(
            Eval(
                id=f"adapter-{i:04d}",
                document_id=gold_doc,
                question=query,
                chunk_ids=gold_top,
                contexts=[],
                ground_truth="",
            )
        )
    with store_mv.write_lock():
        store_mv.add_evals(evals)
        store_mv.save()
    config_adapter = replace(config_mv, vector_search_query_adapter=True)
    t0 = time.time()
    update_query_adapter(config=config_adapter)
    print(f"adapter trained on {len(evals)} evals in {time.time()-t0:.0f}s", flush=True)
    results.append(
        evaluate_variant("sem-mv+adapter", dense_fn(config_adapter), queries, store_mv)
    )
    print(results[-1], flush=True)

    # Margin sweep (VERDICT r4 weak #4: does the adapter lever scale or
    # saturate?): re-train the adapter at each optimize_gap and re-evaluate.
    if args.margin_sweep:
        for gap in (float(x) for x in args.margin_sweep.split(",")):
            update_query_adapter(config=config_adapter, optimize_gap=gap)
            results.append(
                evaluate_variant(
                    f"sem-mv+adapter(gap={gap:g})",
                    dense_fn(config_adapter), queries, store_mv,
                )
            )
            print(results[-1], flush=True)
        update_query_adapter(config=config_adapter)  # restore the default

    # MaxSim late-interaction rerank over the multivector store.
    def rerank_fn(query):
        chunks = search_and_rerank_chunks(query, num_results=40, config=config_mv)
        ids = [c.id for c in chunks]
        scores = list(range(len(ids), 0, -1))
        return doc_ranking(ids, scores, store_mv)

    rerank_latency = None
    if not args.skip_rerank:
        rq = queries[: args.rerank_queries] if args.rerank_queries else queries
        results.append(evaluate_variant("sem-mv+rerank", rerank_fn, rq, store_mv))
        print(results[-1], flush=True)
        if args.rerank_queries and len(rq) < len(queries):
            # Matched-subset dense baseline for the rerank head-to-head.
            results.append(
                evaluate_variant(
                    f"sem-multivector@{len(rq)}", dense_fn(config_mv), rq, store_mv
                )
            )
            print(results[-1], flush=True)

    # rerank-32 latency (VERDICT r4 task #2 "Done" criterion): cost of the
    # token-level MaxSim rerank alone over a fixed 32-candidate set —
    # candidate token re-encode (content-hash cached after first touch) +
    # device MaxSim, excluding the dense search that produced them.
    if not args.skip_rerank:
        from raglite_tpu.search import rerank_chunks, retrieve_chunks

        lat_ms: list[float] = []
        sample = queries[: min(50, len(queries))]
        for qi, (query, _gold) in enumerate(sample):
            ids, _scores = vector_search(query, num_results=32, config=config_mv)
            cands = retrieve_chunks(ids, config=config_mv)
            t0 = time.time()
            rerank_chunks(query, cands, config=config_mv)
            if qi:  # first call pays compiles/cache warm
                lat_ms.append((time.time() - t0) * 1e3)
        rerank_latency = {
            "variant": "rerank-32-latency",
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
            "queries": len(lat_ms),
            "note": "token-level MaxSim over 32 candidates, cold token cache "
                    "except repeats; excludes the producing dense search",
        }
        print(rerank_latency, flush=True)

    def hybrid_fn(query):
        ids, scores = hybrid_search(query, num_results=40, config=config_mv)
        return doc_ranking(ids, scores, store_mv)

    results.append(evaluate_variant("sem-hybrid", hybrid_fn, queries, store_mv))
    print(results[-1], flush=True)

    out_path = workdir / "results.json"
    out_path.write_text(json.dumps(
        {"embedder": args.embedder, "docs": len(texts),
         "variants": results, "rerank_latency": rerank_latency}, indent=1))
    print("\n| variant | MRR@10 | nDCG@10 | recall@10 |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['variant']} | {r['mrr_at_10']:.3f} | {r['ndcg_at_10']:.3f} | {r['recall_at_10']:.3f} |")
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main()
