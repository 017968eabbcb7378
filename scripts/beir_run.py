"""Export a BEIR-format dataset and run the production IR bench over it.

VERDICT r4 task #8 (second half): `irbench.beir_directory_dataset` existed
since r2 but no BEIR-format set had ever been run through it — the IR
protocol was 100% home-grown scripting.  This script closes that: it writes
a standard BEIR directory (corpus.jsonl / queries.jsonl / qrels.tsv, the
layout the reference consumes via ir_datasets' beir adapters,
/root/reference/src/raglite/_bench.py:20-137 + _cli.py:121-206) and runs
`run_ir_benchmark` — the full production path: directory loader ->
RAGLiteTPUEvaluator variants -> TREC-run cache -> numpy ir-measures.

The image has no downloadable BEIR sets (zero egress), so the exported set
uses the held-out inverse-cloze protocol of scripts/semantic_ir_bench.py
(documents the encoder never saw; one removed mid-document sentence per
query; doc-level qrels).  What this validates is the FORMAT + harness
path end-to-end; any real BEIR download drops into the same directory
layout unchanged.

Usage:
  python scripts/beir_run.py [--docs 1200] [--queries 200] [--cpu]
          [--dir data/beir_heldout] [--measure AP@10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(REPO / "scripts"))
from semantic_ir_bench import load_protocol  # noqa: E402


def _export_matches(out: Path, n_docs: int, n_queries: int) -> bool:
    """True when an existing export's corpus/query counts match the CLI
    args — a stale export from a different-sized run must not be silently
    benchmarked while the printed parameters claim otherwise."""
    if not (out / "qrels.tsv").exists():
        return False
    try:
        meta = json.loads((out / "export_meta.json").read_text())
    except (OSError, ValueError):
        return False
    return meta.get("docs") == n_docs and meta.get("queries") == n_queries


def export_beir(out: Path, n_docs: int, n_queries: int) -> None:
    """Write corpus.jsonl / queries.jsonl / qrels.tsv in BEIR layout."""
    texts, queries, _ = load_protocol(n_docs, n_queries, 0)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "corpus.jsonl", "w") as f:
        for doc_id, text in texts.items():
            f.write(json.dumps({"_id": doc_id, "title": "", "text": text}) + "\n")
    with open(out / "queries.jsonl", "w") as f:
        for i, (query, _gold) in enumerate(queries):
            f.write(json.dumps({"_id": f"q{i:04d}", "text": query}) + "\n")
    with open(out / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i, (_query, gold) in enumerate(queries):
            f.write(f"q{i:04d}\t{gold}\t1\n")
    (out / "export_meta.json").write_text(json.dumps({"docs": n_docs, "queries": n_queries}))
    print(f"exported BEIR dir: {len(texts)} docs, {len(queries)} queries -> {out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=1200)
    parser.add_argument("--queries", type=int, default=200)
    parser.add_argument("--dir", default=str(REPO / "data" / "beir_heldout"))
    parser.add_argument("--measure", default="AP@10")
    parser.add_argument("--embedder", default="flax:sem")
    parser.add_argument("--store-dir", default=str(REPO / "data" / "beir_stores"))
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    out = Path(args.dir)
    if _export_matches(out, args.docs, args.queries):
        print(f"reusing existing export: {out}")
    else:
        export_beir(out, args.docs, args.queries)

    from raglite_tpu import RAGLiteConfig
    from raglite_tpu.irbench import run_ir_benchmark

    config = RAGLiteConfig(
        store_path=str(Path(args.store_dir) / "beir"),
        embedder=args.embedder,
        llm="echo",
    )
    t0 = time.time()
    df = run_ir_benchmark(
        dataset=str(out),
        measure=args.measure,
        num_queries=args.queries,
        config=config,
    )
    print(df.to_string())
    print(f"\n{time.time() - t0:.0f}s total")
    result_path = out / f"results_{args.measure.replace('@', '_at_')}.json"
    result_path.write_text(df.to_json())
    print(f"written: {result_path}")


if __name__ == "__main__":
    main()
