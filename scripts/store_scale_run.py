"""Measured multi-million-chunk host-store run (VERDICT r3 task #7).

Drives the production Store through an insert -> save -> reopen cycle at
--chunks scale (default 5M) and reports wall times plus resident memory,
demonstrating that the v3 lazy-open path keeps RSS O(touched records)
rather than O(corpus).  Results go into PARITY.md.

The reopen runs in a FRESH subprocess so its RSS reflects only the open
(the writer process necessarily held the eager tables).

Usage: python scripts/store_scale_run.py [--chunks 5000000] [--dir PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def rss_mb() -> float:
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1024
    return -1.0


def write_phase(path: str, n_chunks: int, dim: int) -> dict:
    import numpy as np

    from raglite_tpu.documents import Chunk, Document
    from raglite_tpu.store import Store

    store = Store(path)
    batch = 250_000
    t0 = time.time()
    rng = np.random.default_rng(0)
    for start in range(0, n_chunks, batch):
        count = min(batch, n_chunks - start)
        doc_id = f"doc{start // batch:05d}"
        store.documents[doc_id] = Document(
            id=doc_id, filename=f"{doc_id}.md", url=None, metadata_={}, content=None
        )
        chunks = [
            Chunk(
                id=f"c{i:09d}",
                document_id=doc_id,
                index=i - start,
                headings="# Section",
                body=f"synthetic chunk body number {i} with a few filler words",
                metadata_={"topic": f"t{i % 17}", "shard": i % 7},
            )
            for i in range(start, start + count)
        ]
        embeddings = list(
            rng.normal(size=(count, 1, dim)).astype(np.float16)
        )
        store.add_chunks(chunks, embeddings)
        store.save()
        # Writers keep eager overlays; drop saved state to bound the
        # writer's own memory across batches (fresh Store resumes lazily).
        if start + count < n_chunks:
            store = Store(path)
    insert_save_s = time.time() - t0
    return {
        "insert_save_s": round(insert_save_s, 1),
        "writer_peak_rss_mb": round(rss_mb(), 1),
    }


def read_phase(path: str) -> dict:
    import numpy as np

    from raglite_tpu.store import Store, _LazyChunks

    rss0 = rss_mb()
    t0 = time.time()
    store = Store(path)
    open_s = time.time() - t0
    rss_open = rss_mb()
    lazy = isinstance(store.chunks, _LazyChunks)
    n = len(store.chunk_order)
    # Touch 1000 spread-out records.
    t0 = time.time()
    rng = np.random.default_rng(1)
    for i in rng.integers(0, n, size=1000):
        chunk = store.chunks[store.chunk_order[int(i)]]
        assert chunk.body
    touch_s = time.time() - t0
    rss_touch = rss_mb()
    # Filtered mask from sidecar postings.
    t0 = time.time()
    mask = store.chunk_mask_for_filter({"topic": "t3"})
    filter_s = time.time() - t0
    # Embedding view resolution.
    emb = store.embeddings[store.chunk_order[n // 2]]
    assert emb.shape[0] >= 1
    return {
        "chunks": n,
        "lazy_open": lazy,
        "open_s": round(open_s, 2),
        "rss_before_mb": round(rss0, 1),
        "rss_after_open_mb": round(rss_open, 1),
        "rss_after_1000_touches_mb": round(rss_touch, 1),
        "touch_1000_s": round(touch_s, 3),
        "filtered_mask_s": round(filter_s, 3),
        "filtered_matches": int(mask.sum()),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunks", type=int, default=5_000_000)
    parser.add_argument("--dim", type=int, default=8)
    parser.add_argument("--dir", default="/tmp/store_scale_run")
    parser.add_argument("--phase", choices=("write", "read", "all"), default="all")
    args = parser.parse_args()

    if args.phase == "read":
        print(json.dumps(read_phase(args.dir)))
        return
    result = {"n_chunks": args.chunks}
    if args.phase in ("write", "all"):
        result.update(write_phase(args.dir, args.chunks, args.dim))
    if args.phase == "all":
        read = subprocess.run(  # fresh process: honest open RSS
            [sys.executable, __file__, "--phase", "read", "--dir", args.dir],
            capture_output=True, text=True, check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        result["reopen"] = json.loads(read.stdout.strip().splitlines()[-1])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
