"""Store scalability: segment persistence, 1M-chunk save/reload, O(matching)
metadata filtering, tombstone compaction.

These are the north-star-scale guarantees (BASELINE.md: 10M chunks) the
round-1 monolithic msgpack store could not make: saves are O(new chunks),
loads memory-map embeddings, filtered search plans from ordinal postings.
"""

import time
from pathlib import Path

import numpy as np
import pytest

from raglite_tpu.documents import Chunk
from raglite_tpu.store import Store


def _mk_chunks(start: int, count: int, *, doc: str, dim: int, topic: str):
    chunks, embeddings = [], []
    for i in range(start, start + count):
        chunks.append(
            Chunk(
                id=f"c{i:08d}",
                document_id=doc,
                index=i,
                headings="",
                body=f"body {i}",
                metadata_={"topic": topic, "shard": i % 7},
            )
        )
    embeddings = list(np.random.default_rng(start).normal(size=(count, 1, dim)).astype(np.float16))
    return chunks, embeddings


def test_save_appends_segments_not_rewrites(tmp_path):
    store = Store(str(tmp_path / "s"))
    store.add_chunks(*_mk_chunks(0, 100, doc="d1", dim=16, topic="a"))
    store.save()
    seg_dir = Path(store.path) / "segments"
    first = sorted(p.name for p in seg_dir.iterdir())
    assert len(first) == 1
    mtime0 = (seg_dir / first[0] / "embeddings.npy").stat().st_mtime_ns
    store.add_chunks(*_mk_chunks(100, 50, doc="d2", dim=16, topic="b"))
    store.save()
    second = sorted(p.name for p in seg_dir.iterdir())
    assert len(second) == 2  # append-only: a new segment, old untouched
    assert (seg_dir / first[0] / "embeddings.npy").stat().st_mtime_ns == mtime0
    # Reload reconstructs the full log in order, with mmap'd embeddings.
    reloaded = Store(str(tmp_path / "s"))
    assert reloaded.chunk_order == store.chunk_order
    assert isinstance(reloaded.embeddings[reloaded.chunk_order[0]], np.memmap) or (
        reloaded.embeddings[reloaded.chunk_order[0]].base is not None
    )
    np.testing.assert_array_equal(
        np.asarray(reloaded.embeddings["c00000042"]), np.asarray(store.embeddings["c00000042"])
    )


def test_empty_save_noop(tmp_path):
    store = Store(str(tmp_path / "s"))
    store.add_chunks(*_mk_chunks(0, 10, doc="d1", dim=8, topic="a"))
    store.save()
    seg_dir = Path(store.path) / "segments"
    n_before = len(list(seg_dir.iterdir()))
    store.save()  # nothing new: no extra segment
    assert len(list(seg_dir.iterdir())) == n_before


@pytest.mark.slow
def test_million_chunk_save_reload_bounded(tmp_path):
    """Insert -> save -> reload 1M synthetic chunks in bounded time
    (VERDICT round-1 item 6). dim=32 keeps the fixture ~64 MB."""
    store = Store(str(tmp_path / "big"))
    n, batch, dim = 1_000_000, 250_000, 32
    t0 = time.perf_counter()
    for start in range(0, n, batch):
        chunks = [
            Chunk(
                id=f"c{i:08d}", document_id=f"d{i // 1000}", index=i,
                headings="", body="", metadata_={"shard": i % 13},
            )
            for i in range(start, start + batch)
        ]
        embeddings = np.zeros((batch, 1, dim), dtype=np.float16)
        embeddings[:, 0, 0] = 1.0
        store.add_chunks(chunks, list(embeddings))
        store.save()
    t_build = time.perf_counter() - t0
    assert len(store.chunk_order) == n
    t0 = time.perf_counter()
    reloaded = Store(str(tmp_path / "big"))
    t_load = time.perf_counter() - t0
    assert len(reloaded.chunk_order) == n
    assert reloaded.embeddings["c00500000"].shape == (1, dim)
    # Bounded: generous ceilings that still catch O(corpus^2) regressions.
    assert t_build < 240, f"build took {t_build:.1f}s"
    assert t_load < 120, f"load took {t_load:.1f}s"
    # Filtered-search host overhead at 1M chunks (VERDICT item 4): the
    # postings mask must be computable in <5 ms... per-query, after warmup.
    reloaded.chunk_mask_for_filter({"shard": 3})
    t0 = time.perf_counter()
    mask = reloaded.chunk_mask_for_filter({"shard": 3})
    t_mask = time.perf_counter() - t0
    assert mask.sum() == sum(1 for i in range(n) if i % 13 == 3)
    assert t_mask < 0.1, f"filter mask took {t_mask * 1e3:.1f} ms"


@pytest.mark.slow
def test_shard_scale_open_bounded_at_10m_over_8(tmp_path):
    """One v5e-8 shard of the 10M-chunk north star is 1.25M chunks
    (BASELINE.md).  A host that owns a shard must (re)open its store
    lazily — no chunk-record decodes, time O(segments), and the filtered
    mask must answer from sidecar postings at per-query speed.  This pins
    the per-shard host-side bound of the 10M design point end-to-end
    (VERDICT r4 task #9; the 10M x 8 aggregate run is
    scripts/store_scale_run.py --chunks 10000000, numbers in PARITY.md)."""
    from raglite_tpu.store import _LazyChunks, _Segment

    store = Store(str(tmp_path / "shard"))
    n, batch, dim = 1_250_000, 250_000, 32
    for start in range(0, n, batch):
        chunks = [
            Chunk(
                id=f"c{i:08d}", document_id=f"d{i // 1000}", index=i,
                headings="", body="", metadata_={"shard": i % 13},
            )
            for i in range(start, start + batch)
        ]
        embeddings = np.zeros((batch, 1, dim), dtype=np.float16)
        embeddings[:, 0, 0] = 1.0
        store.add_chunks(chunks, list(embeddings))
        store.save()

    decoded = []
    original_record = _Segment.record

    def counting_record(self, local):
        decoded.append(local)
        return original_record(self, local)

    _Segment.record = counting_record
    try:
        t0 = time.perf_counter()
        shard = Store(str(tmp_path / "shard"))
        t_open = time.perf_counter() - t0
        assert isinstance(shard.chunks, _LazyChunks)
        assert decoded == [], "shard open decoded chunk records"
        assert len(shard.chunk_order) == n
        # 5M opened in 10.5 s (r3, PARITY.md); a 1.25M shard gets 2 s of
        # budget plus generous CI headroom.
        assert t_open < 8, f"shard open took {t_open:.1f}s"
        shard.chunk_mask_for_filter({"shard": 3})  # warm the postings map
        t0 = time.perf_counter()
        mask = shard.chunk_mask_for_filter({"shard": 3})
        t_mask = time.perf_counter() - t0
        assert mask.sum() == sum(1 for i in range(n) if i % 13 == 3)
        assert t_mask < 0.1, f"filter mask took {t_mask * 1e3:.1f} ms"
        assert decoded == [], "filtered mask decoded chunk records"
    finally:
        _Segment.record = original_record


def test_metadata_postings_match_scan(tmp_path):
    store = Store(":memory:")
    store.add_chunks(*_mk_chunks(0, 200, doc="d1", dim=8, topic="alpha"))
    store.add_chunks(*_mk_chunks(200, 100, doc="d2", dim=8, topic="beta"))
    for flt in (
        {"topic": "alpha"},
        {"topic": ["alpha", "beta"]},
        {"topic": "beta", "shard": 3},
        {"topic": "missing"},
        {"nosuchfield": 1},
    ):
        np.testing.assert_array_equal(
            store.chunk_mask_for_filter(flt), store._chunk_mask_scan(flt), err_msg=str(flt)
        )


def test_tombstones_and_compaction(tmp_path):
    store = Store(str(tmp_path / "s"))
    store.add_chunks(*_mk_chunks(0, 60, doc="d1", dim=8, topic="a"))
    store.add_chunks(*_mk_chunks(60, 40, doc="d2", dim=8, topic="b"))
    store.save()
    gen0 = store.generation
    # Deleting the larger doc crosses the 50% tombstone threshold -> compaction.
    store.delete_documents(["d1"])
    assert store.generation == gen0 + 1
    assert not store.deleted_chunks
    assert len(store.chunk_order) == 40
    assert store.chunk_mask_for_filter({"topic": "b"}).sum() == 40
    store.save()
    reloaded = Store(str(tmp_path / "s"))
    assert reloaded.chunk_order == store.chunk_order


def test_tombstones_below_threshold_keep_log(tmp_path):
    store = Store(str(tmp_path / "s"))
    store.add_chunks(*_mk_chunks(0, 20, doc="d1", dim=8, topic="a"))
    store.add_chunks(*_mk_chunks(20, 80, doc="d2", dim=8, topic="b"))
    store.save()
    store.delete_documents(["d1"])  # 20% tombstones: no compaction
    assert len(store.deleted_chunks) == 20
    assert len(store.chunk_order) == 100
    assert store.num_alive_chunks == 80
    # Filter masks exclude tombstones.
    assert store.chunk_mask_for_filter({"topic": "a"}).sum() == 0
    mask = store.alive_mask()
    assert mask is not None and mask.sum() == 80
    store.save()
    reloaded = Store(str(tmp_path / "s"))
    assert reloaded.num_alive_chunks == 80
    assert reloaded.deleted_chunks == store.deleted_chunks


def test_concurrent_writers_merge_not_clobber(tmp_path):
    """Two writer processes (simulated as two Store instances loaded from the
    same snapshot) must both survive: B's save must absorb A's committed
    segments instead of rewriting the head from its stale in-memory state
    (regression: doc1 was silently orphaned)."""
    path = str(tmp_path / "s")
    base = Store(path)
    base.add_chunks(*_mk_chunks(0, 10, doc="d0", dim=16, topic="base"))
    base.documents["d0"] = __import__("raglite_tpu.documents", fromlist=["Document"]).Document(
        id="d0", filename="base.md", url=None, metadata_={}, content=None
    )
    base.save()
    # Both "processes" load the same on-disk snapshot.
    a = Store(path)
    b = Store(path)
    from raglite_tpu.documents import Document

    a.documents["dA"] = Document(id="dA", filename="a.md", url=None, metadata_={}, content=None)
    a.add_chunks(*_mk_chunks(100, 5, doc="dA", dim=16, topic="a"))
    with a.write_lock():
        a.save()
    b.documents["dB"] = Document(id="dB", filename="b.md", url=None, metadata_={}, content=None)
    b.add_chunks(*_mk_chunks(200, 5, doc="dB", dim=16, topic="b"))
    with b.write_lock():
        b.save()
    merged = Store(path)
    assert set(merged.documents) == {"d0", "dA", "dB"}
    assert len(merged.chunk_order) == 20
    # A's chunks precede B's (disk log order), all embeddings intact.
    assert merged.chunk_order[:10] == base.chunk_order
    assert "c00000100" in merged.chunks and "c00000200" in merged.chunks
    np.testing.assert_array_equal(
        np.asarray(merged.embeddings["c00000102"]), np.asarray(a.embeddings["c00000102"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged.embeddings["c00000203"]), np.asarray(b.embeddings["c00000203"])
    )
    # Postings cover the merged log (ordinals shifted for B's suffix).
    mask = merged.chunk_mask_for_filter({"topic": "b"})
    assert mask.sum() == 5
    assert mask[15:].all()


def test_concurrent_delete_and_insert_merge(tmp_path):
    """A deletes (tombstones) while B inserts from a stale snapshot: the
    union of tombstones must survive B's save."""
    path = str(tmp_path / "s")
    from raglite_tpu.documents import Document

    base = Store(path)
    base.documents["d0"] = Document(id="d0", filename="x.md", url=None, metadata_={}, content=None)
    base.documents["d1"] = Document(id="d1", filename="y.md", url=None, metadata_={}, content=None)
    base.add_chunks(*_mk_chunks(0, 10, doc="d0", dim=16, topic="base"))
    base.add_chunks(*_mk_chunks(10, 10, doc="d1", dim=16, topic="keep"))
    base.save()
    a = Store(path)
    b = Store(path)
    with a.write_lock():
        a.delete_documents(["d0"])  # 10/20 tombstones: below compaction threshold
        a.save()
    b.add_chunks(*_mk_chunks(100, 4, doc="dB", dim=16, topic="b"))
    b.documents["dB"] = Document(id="dB", filename="b.md", url=None, metadata_={}, content=None)
    with b.write_lock():
        b.save()
    merged = Store(path)
    assert merged.deleted_chunks >= {f"c{i:08d}" for i in range(10)}
    assert merged.num_alive_chunks == 14
    alive = merged.alive_mask()
    assert alive is not None and alive.sum() == 14


def test_bm25_len_norm_ignores_tombstones(tmp_path):
    """BM25's avg_len must average over alive chunks only: deleting half the
    corpus (below the compaction threshold via two docs) must not change the
    length normalization of the survivors (regression: tombstoned slots with
    doc_len 0 halved avg_len until compaction snapped it back)."""
    from raglite_tpu.documents import Document
    from raglite_tpu.index.keyword import KeywordIndex

    path = str(tmp_path / "s")
    store = Store(path)
    store.documents["dA"] = Document(id="dA", filename="a", url=None, metadata_={}, content=None)
    store.documents["dB"] = Document(id="dB", filename="b", url=None, metadata_={}, content=None)
    chunks_a, emb_a = _mk_chunks(0, 5, doc="dA", dim=8, topic="a")
    chunks_b, emb_b = _mk_chunks(5, 5, doc="dB", dim=8, topic="b")
    for c in chunks_b:
        c.body = "survivor words common token " + c.body
    store.add_chunks(chunks_a + chunks_b, emb_a + emb_b)

    index = KeywordIndex()
    index.sync(store)
    store.delete_documents(["dA"])  # 5/10 tombstones: no compaction
    index.sync(store)
    norm_after_delete = index._len_norm(len(index.chunk_ids))

    fresh_store = Store(str(tmp_path / "fresh"))
    fresh_store.add_chunks(chunks_b, emb_b)
    fresh = KeywordIndex()
    fresh.sync(fresh_store)
    norm_fresh = fresh._len_norm(len(fresh.chunk_ids))
    # Survivors occupy ordinals 5..9 in the tombstoned index, 0..4 fresh.
    np.testing.assert_allclose(norm_after_delete[5:10], norm_fresh[:5], rtol=1e-6)


def test_absorb_does_not_resurrect_own_deletes(tmp_path):
    """B deletes a document while A concurrently saved: B's save absorbs A's
    head but must NOT re-adopt the document/evals/chunk records B itself
    deleted (regression: the merge resurrected them on disk and in memory)."""
    from raglite_tpu.documents import Document

    path = str(tmp_path / "s")
    base = Store(path)
    base.documents["d0"] = Document(id="d0", filename="x", url=None, metadata_={}, content=None)
    base.documents["d1"] = Document(id="d1", filename="y", url=None, metadata_={}, content=None)
    base.add_chunks(*_mk_chunks(0, 10, doc="d0", dim=8, topic="gone"))
    base.add_chunks(*_mk_chunks(10, 10, doc="d1", dim=8, topic="keep"))
    base.save()
    a = Store(path)
    b = Store(path)
    a.add_chunks(*_mk_chunks(100, 3, doc="d1", dim=8, topic="keep"))
    with a.write_lock():
        a.save()
    with b.write_lock():
        b.delete_documents(["d0"])  # 10/20: below compaction threshold
        b.save()
    # In B's memory and on disk, d0 stays deleted despite the absorb.
    assert not b.has_document("d0")
    assert all(b.chunks.get(f"c{i:08d}") is None for i in range(10))
    merged = Store(path)
    assert "d0" not in merged.documents
    assert merged.deleted_chunks >= {f"c{i:08d}" for i in range(10)}
    assert merged.num_alive_chunks == 13  # d1's 10 + A's 3


def test_local_tombstones_cleared_after_durable_save(tmp_path):
    """Once save() has durably committed a delete, the instance must forget
    its local tombstone: a legitimate LATER re-insert of the same document
    id by another process is then absorbed instead of silently dropped (and
    the set stays bounded on long-lived instances)."""
    from raglite_tpu.documents import Document

    path = str(tmp_path / "s")
    base = Store(path)
    base.documents["d0"] = Document(id="d0", filename="x", url=None, metadata_={}, content=None)
    base.add_chunks(*_mk_chunks(0, 4, doc="d0", dim=8, topic="t"))
    base.save()

    a = Store(path)
    with a.write_lock():
        a.delete_documents(["d0"])
        a.save()
    assert not a._locally_deleted_documents  # durable commit clears the set

    # Another process re-inserts d0 AFTER a's delete committed.
    b = Store(path)
    b.documents["d0"] = Document(id="d0", filename="x", url=None, metadata_={}, content=None)
    b.add_chunks(*_mk_chunks(100, 4, doc="d0", dim=8, topic="t"))
    with b.write_lock():
        b.save()

    with a.write_lock():
        a.absorb_concurrent()
    assert a.has_document("d0"), "legitimate re-insert dropped by stale local tombstone"


def test_lazy_open_decodes_only_touched_records(tmp_path):
    """A v3 store opens WITHOUT decoding chunk records (ids/postings come
    from sidecars); records decode per touch, deletes resolve through the
    doc sidecars, filtered masks and neighbor lookups match the eager
    semantics (VERDICT r2 task #7: resident memory O(touched))."""
    from raglite_tpu.documents import Document
    from raglite_tpu.store import _LazyChunks, _Segment

    store = Store(str(tmp_path / "s"))
    for d in range(4):
        doc_id = f"doc{d}"
        store.documents[doc_id] = Document(
            id=doc_id, filename=f"{doc_id}.md", url=None, metadata_={}, content=None
        )
        chunks, embeddings = _mk_chunks(d * 50, 50, doc=doc_id, dim=16, topic=f"t{d % 2}")
        store.add_chunks(chunks, embeddings)
    store.save()

    decoded = []
    original_record = _Segment.record

    def counting_record(self, local):
        decoded.append((self.start, local))
        return original_record(self, local)

    _Segment.record = counting_record
    try:
        lazy = Store(str(tmp_path / "s"))
        assert isinstance(lazy.chunks, _LazyChunks)
        assert decoded == [], "open decoded chunk records"
        assert len(lazy.chunk_order) == 200
        # Metadata postings answer from sidecars — still no decode.
        mask = lazy.chunk_mask_for_filter({"topic": "t1"})
        assert decoded == []
        scan = np.array(
            [
                (c := lazy.chunks.get(cid)) is not None and c.metadata_.get("topic") == "t1"
                for cid in lazy.chunk_order
            ]
        )
        np.testing.assert_array_equal(mask, scan)
        decoded.clear()
        # Touch three records: exactly three decodes.
        for cid in lazy.chunk_order[:3]:
            chunk = lazy.chunks[cid]
            assert chunk.body.startswith("body")
        assert len(decoded) == 3
        # Embeddings resolve as views without record decodes.
        emb = lazy.embeddings[lazy.chunk_order[42]]
        np.testing.assert_array_equal(np.asarray(emb), np.asarray(store.embeddings[store.chunk_order[42]]))
        # Neighbor lookup builds its map from sidecars.
        decoded.clear()
        seed = lazy.get_chunk(lazy.chunk_order[10])
        neighbors = lazy.neighbor_chunks(seed)
        assert {c.index for c in neighbors} == {seed.index - 1, seed.index + 1}
        assert len(decoded) <= 4  # seed + the two neighbors only
        # Deleting a document resolves its chunks via the doc sidecar.
        decoded.clear()
        removed = lazy.delete_documents(["doc2"])
        assert len(removed) == 50
        assert decoded == [], "delete decoded records"
        assert all(lazy.chunks.get(cid) is None for cid in removed)
        assert lazy.num_alive_chunks == 150
        assert lazy.num_embedding_vectors == 200  # embeddings stay until compaction
    finally:
        _Segment.record = original_record


def test_keyword_postings_bounded_under_churn(tmp_path):
    """Insert/delete churn must not rebuild the BM25 postings on every
    delete (the reference rebuilds its FTS index on every mutation,
    _delete.py:130-178) NOR let dead postings grow without bound: deletes
    mask at query time and one amortized rebuild fires past the dead-
    fraction threshold.  Dead chunks never surface in results, and the
    churned index ranks exactly like a fresh build (VERDICT r2 task #8)."""
    from raglite_tpu.documents import Document
    from raglite_tpu.index.keyword import KeywordIndex

    store = Store(str(tmp_path / "s"))
    topics = ["prism light refraction", "yeast dough bread", "basalt lava column",
              "glacier ice moraine", "violin string resonance"]

    def add_doc(tag: int) -> str:
        doc_id = f"d{tag:04d}"
        store.documents[doc_id] = Document(
            id=doc_id, filename=f"{doc_id}.md", url=None, metadata_={}, content=None
        )
        chunks = [
            Chunk(
                id=f"{doc_id}-c{j}", document_id=doc_id, index=j, headings="",
                body=f"{topics[tag % len(topics)]} passage {tag} part {j}",
                metadata_={},
            )
            for j in range(2)
        ]
        store.add_chunks(chunks, [np.zeros((1, 8), np.float16) for _ in chunks])
        return doc_id

    live = [add_doc(i) for i in range(10)]
    index = KeywordIndex()
    index._native = None  # inspect the dict postings directly
    index.sync(store)
    rebuilds = 0
    original_rebuild = index.rebuild

    def counting_rebuild(s):
        nonlocal rebuilds
        rebuilds += 1
        original_rebuild(s)

    index.rebuild = counting_rebuild

    def total_postings() -> int:
        return sum(len(bucket) for bucket in index._postings.values())

    next_tag = 10
    for _ in range(40):  # 40 delete+insert cycles over a 10-doc corpus
        victim = live.pop(0)
        store.delete_documents([victim])
        live.append(add_doc(next_tag))
        next_tag += 1
        index.sync(store)
        ids, _ = index.search(
            "refraction passage", num_hits=8, chunk_mask=store.alive_mask()
        )
        assert all(not cid.startswith(victim) for cid in ids)
        assert all(cid not in store.deleted_chunks for cid in ids)
    # Amortization: far fewer rebuilds than mutations, but at least one
    # (40 deletes of 2 chunks each over a ~20-alive-chunk corpus crosses
    # the 30% stale fraction repeatedly).
    assert 1 <= rebuilds < 20, rebuilds
    # Bounded: postings entries cover the ~20 alive chunks plus at most the
    # stale-dead slack — nowhere near the 100 chunks ever inserted.  (~7
    # unique terms per chunk body.)
    alive_chunks = store.num_alive_chunks
    assert total_postings() <= 8 * alive_chunks * (1 + index.REBUILD_DEAD_FRACTION) + 16, (
        total_postings(), alive_chunks
    )
    # Exactness after churn: identical ranking to a fresh build.
    fresh = KeywordIndex()
    fresh._native = None
    fresh.sync(store)
    for query in ("refraction passage", "yeast dough", "violin resonance"):
        churned = index.search(query, num_hits=6, chunk_mask=store.alive_mask())
        rebuilt = fresh.search(query, num_hits=6, chunk_mask=store.alive_mask())
        assert churned[0] == rebuilt[0], query
        np.testing.assert_allclose(churned[1], rebuilt[1], rtol=2e-2)


def test_concurrent_same_document_insert_dedups(tmp_path):
    """Two processes inserting the SAME document: the second must dedup
    against the first's committed state under the lock (regression: the
    dedup ran before the lock/absorb and both committed duplicates)."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents
    from raglite_tpu.store import _store_for_path

    path = str(tmp_path / "kb")
    text = "# Dup\n\nThe same document inserted twice from two processes. " * 6
    config = RAGLiteConfig(store_path=path, embedder="hash:256", llm="echo")
    insert_documents([Document.from_text(text)], config=config)
    first = Store(path)  # fresh read of the committed state
    n_first = len(first.chunk_order)

    # Simulate process B: a second Store instance (stale snapshot semantics
    # come from the lru-cached store, which already holds the post-insert
    # state here, so drive B's path through a raw Store + the same API).
    _store_for_path.cache_clear()
    insert_documents([Document.from_text(text)], config=config)
    merged = Store(path)
    assert len(merged.chunk_order) == n_first, "duplicate chunks committed"
    assert len(merged.chunk_order) == len(set(merged.chunk_order))
