"""Host-side document/chunk store.

Replaces the reference's SQL backends (DuckDB / PostgreSQL,
/root/reference/src/raglite/_database.py:518-646) with an append-only
columnar store designed for the 10M-chunk north star:

- **Append-only chunk log**: ``chunk_order`` only ever grows; deletes mark
  tombstones (``deleted_chunks``) instead of renumbering, so the device
  index maps deletes to an O(1) valid-mask flip rather than a rebuild
  (replacing DuckDB's delete + ``hnsw_compact_index`` + FTS rebuild,
  _delete.py:130-178).  Compaction rewrites the log when the tombstone
  fraction crosses a threshold.
- **Segment persistence**: each ``save()`` appends one segment directory
  (records msgpack + stacked fp16 embeddings ``.npy``) holding only the
  chunks added since the previous save, plus a small rewritten head file
  (documents/metadata/evals/tombstones).  Saving N new chunks is O(N),
  not O(corpus); loading memory-maps the per-segment embedding files so
  resident memory stays bounded.
- **Metadata ordinal postings**: per (field, value) lists of chunk
  ordinals maintained incrementally on insert, so a filtered search
  computes its chunk mask from the postings union/intersection in
  O(matching) instead of an O(corpus) Python scan (the reference plans
  filters inside SQL, _search.py:96-141).

The store is the durable checkpoint (the reference treats its database the
same way, SURVEY §5.4); device indexes (index/dense.py, index/keyword.py)
rebuild or incrementally sync from it.

Concurrency mirrors the reference: an ``lru_cache``d store per path
(_database.py:518), and a ``FileLock`` serializing cross-process writers
(_insert.py:213-219).
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict
from functools import lru_cache
from pathlib import Path
from typing import TYPE_CHECKING, Any

import msgpack
import numpy as np
from filelock import FileLock

from raglite_tpu.documents import Chunk, Document, Eval
from raglite_tpu.types import ChunkId, DocumentId

if TYPE_CHECKING:
    from raglite_tpu.config import RAGLiteConfig

_FORMAT_VERSION = 2

#: Compact the chunk log when tombstones exceed this fraction of it.
COMPACTION_TOMBSTONE_FRACTION = 0.5


class Store:
    """In-memory tables over an append-only chunk log, with optional
    segment-directory persistence."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.persistent = path != ":memory:"
        self.documents: dict[DocumentId, Document] = {}
        self.chunks: dict[ChunkId, Chunk] = {}
        #: Chunk ids in insertion order — append-only; this IS the device
        #: index row-group order.  Deletes tombstone, never remove.
        self.chunk_order: list[ChunkId] = []
        #: Tombstoned chunk ids (still present in chunk_order/embeddings
        #: until compaction; masked out of every search).
        self.deleted_chunks: set[ChunkId] = set()
        #: Multi-vector embedding matrix per chunk (np.float16 [m, d];
        #: views into mmap'd segment files after a load).
        self.embeddings: dict[ChunkId, np.ndarray] = {}
        #: Metadata field name -> known values (reference: Metadata table,
        #: _database.py:465-472; drives self-query filter extraction).
        self.metadata: dict[str, list[Any]] = {}
        #: field -> value -> chunk ordinals holding it (incremental; powers
        #: O(matching) filtered search instead of an O(corpus) scan).
        self._meta_postings: dict[str, dict[Any, list[int]]] = {}
        #: Auxiliary state, e.g. the query adapter (reference: IndexMetadata
        #: table, _database.py:433-462) — persisted WITHOUT pickle.
        self.index_metadata: dict[str, Any] = {}
        self.evals: dict[str, Eval] = {}
        #: Monotonic counter bumped on every mutation; device indexes
        #: compare it to decide when to resync.
        self.version = 0
        #: Monotonic counter bumped on every compaction (device indexes
        #: must full-rebuild when it changes).
        self.generation = 0
        #: Chunks [0:_saved_chunks) are already persisted in segments.
        self._saved_chunks = 0
        #: Segment directory names this store tracks, in chunk-log order.
        #: The head lists exactly these — never whatever happens to be on
        #: disk — so an orphan dir from a crashed save is never adopted.
        self._segments: list[str] = []
        #: Segments superseded by a compaction; deleted only AFTER the next
        #: save has durably written their replacement + head.
        self._stale_segments: list[str] = []
        #: (version, generation, segments) of the on-disk head as of our
        #: last load/save.  save() compares this against the actual head to
        #: detect a concurrent writer (whose segments and tombstones must be
        #: absorbed, not silently orphaned by our head rewrite).
        self._disk_state: tuple[int, int, tuple[str, ...]] = (0, 0, ())
        #: Documents THIS instance deleted — a concurrent-writer absorb must
        #: not re-adopt them (their records live on in the other writer's
        #: stale head until our save lands).
        self._locally_deleted_documents: set[DocumentId] = set()
        if self.persistent:
            Path(path).mkdir(parents=True, exist_ok=True)
            self._load()

    # --- Concurrency ----------------------------------------------------

    def write_lock(self):
        """Cross-process writer lock (reference: _insert.py:213-219)."""
        if self.persistent:
            return FileLock(str(Path(self.path) / ".lock"))
        import contextlib

        return contextlib.nullcontext()

    # --- Mutations ------------------------------------------------------

    def add_document(self, document: Document) -> None:
        record = Document(
            id=document.id,
            filename=document.filename,
            url=document.url,
            metadata_=document.metadata_,
            content=None,  # content is never persisted (reference: _database.py:78)
        )
        self.documents[document.id] = record
        self._locally_deleted_documents.discard(document.id)
        self.version += 1

    def _post_metadata(self, ordinal: int, metadata: dict[str, Any]) -> None:
        for key, value in metadata.items():
            values = value if isinstance(value, list) else [value]
            for v in values:
                if isinstance(v, (str, int, float, bool)):
                    self._meta_postings.setdefault(key, {}).setdefault(v, []).append(ordinal)

    def add_chunks(self, chunks: list[Chunk], embeddings: list[np.ndarray]) -> None:
        for chunk, matrix in zip(chunks, embeddings):
            ordinal = len(self.chunk_order)
            self.chunks[chunk.id] = chunk
            self.chunk_order.append(chunk.id)
            self.embeddings[chunk.id] = np.asarray(matrix, dtype=np.float16)
            self._post_metadata(ordinal, chunk.metadata_)
        self.version += 1

    def delete_documents(self, document_ids: list[DocumentId]) -> list[ChunkId]:
        """Tombstone every chunk of the given documents (O(doc chunks), no
        renumbering); compaction reclaims space when tombstones dominate."""
        doomed = set(document_ids)
        removed: list[ChunkId] = []
        for cid, chunk in list(self.chunks.items()):
            if chunk.document_id in doomed:
                removed.append(cid)
                del self.chunks[cid]
                self.deleted_chunks.add(cid)
        for did in document_ids:
            self.documents.pop(did, None)
            self._locally_deleted_documents.add(did)
        for eid in [e for e, ev in self.evals.items() if ev.document_id in doomed]:
            del self.evals[eid]
        self.version += 1
        if (
            self.chunk_order
            and len(self.deleted_chunks) / len(self.chunk_order) > COMPACTION_TOMBSTONE_FRACTION
        ):
            self.compact()
        return removed

    def compact(self) -> None:
        """Rewrite the chunk log without tombstones (the analogue of the
        reference's ``hnsw_compact_index`` + FTS rebuild postlude)."""
        alive = [cid for cid in self.chunk_order if cid not in self.deleted_chunks]
        self.chunk_order = alive
        self.embeddings = {cid: self.embeddings[cid] for cid in alive}
        self.deleted_chunks = set()
        self._meta_postings = {}
        for ordinal, cid in enumerate(alive):
            self._post_metadata(ordinal, self.chunks[cid].metadata_)
        self.generation += 1
        self.version += 1
        # All current segments are superseded, but they stay on disk until
        # the NEXT save() has durably written the compacted replacement and
        # the head that references it — a crash mid-compaction must never
        # lose the only copy of the embeddings.  (In-memory mmap views into
        # the old files stay valid even after unlink on POSIX.)
        self._stale_segments.extend(self._segments)
        self._segments = []
        self._saved_chunks = 0  # next save rewrites the full log

    def update_metadata(self, values: dict[str, set[Any]]) -> None:
        for key, vals in values.items():
            existing = self.metadata.setdefault(key, [])
            for v in vals:
                if v not in existing:
                    existing.append(v)
        self.version += 1

    def prune_metadata(self) -> None:
        """Drop metadata values no remaining document holds
        (reference: _delete.py:67-104; recomputed from the surviving
        documents, so no argument is needed)."""
        remaining: dict[str, set[Any]] = {}
        for doc in self.documents.values():
            for key, value in doc.metadata_.items():
                vals = value if isinstance(value, list) else [value]
                remaining.setdefault(key, set()).update(
                    v for v in vals if isinstance(v, (str, int, float, bool))
                )
        for key in list(self.metadata):
            kept = [v for v in self.metadata[key] if v in remaining.get(key, set())]
            if kept:
                self.metadata[key] = kept
            else:
                del self.metadata[key]
        self.version += 1

    def set_index_metadata(self, key: str, value: Any) -> None:
        self.index_metadata[key] = value
        self.version += 1

    def add_evals(self, evals: list[Eval]) -> None:
        for ev in evals:
            self.evals[ev.id] = ev
        self.version += 1

    # --- Queries --------------------------------------------------------

    def has_document(self, document_id: DocumentId) -> bool:
        return document_id in self.documents

    @property
    def num_alive_chunks(self) -> int:
        return len(self.chunk_order) - len(self.deleted_chunks)

    def alive_chunk_ids(self) -> list[ChunkId]:
        if not self.deleted_chunks:
            return list(self.chunk_order)
        return [cid for cid in self.chunk_order if cid not in self.deleted_chunks]

    def alive_mask(self) -> np.ndarray | None:
        """Bool mask over chunk ordinals, or None when nothing is deleted
        (cached per store version — searches call this per query)."""
        if not self.deleted_chunks:
            return None
        cached = getattr(self, "_alive_mask_cache", None)
        if cached is not None and cached[0] == self.version:
            return cached[1]
        mask = np.ones(len(self.chunk_order), dtype=np.bool_)
        deleted = self.deleted_chunks
        for i, cid in enumerate(self.chunk_order):
            if cid in deleted:
                mask[i] = False
        self._alive_mask_cache = (self.version, mask)
        return mask

    def get_chunk(self, chunk_id: ChunkId) -> Chunk | None:
        chunk = self.chunks.get(chunk_id)
        if chunk is not None:
            chunk.document = self.documents.get(chunk.document_id)
            chunk._embedding_matrix = self.embeddings.get(chunk_id)
        return chunk

    def neighbor_chunks(self, chunk: Chunk, offsets: tuple[int, ...] = (-1, 1)) -> list[Chunk]:
        """Chunks adjacent by (document_id, index) (reference: _search.py:311-330).

        O(1) per neighbor via a (document_id, index) map cached per store
        version — span retrieval at 10M chunks must not scan the table."""
        cached = getattr(self, "_position_cache", None)
        if cached is None or cached[0] != self.version:
            position = {(c.document_id, c.index): cid for cid, c in self.chunks.items()}
            self._position_cache = (self.version, position)
        else:
            position = cached[1]
        out = []
        for off in offsets:
            cid = position.get((chunk.document_id, chunk.index + off))
            if cid is not None:
                found = self.get_chunk(cid)
                if found is not None:
                    out.append(found)
        return out

    def chunk_metadata_matches(self, chunk: Chunk, metadata_filter: dict[str, Any]) -> bool:
        """JSON-containment semantics: every filter key's value (or any of a
        list of values) must appear in the chunk's metadata
        (reference: _search.py:96-141, _delete.py:56-60)."""
        for key, wanted in metadata_filter.items():
            have = chunk.metadata_.get(key)
            have_list = have if isinstance(have, list) else [have]
            wanted_list = wanted if isinstance(wanted, list) else [wanted]
            if not any(w in have_list for w in wanted_list):
                return False
        return True

    def chunk_mask_for_filter(self, metadata_filter: dict[str, Any]) -> np.ndarray:
        """Bool mask over chunk ordinals matching the filter, from the
        incremental metadata postings: O(matching ordinals) per query, vs
        the reference's COUNT-probe SQL filter planning (_search.py:96-141)
        and round 1's O(corpus) Python scan.  Tombstoned chunks are masked.
        Falls back to the slow scan only for unindexable (non-scalar)
        filter values."""
        n = len(self.chunk_order)
        mask: np.ndarray | None = None
        for key, wanted in metadata_filter.items():
            wanted_list = wanted if isinstance(wanted, list) else [wanted]
            if not all(isinstance(w, (str, int, float, bool)) for w in wanted_list):
                return self._chunk_mask_scan(metadata_filter)
            key_mask = np.zeros(n, dtype=np.bool_)
            postings = self._meta_postings.get(key, {})
            for w in wanted_list:
                ords = postings.get(w)
                if ords:
                    key_mask[np.asarray(ords, dtype=np.int64)] = True
            mask = key_mask if mask is None else (mask & key_mask)
            if not mask.any():
                return mask
        if mask is None:
            mask = np.ones(n, dtype=np.bool_)
        alive = self.alive_mask()
        if alive is not None:
            mask &= alive
        return mask

    def _chunk_mask_scan(self, metadata_filter: dict[str, Any]) -> np.ndarray:
        mask = np.zeros(len(self.chunk_order), dtype=np.bool_)
        for i, cid in enumerate(self.chunk_order):
            chunk = self.chunks.get(cid)
            mask[i] = chunk is not None and self.chunk_metadata_matches(chunk, metadata_filter)
        return mask

    # --- Persistence ----------------------------------------------------

    def _chunk_record(self, cid: ChunkId) -> dict[str, Any]:
        c = self.chunks.get(cid)
        if c is None:  # tombstoned before ever being saved
            return {"id": cid, "document_id": "", "index": -1, "headings": "",
                    "body": "", "metadata_": {}}
        return {
            "id": c.id,
            "document_id": c.document_id,
            "index": c.index,
            "headings": c.headings,
            "body": c.body,
            "metadata_": c.metadata_,
        }

    def save(self) -> None:
        """Append a segment with the not-yet-persisted chunk-log suffix and
        rewrite the (small) head: O(new chunks), not O(corpus).

        Callers hold :meth:`write_lock`; under it, a head that moved since
        our last load/save means another process committed segments our
        in-memory state never saw — absorb them first, or the head rewrite
        would orphan that writer's data (silent cross-process loss)."""
        if not self.persistent:
            return
        root = Path(self.path)
        self.absorb_concurrent()
        new_ids = self.chunk_order[self._saved_chunks :]
        if new_ids:
            seg_name = f"seg-{self.generation:04d}-{self._saved_chunks:010d}"
            seg_dir = root / "segments" / seg_name
            seg_dir.mkdir(parents=True, exist_ok=True)
            (seg_dir / "records.msgpack").write_bytes(
                msgpack.packb([self._chunk_record(cid) for cid in new_ids], use_bin_type=True)
            )
            counts = np.asarray(
                [self.embeddings[cid].shape[0] for cid in new_ids], dtype=np.int64
            )
            stacked = np.concatenate(
                [np.asarray(self.embeddings[cid]) for cid in new_ids], axis=0
            )
            np.save(seg_dir / "embeddings.npy", stacked.astype(np.float16))
            np.save(seg_dir / "counts.npy", counts)
            self._saved_chunks = len(self.chunk_order)
            self._segments.append(seg_name)
        head = {
            "format_version": _FORMAT_VERSION,
            "version": self.version,
            "generation": self.generation,
            "documents": [
                {k: v for k, v in asdict(d).items() if k != "content"}
                for d in self.documents.values()
            ],
            "metadata": self.metadata,
            "evals": [asdict(e) for e in self.evals.values()],
            "deleted_chunks": sorted(self.deleted_chunks),
            # Exactly the tracked segments: a crashed save's orphan dir must
            # never be adopted (it would resurrect uncommitted chunks).
            "segments": list(self._segments),
        }
        tmp = root / "head.msgpack.tmp"
        tmp.write_bytes(msgpack.packb(head, use_bin_type=True))
        tmp.replace(root / "head.msgpack")
        self._disk_state = (self.version, self.generation, tuple(self._segments))
        self._save_index_metadata(root)
        # The head no longer references compaction-superseded segments;
        # NOW they are safe to delete.
        for stale in self._stale_segments:
            stale_dir = root / "segments" / stale
            if stale_dir.exists():
                shutil.rmtree(stale_dir)
        self._stale_segments = []
        # Drop pre-segment (format v1) files once superseded.
        for legacy in ("records.msgpack", "embeddings.npy", "embedding_counts.npy",
                       "manifest.json"):
            legacy_path = root / legacy
            if legacy_path.exists():
                legacy_path.unlink()
        # The head rewrite has durably committed our deletes; forgetting the
        # local tombstones now (a) bounds the set on long-lived instances and
        # (b) lets a later legitimate re-insert of the same document id by
        # ANOTHER process be absorbed instead of silently dropped.
        self._locally_deleted_documents.clear()

    def _load(self) -> None:
        root = Path(self.path)
        if (root / "head.msgpack").exists():
            self._load_segmented(root)
        elif (root / "records.msgpack").exists():
            self._load_legacy_v1(root)
        self._load_index_metadata(root)
        # Rebuild the metadata postings (O(corpus), once per open).
        self._meta_postings = {}
        for ordinal, cid in enumerate(self.chunk_order):
            chunk = self.chunks.get(cid)
            if chunk is not None:
                self._post_metadata(ordinal, chunk.metadata_)

    @staticmethod
    def _read_log(
        root: Path, head: dict[str, Any]
    ) -> tuple[list[ChunkId], dict[ChunkId, Chunk], dict[ChunkId, np.ndarray]]:
        """Read the chunk log the head describes: ordered ids, alive chunk
        records, and per-chunk views into memory-mapped embedding files."""
        deleted = set(head.get("deleted_chunks", []))
        order: list[ChunkId] = []
        chunks: dict[ChunkId, Chunk] = {}
        embeddings: dict[ChunkId, np.ndarray] = {}
        for seg_name in head.get("segments", []):
            seg_dir = root / "segments" / seg_name
            records = msgpack.unpackb((seg_dir / "records.msgpack").read_bytes(), raw=False)
            counts = np.load(seg_dir / "counts.npy")
            # Memory-map the embedding matrix: per-chunk views keep resident
            # memory bounded at 10M-chunk scale.
            stacked = np.load(seg_dir / "embeddings.npy", mmap_mode="r")
            offset = 0
            for rec, m in zip(records, counts):
                cid = rec["id"]
                order.append(cid)
                embeddings[cid] = stacked[offset : offset + int(m)]
                offset += int(m)
                if cid not in deleted and rec["index"] >= 0:
                    chunks[cid] = Chunk(
                        id=cid,
                        document_id=rec["document_id"],
                        index=rec["index"],
                        headings=rec["headings"],
                        body=rec["body"],
                        metadata_=rec["metadata_"],
                    )
        return order, chunks, embeddings

    def _load_segmented(self, root: Path) -> None:
        head = msgpack.unpackb((root / "head.msgpack").read_bytes(), raw=False)
        for d in head["documents"]:
            self.documents[d["id"]] = Document(**d)
        self.metadata = head.get("metadata", {})
        for e in head.get("evals", []):
            self.evals[e["id"]] = Eval(**e)
        self.deleted_chunks = set(head.get("deleted_chunks", []))
        self.generation = head.get("generation", 0)
        self._segments = list(head.get("segments", []))
        self.chunk_order, self.chunks, self.embeddings = self._read_log(root, head)
        self.version = head.get("version", 0)
        self._saved_chunks = len(self.chunk_order)
        self._disk_state = (self.version, self.generation, tuple(self._segments))

    def absorb_concurrent(self) -> None:
        """Adopt whatever another process committed to disk since our last
        load/save (no-op for :memory: stores or an unchanged head).

        Call under :meth:`write_lock` before decisions that must see other
        writers' state — save() always does; insert's idempotency dedup
        does too (without it, two processes inserting the same document
        would both pass the has_document check and commit duplicates)."""
        if not self.persistent:
            return
        root = Path(self.path)
        head_path = root / "head.msgpack"
        if not head_path.exists():
            return
        disk_head = msgpack.unpackb(head_path.read_bytes(), raw=False)
        disk_state = (
            disk_head.get("version", 0),
            disk_head.get("generation", 0),
            tuple(disk_head.get("segments", [])),
        )
        if disk_state != self._disk_state:
            self._absorb_disk_head(root, disk_head)
            # Remember what we just absorbed so a following save() (or a
            # second absorb) does not repeat the merge.
            self._disk_state = disk_state

    def _absorb_disk_head(self, root: Path, head: dict[str, Any]) -> None:
        """Reconcile with a head another process committed since our last
        load/save: adopt its log as the persisted prefix and replay our
        unsaved chunks on top.

        Ordinals of our unsaved chunks shift, so the generation bumps —
        device indexes treat that as a full-rebuild signal.  Limitations
        (documented, not silent): a document another process deleted while
        we held its record stays deleted at the chunk level (tombstone
        union) but its document record may reappear in the head."""
        order, chunks, embeddings = self._read_log(root, head)
        disk_ids = set(order)
        suffix = [
            cid for cid in self.chunk_order[self._saved_chunks :] if cid not in disk_ids
        ]
        # Merge row tables (disk's view, then ours for anything it lacks) —
        # but never re-adopt documents/evals THIS instance deleted (the disk
        # head may predate our delete).
        for d in head.get("documents", []):
            if d["id"] not in self._locally_deleted_documents:
                self.documents.setdefault(d["id"], Document(**d))
        for e in head.get("evals", []):
            if e["document_id"] not in self._locally_deleted_documents:
                self.evals.setdefault(e["id"], Eval(**e))
        for key, vals in head.get("metadata", {}).items():
            existing = self.metadata.setdefault(key, [])
            for v in vals:
                if v not in existing:
                    existing.append(v)
        self.deleted_chunks |= set(head.get("deleted_chunks", []))
        # _read_log filtered chunk records by the DISK head's tombstones
        # only; drop the ones WE tombstoned so our deletes survive the merge.
        for cid in self.deleted_chunks:
            chunks.pop(cid, None)
        for cid in suffix:
            if cid in self.chunks:
                chunks[cid] = self.chunks[cid]
            embeddings[cid] = np.asarray(self.embeddings[cid], dtype=np.float16)
        self.chunk_order = order + suffix
        self.chunks = chunks
        self.embeddings = embeddings
        self._segments = list(head.get("segments", []))
        self._saved_chunks = len(order)
        # Segments the disk head still references must never be deleted as
        # "stale" — they belong to the other writer's committed state.
        self._stale_segments = [
            s for s in self._stale_segments if s not in set(self._segments)
        ]
        # Ordinals changed: rebuild postings and force device-index rebuilds.
        self._meta_postings = {}
        for ordinal, cid in enumerate(self.chunk_order):
            chunk = self.chunks.get(cid)
            if chunk is not None:
                self._post_metadata(ordinal, chunk.metadata_)
        self.generation = max(self.generation, head.get("generation", 0)) + 1
        self.version = max(self.version, head.get("version", 0)) + 1

    def _load_legacy_v1(self, root: Path) -> None:
        """Read the round-1 single-blob layout; the next save converts."""
        records = msgpack.unpackb((root / "records.msgpack").read_bytes(), raw=False)
        for d in records["documents"]:
            self.documents[d["id"]] = Document(**d)
        counts = np.load(root / "embedding_counts.npy")
        stacked = np.load(root / "embeddings.npy", mmap_mode="r")
        offset = 0
        for c, m in zip(records["chunks"], counts):
            chunk = Chunk(
                id=c["id"],
                document_id=c["document_id"],
                index=c["index"],
                headings=c["headings"],
                body=c["body"],
                metadata_=c["metadata_"],
            )
            self.chunks[chunk.id] = chunk
            self.chunk_order.append(chunk.id)
            self.embeddings[chunk.id] = stacked[offset : offset + int(m)]
            offset += int(m)
        self.metadata = records.get("metadata", {})
        for e in records.get("evals", []):
            self.evals[e["id"]] = Eval(**e)
        self.version = records.get("version", 0)
        self._saved_chunks = 0  # force the first segmented save to cover all

    def _save_index_metadata(self, root: Path) -> None:
        """Persist index_metadata without pickle: numpy arrays go into an
        ``.npz`` (loadable with allow_pickle=False), everything else into
        msgpack.  Loading a store must never execute attacker-supplied
        bytecode (the reference pickles its IndexMetadata table,
        _database.py:433-462 — a known weakness we do not inherit)."""
        arrays = {k: v for k, v in self.index_metadata.items() if isinstance(v, np.ndarray)}
        plain = {k: v for k, v in self.index_metadata.items() if not isinstance(v, np.ndarray)}
        np.savez(root / "index_metadata.npz", **arrays)
        (root / "index_metadata.msgpack").write_bytes(msgpack.packb(plain, use_bin_type=True))
        legacy = root / "index_metadata.pkl"
        if legacy.exists():
            legacy.unlink()

    def _load_index_metadata(self, root: Path) -> None:
        npz_path = root / "index_metadata.npz"
        if npz_path.exists():
            with np.load(npz_path, allow_pickle=False) as data:
                self.index_metadata = {k: data[k] for k in data.files}
        msg_path = root / "index_metadata.msgpack"
        if msg_path.exists():
            self.index_metadata.update(msgpack.unpackb(msg_path.read_bytes(), raw=False))


@lru_cache(maxsize=8)
def _store_for_path(path: str) -> Store:
    return Store(path)


def store_from_config(config: "RAGLiteConfig") -> Store:
    """Cached store per path (reference: create_database_engine lru_cache,
    _database.py:518)."""
    return _store_for_path(config.store_path)
