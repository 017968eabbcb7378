"""Host-side document/chunk store.

Replaces the reference's SQL backends (DuckDB / PostgreSQL,
/root/reference/src/raglite/_database.py:518-646) with a columnar on-disk
store: record tables serialized with msgpack, chunk-embedding matrices as
one contiguous ``.npy`` per save, and a JSON manifest.  The store is the
durable checkpoint (the reference treats its database the same way, SURVEY
§5.4); the device-side HBM index (index/dense.py) is rebuilt from it.

Concurrency mirrors the reference: an ``lru_cache``d store per path
(_database.py:518), and a ``FileLock`` serializing cross-process writers
(_insert.py:213-219).
"""

from __future__ import annotations

import json
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

_FORMAT_VERSION = 1


class Store:
    """In-memory tables with optional directory persistence."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.persistent = path != ":memory:"
        self.documents: dict[DocumentId, Document] = {}
        self.chunks: dict[ChunkId, Chunk] = {}
        #: Chunk ids in insertion order — the device index row-group order.
        self.chunk_order: list[ChunkId] = []
        #: Multi-vector embedding matrix per chunk (np.float16 [m, d]).
        self.embeddings: dict[ChunkId, np.ndarray] = {}
        #: Metadata field name -> known values (reference: Metadata table,
        #: _database.py:465-472; drives self-query filter extraction).
        self.metadata: dict[str, list[Any]] = {}
        #: Pickled auxiliary state, e.g. the query adapter (reference:
        #: IndexMetadata table, _database.py:433-462).
        self.index_metadata: dict[str, Any] = {}
        self.evals: dict[str, Eval] = {}
        #: Monotonic counter bumped on every mutation; the device index
        #: compares it to decide when to resync.
        self.version = 0
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
        self.version += 1

    def add_chunks(self, chunks: list[Chunk], embeddings: list[np.ndarray]) -> None:
        for chunk, matrix in zip(chunks, embeddings):
            self.chunks[chunk.id] = chunk
            self.chunk_order.append(chunk.id)
            self.embeddings[chunk.id] = np.asarray(matrix, dtype=np.float16)
        self.version += 1

    def delete_documents(self, document_ids: list[DocumentId]) -> list[ChunkId]:
        doomed = set(document_ids)
        removed: list[ChunkId] = []
        for cid in list(self.chunk_order):
            if self.chunks[cid].document_id in doomed:
                removed.append(cid)
                del self.chunks[cid]
                self.embeddings.pop(cid, None)
        self.chunk_order = [c for c in self.chunk_order if c not in set(removed)]
        for did in document_ids:
            self.documents.pop(did, None)
        for eid in [e for e, ev in self.evals.items() if ev.document_id in doomed]:
            del self.evals[eid]
        self.version += 1
        return removed

    def update_metadata(self, values: dict[str, set[Any]]) -> None:
        for key, vals in values.items():
            existing = self.metadata.setdefault(key, [])
            for v in vals:
                if v not in existing:
                    existing.append(v)
        self.version += 1

    def prune_metadata(self, deleted_documents: list[Document]) -> None:
        """Drop metadata values no remaining document holds
        (reference: _delete.py:67-104)."""
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

    def get_chunk(self, chunk_id: ChunkId) -> Chunk | None:
        chunk = self.chunks.get(chunk_id)
        if chunk is not None:
            chunk.document = self.documents.get(chunk.document_id)
            chunk._embedding_matrix = self.embeddings.get(chunk_id)
        return chunk

    def neighbor_chunks(self, chunk: Chunk, offsets: tuple[int, ...] = (-1, 1)) -> list[Chunk]:
        """Chunks adjacent by (document_id, index) (reference: _search.py:311-330)."""
        out = []
        for off in offsets:
            target = chunk.index + off
            for other in self.chunks.values():
                if other.document_id == chunk.document_id and other.index == target:
                    out.append(self.get_chunk(other.id))
                    break
        return [c for c in out if c is not None]

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

    # --- Persistence ----------------------------------------------------

    def save(self) -> None:
        if not self.persistent:
            return
        root = Path(self.path)
        records = {
            "format_version": _FORMAT_VERSION,
            "version": self.version,
            "documents": [
                {k: v for k, v in asdict(d).items() if k != "content"}
                for d in self.documents.values()
            ],
            "chunks": [
                {
                    "id": c.id,
                    "document_id": c.document_id,
                    "index": c.index,
                    "headings": c.headings,
                    "body": c.body,
                    "metadata_": c.metadata_,
                }
                for cid in self.chunk_order
                if (c := self.chunks[cid])
            ],
            "metadata": self.metadata,
            "evals": [asdict(e) for e in self.evals.values()],
        }
        (root / "records.msgpack").write_bytes(msgpack.packb(records, use_bin_type=True))
        # Embeddings: one stacked fp16 matrix + per-chunk row counts.
        counts = np.asarray(
            [self.embeddings[cid].shape[0] for cid in self.chunk_order], dtype=np.int64
        )
        if len(self.chunk_order):
            stacked = np.concatenate([self.embeddings[cid] for cid in self.chunk_order], axis=0)
        else:
            stacked = np.zeros((0, 0), dtype=np.float16)
        np.save(root / "embeddings.npy", stacked)
        np.save(root / "embedding_counts.npy", counts)
        self._save_index_metadata(root)
        (root / "manifest.json").write_text(
            json.dumps({"format_version": _FORMAT_VERSION, "version": self.version})
        )

    def _load(self) -> None:
        root = Path(self.path)
        rec_path = root / "records.msgpack"
        if not rec_path.exists():
            return
        records = msgpack.unpackb(rec_path.read_bytes(), raw=False)
        for d in records["documents"]:
            self.documents[d["id"]] = Document(**d)
        counts = np.load(root / "embedding_counts.npy")
        stacked = np.load(root / "embeddings.npy")
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
        self._load_index_metadata(root)
        self.version = records.get("version", 0)

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
