"""Document, Chunk, ChunkSpan, and Eval records.

Behavioral parity with the reference's SQLModel ORM tables
(/root/reference/src/raglite/_database.py:63-515), re-designed as plain
dataclasses: there is no SQL backend — records are persisted by the
host-side columnar store (store.py) and chunk embeddings live in device HBM
(index/dense.py), not in relational rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from hashlib import sha256
from pathlib import Path
from typing import Any
from xml.sax.saxutils import escape

import numpy as np
from raglite_tpu.utils.mdparse import parse_markdown

from raglite_tpu.types import ChunkId, DocumentId, EvalId, FloatMatrix


def hash_bytes(data: bytes, max_len: int = 16) -> str:
    """Content hash used for idempotent ids (reference: _database.py:58-60)."""
    return sha256(data).hexdigest()[:max_len]


def adapt_metadata(metadata: Any) -> dict[str, list[Any]]:
    """Normalize metadata values to lists (reference: _database.py:51-55)."""
    if not metadata:
        return {}
    return {k: v if isinstance(v, list) else [v] for k, v in metadata.items()}


@dataclass
class Document:
    """A document (reference: _database.py:63-205).

    ``content`` is kept on the instance but not persisted by the store —
    mirroring the reference's PrivateAttr (_database.py:78).
    """

    id: DocumentId
    filename: str
    url: str | None = None
    metadata_: dict[str, Any] = field(default_factory=dict)
    content: str | None = None

    @property
    def front_matter(self) -> str:
        """Metadata as YAML front matter (reference: _database.py:97-104)."""
        metadata_lines = "\n".join(
            f"{key}: {value}" for key, value in self.metadata_.items() if value is not None
        )
        return f"---\n{metadata_lines}\n---" if metadata_lines else ""

    @staticmethod
    def from_path(
        doc_path: Path | str,
        *,
        id: DocumentId | None = None,  # noqa: A002
        url: str | None = None,
        **kwargs: Any,
    ) -> "Document":
        """Create a document from a file path; id defaults to a content hash
        (reference: _database.py:105-149)."""
        from raglite_tpu.markdown import document_to_markdown

        doc_path = Path(doc_path)
        metadata = adapt_metadata(
            {
                "filename": doc_path.name,
                "uri": id,
                "url": url,
                "size": doc_path.stat().st_size,
                "created": doc_path.stat().st_ctime,
                "modified": doc_path.stat().st_mtime,
                **kwargs,
            }
        )
        return Document(
            id=id if id is not None else hash_bytes(doc_path.read_bytes()),
            filename=doc_path.name,
            url=url,
            metadata_=metadata,
            content=document_to_markdown(doc_path),
        )

    @staticmethod
    def from_text(
        content: str,
        *,
        id: DocumentId | None = None,  # noqa: A002
        url: str | None = None,
        filename: str | None = None,
        **kwargs: Any,
    ) -> "Document":
        """Create a document from text; filename defaults to the (truncated)
        first line (reference: _database.py:151-201)."""
        first_line = content.strip().split("\n", 1)[0].strip()
        if len(first_line) > 80:
            first_line = f"{first_line[:80]}..."
        metadata = adapt_metadata(
            {
                "filename": filename or first_line,
                "uri": id,
                "url": url,
                "size": len(content.encode()),
                **kwargs,
            }
        )
        return Document(
            id=id if id is not None else hash_bytes(content.encode()),
            filename=filename or first_line,
            url=url,
            metadata_=metadata,
            content=content,
        )

    def __repr__(self) -> str:
        return f"Document(id={self.id!r}, filename={self.filename!r})"


@dataclass
class Chunk:
    """A document chunk (reference: _database.py:207-336)."""

    id: ChunkId
    document_id: DocumentId
    index: int
    headings: str
    body: str
    metadata_: dict[str, Any] = field(default_factory=dict)
    #: Back-reference filled in by the store on retrieval (reference uses a
    #: SQLAlchemy relationship, _database.py:228-230).
    document: Document | None = field(default=None, compare=False, repr=False)
    #: Multi-vector embedding rows, filled in lazily by the store/index.
    _embedding_matrix: FloatMatrix | None = field(default=None, compare=False, repr=False)

    @staticmethod
    def from_body(
        document: Document,
        index: int,
        body: str,
        headings: str = "",
        metadata: dict[str, Any] | None = None,
        **kwargs: Any,
    ) -> "Chunk":
        """Create a chunk with a deterministic id (reference: _database.py:232-249).

        Inherited document metadata goes through ``metadata`` (a plain dict),
        never splatted as kwargs — user metadata keys named ``index``/``body``/
        ``headings``/``document`` must not collide with the parameters."""
        return Chunk(
            id=hash_bytes(f"{document.id}-{index}".encode()),
            document_id=document.id,
            index=index,
            headings=Chunk.truncate_headings(headings, body),
            body=body,
            metadata_=adapt_metadata(
                {
                    "filename": document.filename,
                    "url": document.url,
                    **(metadata or {}),
                    **kwargs,
                }
            ),
            document=document,
        )

    @staticmethod
    def extract_heading_lines(doc: str, leading_only: bool = False) -> list[str]:  # noqa: FBT001, FBT002
        """Rolling Markdown heading state h1..h6 (reference: _database.py:251-268)."""
        heading_lines = [""] * 6
        level = None
        for token in parse_markdown(doc):
            if token.type == "heading_open":
                level = int(token.tag[1]) if 1 <= int(token.tag[1]) <= 6 else None
            elif token.type == "heading_close":
                level = None
            elif level is not None:
                heading_content = token.content.strip().replace("\n", " ")
                heading_lines[level - 1] = ("#" * level) + " " + heading_content
                heading_lines[level:] = [""] * len(heading_lines[level:])
            elif leading_only and level is None and token.content and not token.content.isspace():
                break
        return heading_lines

    @staticmethod
    def truncate_headings(headings: str, body: str) -> str:
        """Drop contextual headings at or below the chunk's own leading heading
        level (reference: _database.py:270-277)."""
        heading_lines = Chunk.extract_heading_lines(headings)
        leading_body_heading_lines = Chunk.extract_heading_lines(body, leading_only=True)
        level = next((i + 1 for i, line in enumerate(leading_body_heading_lines) if line), None)
        if level:
            heading_lines[level - 1 :] = [""] * len(heading_lines[level - 1 :])
        return "\n".join(heading for heading in heading_lines if heading)

    def extract_headings(self) -> str:
        """Final heading state after this chunk (reference: _database.py:279-283)."""
        heading_lines = self.extract_heading_lines(self.headings + "\n\n" + self.body)
        return "\n".join(heading for heading in heading_lines if heading)

    @property
    def embedding_matrix(self) -> FloatMatrix:
        """Multi-vector embedding rows (reference: _database.py:285-289).

        Filled in by ``store.attach_embeddings`` / ``retrieve_chunks``.
        """
        if self._embedding_matrix is None:
            msg = f"chunk {self.id} has no attached embeddings"
            raise ValueError(msg)
        return np.asarray(self._embedding_matrix)

    @property
    def front_matter(self) -> str:
        """Filename/url/uri front matter (reference: _database.py:301-313)."""
        metadata = "\n".join(
            f"{key}: {_scalar(self.metadata_.get(key))}"
            for key in ("filename", "url", "uri")
            if _scalar(self.metadata_.get(key)) is not None
        )
        return f"---\n{metadata}\n---" if metadata else ""

    @property
    def content(self) -> str:
        """Front matter + contextual headings + body (reference: _database.py:315-318)."""
        return f"{self.front_matter}\n\n{self.headings.strip()}\n\n{self.body.strip()}".strip()

    def __hash__(self) -> int:
        return hash(self.id)

    def __str__(self) -> str:
        return self.content

    def __repr__(self) -> str:
        return json.dumps(
            {
                "id": self.id,
                "document_id": self.document_id,
                "index": self.index,
                "headings": self.headings,
                "body": self.body[:100],
                "metadata": self.metadata_,
            },
            indent=4,
        )


def _scalar(value: Any) -> Any:
    """Unwrap single-element metadata lists for display."""
    if isinstance(value, list) and len(value) == 1:
        return value[0]
    return value


@dataclass
class ChunkSpan:
    """A consecutive sequence of chunks from one document
    (reference: _database.py:339-395)."""

    chunks: list[Chunk]
    document: Document = field(init=False)

    def __post_init__(self) -> None:
        if self.chunks:
            assert self.chunks[0].document is not None
            self.document = self.chunks[0].document

    def to_xml(self, index: int | None = None) -> str:
        """Anthropic long-context XML format (reference: _database.py:349-368)."""
        if not self.chunks:
            return ""
        index_attribute = f' index="{index}"' if index is not None else ""
        return "\n".join(
            [
                f'<document{index_attribute} id="{self.document.id}">',
                f"<source>{self.document.url if self.document.url else self.document.filename}</source>",
                f'<span from_chunk_id="{self.chunks[0].id}" to_chunk_id="{self.chunks[-1].id}">',
                f"<headings>\n{escape(self.chunks[0].headings.strip())}\n</headings>",
                f"<content>\n{escape(''.join(chunk.body for chunk in self.chunks).strip())}\n</content>",
                "</span>",
                "</document>",
            ]
        )

    def to_json(self, index: int | None = None) -> str:
        """JSON representation (reference: _database.py:370-389)."""
        if not self.chunks:
            return "{}"
        index_attribute = {"index": index} if index is not None else {}
        return json.dumps(
            {
                **index_attribute,
                "id": self.document.id,
                "source": self.document.url if self.document.url else self.document.filename,
                "span": {
                    "from_chunk_id": self.chunks[0].id,
                    "to_chunk_id": self.chunks[-1].id,
                    "headings": self.chunks[0].headings.strip(),
                    "content": "".join(chunk.body for chunk in self.chunks).strip(),
                },
            }
        )

    @property
    def content(self) -> str:
        """Front matter + heading + concatenated bodies (reference: _database.py:391-395)."""
        if not self.chunks:
            return ""
        front_matter = self.chunks[0].front_matter
        heading = self.chunks[0].headings.strip()
        bodies = "".join(chunk.body for chunk in self.chunks)
        # Strip only the ASSEMBLED string (reference: _database.py:391-395):
        # stripping `bodies` itself would drop the first chunk's own leading
        # newlines whenever front matter or heading is present.
        return f"{front_matter}\n\n{heading}\n\n{bodies}".strip()


@dataclass
class Eval:
    """A question/ground-truth evaluation example
    (reference: _database.py:476-515)."""

    id: EvalId
    document_id: DocumentId
    chunk_ids: list[ChunkId]
    question: str
    contexts: list[str]
    ground_truth: str
    metadata_: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_chunks(
        question: str, contexts: list[Chunk], ground_truth: str, **kwargs: Any
    ) -> "Eval":
        """Deterministic id from document + chunks + question
        (reference: _database.py:497-515)."""
        document_id = contexts[0].document_id
        chunk_ids = [context.id for context in contexts]
        return Eval(
            id=hash_bytes(f"{document_id}-{chunk_ids}-{question}".encode()),
            document_id=document_id,
            chunk_ids=chunk_ids,
            question=question,
            contexts=[str(context) for context in contexts],
            ground_truth=ground_truth,
            metadata_=adapt_metadata(kwargs),
        )
