"""raglite-tpu: a TPU-native retrieval-augmented-generation framework.

Public API with parity to the reference package
(/root/reference/src/raglite/__init__.py:22-53); RAG/eval surfaces land in
later modules and are exported as they are implemented.
"""

from raglite_tpu.config import RAGLiteConfig
from raglite_tpu.delete import delete_documents, delete_documents_by_metadata
from raglite_tpu.documents import Chunk, ChunkSpan, Document, Eval
from raglite_tpu.evals import answer_evals, evaluate, insert_evals
from raglite_tpu.insert import insert_documents
from raglite_tpu.extract import expand_document_metadata, extract_with_llm
from raglite_tpu.query_adapter import update_query_adapter
from raglite_tpu.rag import add_context, async_rag, rag, retrieve_context
from raglite_tpu.search import (
    hybrid_search,
    hybrid_search_batch,
    keyword_search,
    keyword_search_batch,
    reciprocal_rank_fusion,
    rerank_chunks,
    retrieve_chunk_spans,
    retrieve_chunks,
    search_and_rerank_chunk_spans,
    search_and_rerank_chunks,
    vector_search,
    vector_search_batch,
)

__all__ = [
    "RAGLiteConfig",
    "Chunk",
    "ChunkSpan",
    "Document",
    "Eval",
    "insert_documents",
    "delete_documents",
    "delete_documents_by_metadata",
    "hybrid_search",
    "hybrid_search_batch",
    "keyword_search",
    "keyword_search_batch",
    "vector_search",
    "vector_search_batch",
    "reciprocal_rank_fusion",
    "retrieve_chunks",
    "retrieve_chunk_spans",
    "rerank_chunks",
    "search_and_rerank_chunks",
    "search_and_rerank_chunk_spans",
    "retrieve_context",
    "add_context",
    "rag",
    "async_rag",
    "extract_with_llm",
    "expand_document_metadata",
    "update_query_adapter",
    "insert_evals",
    "answer_evals",
    "evaluate",
]

__version__ = "0.1.0"
