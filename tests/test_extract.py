"""Structured extraction tests (reference: tests/test_extract.py)."""

from typing import Annotated, ClassVar

import pytest
from pydantic import BaseModel, Field

from raglite_tpu import RAGLiteConfig, Document, expand_document_metadata, extract_with_llm


class NameResponse(BaseModel):
    """A named response."""

    name: str = Field(..., description="The user's name.")
    system_prompt: ClassVar[str] = "Extract the user's name."


def test_extract_simple(raglite_test_config: RAGLiteConfig) -> None:
    result = extract_with_llm(NameResponse, "My name is Thomas A. Anderson.", config=raglite_test_config)
    assert isinstance(result, NameResponse)
    assert isinstance(result.name, str)


def test_extract_with_list_prompt(raglite_test_config: RAGLiteConfig) -> None:
    result = extract_with_llm(NameResponse, ["chunk one", "chunk two"], config=raglite_test_config)
    assert isinstance(result, NameResponse)


def test_expand_document_metadata(raglite_test_config: RAGLiteConfig) -> None:
    docs = [Document.from_text("A paper about relativity by A. Einstein.", filename="x.md")]
    fields = {
        "title": Annotated[str, Field(..., description="Document title.")],
        "reviewed": Annotated[bool, Field(..., description="Peer reviewed?")],
    }
    out = list(expand_document_metadata(docs, fields, config=raglite_test_config))
    assert len(out) == 1
    assert "title" in out[0].metadata_
    assert "reviewed" in out[0].metadata_


def test_self_query_filter(raglite_test_config: RAGLiteConfig) -> None:
    from raglite_tpu.extract import self_query_filter

    result = self_query_filter("papers about physics", config=raglite_test_config)
    assert isinstance(result, dict)
