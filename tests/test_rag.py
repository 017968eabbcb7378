"""RAG orchestration tests (reference: tests/test_rag.py)."""

import asyncio

from raglite_tpu import RAGLiteConfig, add_context, rag, async_rag, retrieve_context


def test_rag_with_manual_context(raglite_test_config: RAGLiteConfig) -> None:
    """Providing context explicitly: message roles are [user, assistant]
    (reference: tests/test_rag.py:14-29)."""
    question = "How does Einstein define simultaneity?"
    spans = retrieve_context(question, num_chunks=3, config=raglite_test_config)
    assert spans
    messages = [add_context(question, spans, raglite_test_config)]
    answer = "".join(rag(messages, config=raglite_test_config))
    assert answer
    assert [m["role"] for m in messages] == ["user", "assistant"]
    assert messages[-1]["content"] == answer


def test_rag_with_tool_round(raglite_test_config: RAGLiteConfig) -> None:
    """Adaptive RAG: roles are [user, assistant(tool_calls), tool, assistant]
    (reference: tests/test_rag.py:32-47)."""
    retrieved = []
    messages = [{"role": "user", "content": "How does Einstein define simultaneity?"}]
    answer = "".join(
        rag(messages, on_retrieval=lambda spans: retrieved.extend(spans), config=raglite_test_config)
    )
    assert answer
    roles = [m["role"] for m in messages]
    assert roles == ["user", "assistant", "tool", "assistant"]
    assert messages[1].get("tool_calls")
    assert retrieved, "on_retrieval callback fired"
    assert "documents" in messages[2]["content"]


def test_async_rag(raglite_test_config: RAGLiteConfig) -> None:
    messages = [{"role": "user", "content": "How does Einstein define simultaneity?"}]

    async def run() -> str:
        parts = []
        async for token in async_rag(messages, config=raglite_test_config):
            parts.append(token)
        return "".join(parts)

    answer = asyncio.run(run())
    assert answer
    assert [m["role"] for m in messages] == ["user", "assistant", "tool", "assistant"]


def test_retrieve_context_shapes(raglite_test_config: RAGLiteConfig) -> None:
    spans = retrieve_context("simultaneity", num_chunks=4, config=raglite_test_config)
    assert spans
    assert all(span.chunks for span in spans)


def test_add_context_renders_xml(raglite_test_config: RAGLiteConfig) -> None:
    spans = retrieve_context("simultaneity", num_chunks=2, config=raglite_test_config)
    message = add_context("What is simultaneity?", spans, raglite_test_config)
    assert message["role"] == "user"
    assert "<context>" in message["content"]
    assert '<document index="1"' in message["content"]


def test_async_rag_early_exit_stops_worker(tmp_path) -> None:
    """Abandoning the async iterator must stop the background worker (no
    further tokens consumed, no mutation after the caller walks away)."""
    import asyncio

    from raglite_tpu import Document, RAGLiteConfig, insert_documents
    from raglite_tpu.rag import async_rag

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    insert_documents(
        [Document.from_text("# Physics\n\nPhotons carry momentum and energy. " * 10)],
        config=config,
    )

    async def run() -> int:
        messages = [{"role": "user", "content": "Tell me about photons"}]
        count = 0
        agen = async_rag(messages, config=config)
        async for _token in agen:
            count += 1
            if count >= 2:
                break
        await agen.aclose()
        # Give an abandoned worker a moment; it must not keep streaming.
        await asyncio.sleep(0.2)
        return count

    count = asyncio.run(run())
    assert count == 2
