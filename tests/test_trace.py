"""Tracing subsystem tests (utils/trace.py; SURVEY.md §5.1 gap-fill)."""

import io

from raglite_tpu.utils import trace


def test_phase_timing_aggregates() -> None:
    trace.reset()
    with trace.phase("unit.alpha"):
        pass
    with trace.phase("unit.alpha"):
        pass
    with trace.phase("unit.beta"):
        with trace.phase("unit.nested"):
            pass
    summary = trace.report()
    assert summary["unit.alpha"]["count"] == 2
    assert summary["unit.beta"]["count"] == 1
    assert summary["unit.nested"]["count"] == 1
    assert summary["unit.alpha"]["total_s"] >= 0


def test_insert_and_search_emit_phases() -> None:
    from raglite_tpu import insert_documents, vector_search
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.documents import Document

    trace.reset()
    config = RAGLiteConfig(store_path=":memory:", embedder="hash:256", llm="echo")
    insert_documents(
        [Document.from_text("# T\n\n" + "Photons travel at light speed. " * 50)],
        config=config,
    )
    vector_search("photons", config=config)
    summary = trace.report()
    for name in (
        "insert.split_sentences",
        "insert.split_chunklets",
        "insert.embed",
        "insert.split_chunks",
        "search.embed_query",
        "search.dense_scan",
    ):
        assert name in summary, name


def test_progress_meter_tty_and_silent() -> None:
    class Tty(io.StringIO):
        def isatty(self) -> bool:
            return True

    stream = Tty()
    with trace.Progress(3, "work", stream=stream) as progress:
        for _ in range(3):
            progress.update()
    assert "3/3" in stream.getvalue()

    silent = io.StringIO()
    with trace.Progress(2, "quiet", stream=silent) as progress:
        progress.update(2)
    assert silent.getvalue() == ""


def test_trace_session_writes_profile(tmp_path) -> None:
    """jax.profiler trace capture produces trace artifacts."""
    import jax.numpy as jnp

    with trace.trace_session(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    produced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in produced), produced
