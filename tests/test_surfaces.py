"""CLI / MCP / IR-bench surface tests (reference: _cli.py, _mcp.py, _bench.py)."""

import io
import json

import pytest
from click.testing import CliRunner

from raglite_tpu import RAGLiteConfig
from raglite_tpu.cli import cli


def test_cli_help() -> None:
    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    for cmd in ("insert", "search", "chat", "mcp", "bench", "stats"):
        assert cmd in result.output


def test_cli_insert_search_stats(tmp_path) -> None:
    doc = tmp_path / "doc.md"
    doc.write_text("# Guide\n\nPelicans carry fish in their pouches. They dive from heights. ")
    runner = CliRunner()
    base = ["--store-path", str(tmp_path / "store"), "--embedder", "hash:128", "--llm", "echo"]
    result = runner.invoke(cli, [*base, "insert", str(doc)])
    assert result.exit_code == 0, result.output
    assert "Inserted 1" in result.output
    result = runner.invoke(cli, [*base, "search", "how do pelicans carry fish?"])
    assert result.exit_code == 0, result.output
    assert "Pelicans" in result.output or result.output.strip()
    result = runner.invoke(cli, [*base, "stats"])
    assert result.exit_code == 0
    stats = json.loads(result.output)
    assert stats["documents"] == 1
    assert stats["chunks"] >= 1


def test_mcp_server_protocol(raglite_test_config: RAGLiteConfig) -> None:
    """Drive the MCP server through the stdio JSON-RPC protocol."""
    from raglite_tpu.mcp import create_mcp_server

    server = create_mcp_server(config=raglite_test_config)
    requests = [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {
            "jsonrpc": "2.0",
            "id": 3,
            "method": "tools/call",
            "params": {
                "name": "search_knowledge_base",
                "arguments": {"query": "How does Einstein define simultaneity?"},
            },
        },
        {"jsonrpc": "2.0", "id": 4, "method": "prompts/get",
         "params": {"name": "kb", "arguments": {"query": "what is time?"}}},
        {"jsonrpc": "2.0", "id": 5, "method": "nope/nope"},
    ]
    stdin = io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n")
    stdout = io.StringIO()
    server.run(stdin=stdin, stdout=stdout)
    responses = [json.loads(line) for line in stdout.getvalue().splitlines()]
    by_id = {r["id"]: r for r in responses}
    assert by_id[1]["result"]["serverInfo"]["name"] == "RAGLite-TPU"
    assert by_id[2]["result"]["tools"][0]["name"] == "search_knowledge_base"
    payload = json.loads(by_id[3]["result"]["content"][0]["text"])
    assert payload["documents"], "tool returned retrieved documents"
    assert "simultaneity" in json.dumps(payload).lower()
    assert by_id[4]["result"]["messages"][0]["role"] == "user"
    assert by_id[5]["error"]["code"] == -32601


def test_ir_measures() -> None:
    from raglite_tpu.irbench import compute_measure

    qrel = {"a": 1, "b": 1}
    assert compute_measure("AP@10", ["a", "x", "b"], qrel) == pytest.approx((1.0 + 2 / 3) / 2)
    assert compute_measure("recall@10", ["a", "x"], qrel) == 0.5
    assert compute_measure("MRR@10", ["x", "a"], qrel) == 0.5
    assert compute_measure("nDCG@10", ["a", "b"], qrel) == pytest.approx(1.0)
    assert compute_measure("P@2", ["a", "x"], qrel) == 0.5


def test_ir_benchmark_synthetic(tmp_path) -> None:
    """The IR harness end-to-end on the synthetic dataset: exact dense
    retrieval on distinctive-vocabulary docs should score near 1.0."""
    from raglite_tpu.irbench import run_ir_benchmark

    config = RAGLiteConfig(store_path=str(tmp_path / "s"), embedder="hash:128", llm="echo")
    df = run_ir_benchmark(
        dataset="synthetic",
        measure="AP@10",
        num_queries=8,
        variants=("multivector", "keyword", "hybrid"),
        config=config,
    )
    assert set(df.index) == {"multivector", "keyword", "hybrid"}
    assert (df["AP@10"] > 0.6).all(), df
    assert df.loc["hybrid", "AP@10"] >= 0.9, df


def test_cli_delete_adapter_evals(tmp_path) -> None:
    """delete / update-adapter / evals subcommands end-to-end on a tiny KB."""
    from raglite_tpu.cli import cli

    runner = CliRunner()
    store = str(tmp_path / "kb")
    base = ["--store-path", store, "--embedder", "hash:256", "--llm", "echo"]
    doc = tmp_path / "doc.md"
    doc.write_text("# Physics\n\n" + "Light speed is constant in vacuum. " * 120)
    other = tmp_path / "other.md"
    other.write_text("# Cooking\n\n" + "Bread rises when yeast ferments sugar. " * 120)
    assert runner.invoke(cli, [*base, "insert", str(doc), str(other)]).exit_code == 0

    result = runner.invoke(cli, [*base, "evals", "insert", "--num-evals", "2"])
    assert result.exit_code == 0, result.output

    # The echo LLM judges every candidate relevant, so a tiny KB yields no
    # negative retrievals; synthesize per-document evals for adapter training
    # (same approach as tests/test_query_adapter.py).
    from raglite_tpu.config import RAGLiteConfig as _Config
    from raglite_tpu.documents import Document, Eval
    from raglite_tpu.store import store_from_config

    config = _Config(store_path=store, embedder="hash:256", llm="echo")
    kb = store_from_config(config)
    for source in (doc, other):
        doc_id = Document.from_path(source).id
        chunk_ids = [c for c in kb.chunk_order if kb.chunks[c].document_id == doc_id]
        kb.add_evals(
            [
                Eval.from_chunks(
                    question=f"About {source.stem}?",
                    contexts=[kb.get_chunk(c) for c in chunk_ids],
                    ground_truth=source.stem,
                )
            ]
        )

    result = runner.invoke(cli, [*base, "update-adapter"])
    assert result.exit_code == 0, result.output
    assert "shape" in result.output

    result = runner.invoke(cli, [*base, "evals", "run", "--num-evals", "2"])
    assert result.exit_code == 0, result.output

    from raglite_tpu.documents import Document

    doc_id = Document.from_path(doc).id
    result = runner.invoke(cli, [*base, "delete", doc_id])
    assert result.exit_code == 0, result.output
    result = runner.invoke(cli, [*base, "search", "light", "--method", "keyword"])
    assert result.exit_code == 0


def test_cli_dotenv_settings(tmp_path, monkeypatch) -> None:
    """RAGLITE_TPU_* settings load from .env (reference: _cli.py:13-23)."""
    from raglite_tpu.cli import cli

    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text(
        'RAGLITE_TPU_LLM="jax:tiny"\nRAGLITE_TPU_EMBEDDER=hash:128\n# comment\n'
    )
    captured = {}

    runner = CliRunner()

    @cli.command("showcfg")
    @__import__("click").pass_obj
    def showcfg(config):  # pragma: no cover - body runs via runner
        captured["llm"] = config.llm
        captured["embedder"] = config.embedder

    try:
        result = runner.invoke(cli, ["showcfg"])
        assert result.exit_code == 0, result.output
        assert captured == {"llm": "jax:tiny", "embedder": "hash:128"}
    finally:
        cli.commands.pop("showcfg", None)


def test_mcp_install_writes_desktop_config(tmp_path, monkeypatch) -> None:
    """`mcp install` writes the Claude desktop config entry
    (reference: _cli.py:58-103)."""
    import json as _json

    from raglite_tpu.cli import cli

    monkeypatch.setenv("HOME", str(tmp_path))
    runner = CliRunner()
    result = runner.invoke(
        cli, ["--store-path", str(tmp_path / "kb"), "mcp", "install", "--server-name", "testkb"]
    )
    assert result.exit_code == 0, result.output
    config_file = tmp_path / ".config" / "Claude" / "claude_desktop_config.json"
    assert config_file.exists()
    desktop = _json.loads(config_file.read_text())
    assert "testkb" in desktop["mcpServers"]
    args = desktop["mcpServers"]["testkb"]["args"]
    assert "mcp" in args and "run" in args


def test_ir_benchmark_rerank_variant(tmp_path) -> None:
    """The 'rerank' variant (multivector + token-MaxSim late interaction, the
    FlashRank role in the reference) runs through the harness and shares the
    multivector store (one insert, two variants)."""
    from raglite_tpu.irbench import run_ir_benchmark

    config = RAGLiteConfig(store_path=str(tmp_path / "s"), embedder="hash:128", llm="echo")
    df = run_ir_benchmark(
        dataset="synthetic",
        measure="AP@10",
        num_queries=6,
        variants=("multivector", "rerank"),
        config=config,
    )
    assert set(df.index) == {"multivector", "rerank"}
    assert (df["AP@10"] > 0.5).all(), df
    # Shared store: the pair inserts into ONE bench store (rerank reuses the
    # multivector store's embeddings; only the ranking stage differs).
    stores = {p.name for p in (tmp_path / "s").parent.rglob("bench_*") if p.is_dir()}
    assert len(stores) == 1, stores
