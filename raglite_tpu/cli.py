"""Command-line interface.

Counterpart of /root/reference/src/raglite/_cli.py:13-206 (a Typer app)
built on click.  Global options configure the store/llm/embedder and read
``RAGLITE_TPU_*`` environment variables (the reference uses pydantic-settings
with a ``RAGLITE_`` prefix, _cli.py:13-23).  The ``chat`` command is the
terminal equivalent of the reference's Chainlit frontend.
"""

from __future__ import annotations

import json
import os

import click

from raglite_tpu.config import RAGLiteConfig


def _dotenv() -> dict[str, str]:
    """RAGLITE_TPU_* settings from a ``.env`` file in the working directory
    (the reference reads .env via pydantic-settings, _cli.py:13-23)."""
    from pathlib import Path

    env_path = Path(".env")
    if not env_path.is_file():
        return {}
    values: dict[str, str] = {}
    for line in env_path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key, value = key.strip(), value.strip().strip("'\"")
        if key.startswith("RAGLITE_TPU_"):
            values[key] = value
    return values


def _config_from_options(store_path: str | None, llm: str | None, embedder: str | None) -> RAGLiteConfig:
    kwargs = {}
    dotenv = _dotenv()

    def setting(name: str) -> str | None:
        return os.environ.get(name) or dotenv.get(name)

    store_path = store_path or setting("RAGLITE_TPU_STORE_PATH")
    llm = llm or setting("RAGLITE_TPU_LLM")
    embedder = embedder or setting("RAGLITE_TPU_EMBEDDER")
    if store_path:
        kwargs["store_path"] = store_path
    if llm:
        kwargs["llm"] = llm
    if embedder:
        kwargs["embedder"] = embedder
    return RAGLiteConfig(**kwargs)


@click.group(name="raglite-tpu")
@click.option("--store-path", default=None, help="Store directory (env: RAGLITE_TPU_STORE_PATH).")
@click.option("--llm", default=None, help="LLM spec, e.g. 'echo' or 'jax:tiny' (env: RAGLITE_TPU_LLM).")
@click.option("--embedder", default=None, help="Embedder spec: 'flax:sem' (default, in-package semantic encoder), 'hash:<dim>' (hermetic lexical), 'flax:<path>'/'openai:<model>' (env: RAGLITE_TPU_EMBEDDER).")
@click.pass_context
def cli(ctx: click.Context, store_path: str | None, llm: str | None, embedder: str | None) -> None:
    """RAGLite-TPU: TPU-native retrieval-augmented generation."""
    ctx.obj = _config_from_options(store_path, llm, embedder)


@cli.command()
@click.argument("paths", nargs=-1, type=click.Path(exists=True))
@click.pass_obj
def insert(config: RAGLiteConfig, paths: tuple[str, ...]) -> None:
    """Insert documents into the knowledge base."""
    from raglite_tpu.documents import Document
    from raglite_tpu.insert import insert_documents

    documents = [Document.from_path(p) for p in paths]
    insert_documents(documents, config=config)
    click.echo(f"Inserted {len(documents)} document(s) into {config.store_path}.")


@cli.command()
@click.argument("query")
@click.option("--num-results", default=5, show_default=True)
@click.option("--method", type=click.Choice(["vector", "keyword", "hybrid"]), default="hybrid", show_default=True)
@click.pass_obj
def search(config: RAGLiteConfig, query: str, num_results: int, method: str) -> None:
    """Search the knowledge base and print ranked chunks."""
    from raglite_tpu.search import hybrid_search, keyword_search, retrieve_chunks, vector_search

    fn = {"vector": vector_search, "keyword": keyword_search, "hybrid": hybrid_search}[method]
    chunk_ids, scores = fn(query, num_results=num_results, config=config)
    # Look chunks up by id: retrieve_chunks drops ids deleted concurrently,
    # and a positional zip would misalign every following (chunk, score) pair.
    by_id = {c.id: c for c in retrieve_chunks(chunk_ids, config=config)}
    for chunk_id, score in zip(chunk_ids, scores):
        chunk = by_id.get(chunk_id)
        if chunk is None:
            click.echo(f"{score:8.4f}  {chunk_id}  <deleted>")
            continue
        first_line = chunk.body.strip().splitlines()[0] if chunk.body.strip() else ""
        click.echo(f"{score:8.4f}  {chunk.id}  {first_line[:100]}")


@cli.command()
@click.pass_obj
def chat(config: RAGLiteConfig) -> None:
    """Interactive RAG chat in the terminal (the reference's Chainlit
    frontend equivalent, _chainlit.py there)."""
    from raglite_tpu.rag import rag

    click.echo(f"RAGLite-TPU chat — store: {config.store_path}, llm: {config.llm}. Ctrl-D to exit.")
    messages: list[dict[str, str]] = []
    while True:
        try:
            user = click.prompt("you", prompt_suffix="> ")
        except (EOFError, click.Abort):
            click.echo("\nbye")
            return
        if not user.strip():
            continue
        messages.append({"role": "user", "content": user})
        click.echo("assistant> ", nl=False)
        for token in rag(messages, config=config):
            click.echo(token, nl=False)
        click.echo()


@cli.command()
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8080, show_default=True)
@click.pass_obj
def serve(config: RAGLiteConfig, host: str, port: int) -> None:
    """Web chat frontend with streaming answers, uploads, and sources
    (the reference's Chainlit app, _chainlit.py, as a zero-dependency
    stdlib web app — webchat.py)."""
    from raglite_tpu.webchat import create_web_app

    create_web_app(config).serve(host, port)


@cli.group()
def mcp() -> None:
    """Model Context Protocol server."""


@mcp.command("run")
@click.pass_obj
def mcp_run(config: RAGLiteConfig) -> None:
    """Run the MCP server over stdio (reference: _cli.py:106-118)."""
    from raglite_tpu.mcp import create_mcp_server

    create_mcp_server(config=config).run()


@mcp.command("install")
@click.option("--server-name", default="RAGLite-TPU", show_default=True)
@click.pass_obj
def mcp_install(config: RAGLiteConfig, server_name: str) -> None:
    """Write a Claude Desktop config entry for this server
    (reference: _cli.py:58-103)."""
    import sys
    from pathlib import Path

    if sys.platform == "darwin":
        config_path = Path.home() / "Library" / "Application Support" / "Claude"
    elif sys.platform == "win32":
        config_path = Path(os.environ.get("APPDATA", str(Path.home()))) / "Claude"
    else:
        config_path = Path.home() / ".config" / "Claude"
    config_path.mkdir(parents=True, exist_ok=True)
    config_file = config_path / "claude_desktop_config.json"
    desktop = json.loads(config_file.read_text()) if config_file.exists() else {}
    desktop.setdefault("mcpServers", {})[server_name] = {
        "command": sys.executable,
        "args": ["-m", "raglite_tpu", "--store-path", config.store_path,
                 "--llm", config.llm, "--embedder", config.embedder, "mcp", "run"],
    }
    config_file.write_text(json.dumps(desktop, indent=2))
    click.echo(f"Installed MCP server {server_name!r} in {config_file}.")


@cli.command()
@click.option("--dataset", default="synthetic", show_default=True,
              help="IR dataset: 'synthetic', a TREC-format directory, or an ir_datasets id.")
@click.option("--measure", default="AP@10", show_default=True)
@click.option("--num-queries", default=50, show_default=True)
@click.option("--hnsw-recall", is_flag=True,
              help="instead of the IR table, print the measured recall@10 of "
              "the production scan vs a real HNSW graph at ef_search=160 "
              "over the same vectors, with each index's memory.")
@click.option("--num-rows", default=100_000, show_default=True,
              help="corpus size for --hnsw-recall")
@click.option("--remote-vector-store", default="",
              help="base URL of an OpenAI-compatible vector-store API to "
              "include as a cross-system comparison row (the reference's "
              "hosted-OpenAI baseline; needs network egress).")
@click.pass_obj
def bench(  # noqa: PLR0913
    config: RAGLiteConfig, dataset: str, measure: str, num_queries: int,
    hnsw_recall: bool, num_rows: int, remote_vector_store: str,
) -> None:
    """IR benchmark comparing retrieval variants (reference: _cli.py:121-206),
    including a first-party HNSW graph baseline ('hnsw' variant)."""
    import json as _json

    if hnsw_recall:
        from raglite_tpu.irbench import hnsw_recall_comparison
        from raglite_tpu.native import native_available

        if not native_available():
            raise click.ClickException(
                "--hnsw-recall needs the first-party C++ HNSW baseline; "
                "no C++ toolchain is available to build it"
            )
        report = hnsw_recall_comparison(num_rows=num_rows)
        click.echo(_json.dumps(report))
        return
    from raglite_tpu.irbench import run_ir_benchmark

    df = run_ir_benchmark(
        dataset=dataset, measure=measure, num_queries=num_queries, config=config,
        remote_vector_store=remote_vector_store or None,
    )
    click.echo(df.to_string())


@cli.command()
@click.argument("document_ids", nargs=-1)
@click.pass_obj
def delete(config: RAGLiteConfig, document_ids: tuple[str, ...]) -> None:
    """Delete documents by id (reference public API: delete_documents)."""
    from raglite_tpu.delete import delete_documents

    delete_documents(list(document_ids), config=config)
    click.echo(f"Deleted {len(document_ids)} document(s).")


@cli.command("update-adapter")
@click.pass_obj
def update_adapter(config: RAGLiteConfig) -> None:
    """Train the Procrustes query adapter from stored evals
    (reference: update_query_adapter, _query_adapter.py:41)."""
    from raglite_tpu.query_adapter import update_query_adapter

    adapter = update_query_adapter(config=config)
    click.echo(f"Query adapter updated: shape {adapter.shape}.")


@cli.group()
def evals() -> None:
    """Generate, answer, and score evals (reference: _eval.py)."""


@evals.command("insert")
@click.option("--num-evals", default=10, show_default=True)
@click.pass_obj
def evals_insert(config: RAGLiteConfig, num_evals: int) -> None:
    from raglite_tpu.evals import insert_evals

    insert_evals(num_evals=num_evals, config=config)
    click.echo(f"Inserted up to {num_evals} eval(s).")


@evals.command("run")
@click.option("--num-evals", default=10, show_default=True)
@click.pass_obj
def evals_run(config: RAGLiteConfig, num_evals: int) -> None:
    """Answer stored evals and print first-party quality metrics."""
    from raglite_tpu.evals import evaluate

    df = evaluate(num_evals, config=config)
    click.echo(df.to_string())


@cli.command()
@click.pass_obj
def stats(config: RAGLiteConfig) -> None:
    """Show store/index statistics."""
    from raglite_tpu.store import store_from_config

    store = store_from_config(config)
    num_vectors = store.num_embedding_vectors
    click.echo(
        json.dumps(
            {
                "store_path": config.store_path,
                "documents": len(store.documents),
                "chunks": len(store.chunk_order),
                "sub_vectors": num_vectors,
                "evals": len(store.evals),
                "metadata_fields": sorted(store.metadata),
                "has_query_adapter": "query_adapter" in store.index_metadata,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    cli()
