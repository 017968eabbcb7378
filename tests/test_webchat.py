"""Web chat frontend tests (webchat.py — the Chainlit-app analogue,
reference: _chainlit.py).  Drives the real HTTP server over a socket."""

import json
import urllib.request

import pytest

from raglite_tpu.config import RAGLiteConfig
from raglite_tpu.webchat import create_web_app


@pytest.fixture(scope="module")
def app_port():
    config = RAGLiteConfig(store_path=":memory:", embedder="hash:256", llm="echo")
    app = create_web_app(config)
    server, port = app.serve_background()
    yield app, port
    server.shutdown()


def _get(port: int, path: str) -> tuple[int, bytes]:
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as response:
        return response.status, response.read()


def _post(port: int, path: str, data: bytes, headers: dict | None = None) -> tuple[int, bytes]:
    merged = {"Content-Type": "application/json", **(headers or {})}
    request = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, headers=merged, method="POST"
    )
    with urllib.request.urlopen(request) as response:
        return response.status, response.read()


def test_index_page(app_port) -> None:
    _, port = app_port
    status, body = _get(port, "/")
    assert status == 200
    assert b"RAGLite-TPU chat" in body


def test_settings_roundtrip(app_port) -> None:
    app, port = app_port
    status, body = _get(port, "/api/settings")
    assert status == 200
    settings = json.loads(body)
    assert settings["llm"] == "echo"
    status, body = _post(
        port, "/api/settings", json.dumps({"vector_search_query_adapter": False}).encode()
    )
    assert json.loads(body)["vector_search_query_adapter"] is False
    assert app.config.vector_search_query_adapter is False


def test_upload_small_inlines_large_inserts(app_port) -> None:
    app, port = app_port
    status, body = _post(port, "/api/upload", b"tiny note", {"X-Filename": "note.txt"})
    assert json.loads(body)["status"] == "inlined"
    big = ("Relativity paragraph. " * 600).encode()
    status, body = _post(port, "/api/upload", big, {"X-Filename": "big.md"})
    payload = json.loads(body)
    assert payload["status"] == "inserted"
    assert payload["id"]


def test_chat_streams_tokens_and_sources(app_port) -> None:
    app, port = app_port
    # Ensure there is something to retrieve.
    corpus = "# Simultaneity\n\n" + "Einstein defines simultaneity via light signals. " * 200
    _post(port, "/api/upload", corpus.encode(), {"X-Filename": "specrel.md"})
    status, body = _post(
        port,
        "/api/chat",
        json.dumps({"messages": [{"role": "user", "content": "How is simultaneity defined?"}]}).encode(),
        {"Content-Type": "application/json"},
    )
    assert status == 200
    text = body.decode()
    events = [e for e in text.split("\n\n") if e.strip()]
    kinds = [line[7:] for e in events for line in e.split("\n") if line.startswith("event: ")]
    assert "token" in kinds
    assert kinds[-1] == "done"
    assert "sources" in kinds  # the echo LLM issues a search tool call


def test_search_and_stats_endpoints(app_port) -> None:
    app, port = app_port
    corpus = "# Waves\n\n" + "Interference patterns emerge from coherent waves. " * 200
    _post(port, "/api/upload", corpus.encode(), {"X-Filename": "waves.md"})
    for method in ("hybrid", "vector", "keyword"):
        status, body = _post(
            port,
            "/api/search",
            json.dumps({"query": "coherent interference", "method": method, "num_results": 3}).encode(),
            {"Content-Type": "application/json"},
        )
        assert status == 200
        payload = json.loads(body)
        assert payload["method"] == method
        assert payload["results"], method
        assert "body" in payload["results"][0]
    # Reranked variant
    status, body = _post(
        port, "/api/search",
        json.dumps({"query": "coherent interference", "rerank": True, "num_results": 3}).encode(),
        {"Content-Type": "application/json"},
    )
    assert json.loads(body)["results"]
    status, body = _get(port, "/api/stats")
    stats = json.loads(body)
    assert stats["chunks"] >= 1 and stats["index_rows"] >= 1


def test_delete_endpoint(app_port) -> None:
    app, port = app_port
    doc = "# Minerals\n\n" + "Quartz crystals form hexagonal prisms. " * 300
    _, body = _post(port, "/api/upload", doc.encode(), {"X-Filename": "minerals.md"})
    doc_id = json.loads(body)["id"]
    status, body = _post(
        port, "/api/delete",
        json.dumps({"document_ids": [doc_id]}).encode(),
        {"Content-Type": "application/json"},
    )
    assert status == 200
    assert json.loads(body)["deleted_ids"] == [doc_id]
    _, body = _post(
        port, "/api/search",
        json.dumps({"query": "quartz hexagonal prisms", "method": "keyword"}).encode(),
        {"Content-Type": "application/json"},
    )
    results = json.loads(body)["results"]
    assert all(r["document_id"] != doc_id for r in results)


def test_cross_origin_post_rejected(app_port) -> None:
    """A drive-by page's POST (foreign Origin header) must be refused."""
    app, port = app_port
    request = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/settings",
        data=json.dumps({"llm": "evil"}).encode(),
        headers={"Content-Type": "application/json", "Origin": "http://evil.example"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(request)
    assert err.value.code == 403
    assert app.config.llm == "echo"
    # Same-origin posts (Origin names this host) still work.
    status, _ = _post(
        port, "/api/settings", b"{}", {"Origin": f"http://127.0.0.1:{port}"}
    )
    assert status == 200


def test_wildcard_bind_accepts_lan_origin_rejects_rebinding() -> None:
    """`serve --host 0.0.0.0` is reached via the machine's LAN IP/hostname;
    an Origin naming a real local interface must be accepted, while an
    Origin that merely AGREES with the Host header (the post-DNS-rebind
    signature: both spell the attacker's domain) must still be refused."""
    from raglite_tpu.webchat import _local_addresses

    config = RAGLiteConfig(store_path=":memory:", embedder="hash:256", llm="echo")
    app = create_web_app(config)
    server, port = app.serve_background(host="0.0.0.0")  # noqa: S104
    try:
        # Pick a non-loopback local address when one exists (the exact case
        # the loopback allow-list missed); loopback otherwise.
        lan = next(
            (a for a in _local_addresses() if a not in ("localhost", "127.0.0.1", "::1")),
            "127.0.0.1",
        )
        status, _ = _post(
            port, "/api/settings", b"{}", {"Origin": f"http://{lan}:{port}"}
        )
        assert status == 200
        # Rebinding simulation: Origin == Host == attacker domain.
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/settings",
            data=b"{}",
            headers={
                "Content-Type": "application/json",
                "Origin": f"http://evil.example:{port}",
                "Host": f"evil.example:{port}",
            },
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(request)
        assert err.value.code == 403
        # Right host, wrong port: still cross-origin.
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/settings",
            data=b"{}",
            headers={"Content-Type": "application/json",
                     "Origin": f"http://{lan}:{port + 1}"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(request)
        assert err.value.code == 403
    finally:
        server.shutdown()


def test_store_path_not_settable_over_http(app_port) -> None:
    """Repointing the store over HTTP is an arbitrary-filesystem primitive;
    the settings endpoint must ignore it."""
    app, port = app_port
    before = app.config.store_path
    _post(port, "/api/settings", json.dumps({"store_path": "/etc"}).encode())
    assert app.config.store_path == before


def test_non_json_content_type_rejected(app_port) -> None:
    _, port = app_port
    request = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/settings",
        data=b"llm=evil",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(request)
    assert err.value.code == 415


def test_settings_rejects_mismatched_embedder_dim(tmp_path) -> None:
    """Repointing the embedder to a different dimensionality over HTTP must
    be rejected while the store holds chunks (every later search would 500)."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents
    from raglite_tpu.webchat import WebChatApp

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    insert_documents([Document.from_text("Some content for the store. " * 8)], config=config)
    app = WebChatApp(config)
    out = app.handle_settings_post({"embedder": "hash:512"})
    assert "error" in out
    assert app.config.embedder == "hash:256"  # unchanged
    # Same-dimensionality change is fine.
    out = app.handle_settings_post({"llm": "echo"})
    assert "error" not in out


def test_inline_attachments_are_session_scoped(tmp_path) -> None:
    """One client's inlined attachment must never leak into another
    session's chat turn."""
    from raglite_tpu import RAGLiteConfig
    from raglite_tpu.webchat import WebChatApp

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    app = WebChatApp(config)
    app.handle_upload("a.txt", b"alpha secret attachment", "session-A")
    # Session B's chat sees no attachment...
    events_b = list(app.chat_events([{"role": "user", "content": "hi"}], "session-B"))
    tokens_b = "".join(d for e, d in events_b if e == "token")
    assert "alpha secret" not in tokens_b
    # ...and session A still has it queued for its own next turn.
    assert app._inline_docs.get("session-A")
