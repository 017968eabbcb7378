"""OpenAI-compatible remote embedder (models/encoder.py:OpenAICompatEncoder)
against a stdlib stub /embeddings server — the reference's API-embedder
path (_embed.py:144-184, batches of 96, normalize + fp16)."""

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embed_server():
    received: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:
            pass

        def do_POST(self) -> None:  # noqa: N802
            length = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(length))
            received.append({"path": self.path, "n": len(payload["input"])})
            data = []
            for i, text in enumerate(payload["input"]):
                # Deterministic per-text pseudo-embedding.
                seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:4], "big")
                vec = np.random.default_rng(seed).normal(size=32)
                data.append({"index": i, "embedding": vec.tolist()})
            body = json.dumps({"data": data}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield server.server_address[1], received
    server.shutdown()


def test_remote_embedder_batches_and_normalizes(embed_server):
    port, received = embed_server
    from raglite_tpu.models.encoder import OpenAICompatEncoder

    enc = OpenAICompatEncoder(f"http://127.0.0.1:{port}/v1#embed-model")
    assert enc.dim == 32  # probe request
    texts = [f"text number {i}" for i in range(100)]
    out = enc.embed(texts)
    assert out.shape == (100, 32) and out.dtype == np.float16
    np.testing.assert_allclose(np.linalg.norm(out.astype(np.float32), axis=1), 1.0, rtol=1e-2)
    # 100 inputs -> one batch of 96 + one of 4 (reference batch size).
    sizes = [r["n"] for r in received if r["path"] == "/v1/embeddings"][-2:]
    assert sizes == [96, 4]
    # Deterministic: same text, same embedding.
    again = enc.embed(["text number 7"])
    np.testing.assert_array_equal(again[0], out[7])


def test_remote_embedder_through_insert_search(embed_server, tmp_path):
    """Full pipeline over the remote embedder: standard (non-late-chunking)
    embedding mode, multivector blend, search."""
    port, _ = embed_server
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.documents import Document
    from raglite_tpu.embed import embedding_type
    from raglite_tpu.insert import insert_documents
    from raglite_tpu.search import vector_search

    config = RAGLiteConfig(
        store_path=str(tmp_path / "s"), llm="echo",
        embedder=f"openai:http://127.0.0.1:{port}/v1#embed-model",
    )
    assert embedding_type(config=config) == "standard"
    doc = Document.from_text(
        "# Remote\n\n" + "The comet passed close to the outer planets. " * 60,
        filename="comet.md",
    )
    insert_documents([doc], config=config)
    ids, scores = vector_search("comet outer planets", num_results=2, config=config)
    assert ids and scores
