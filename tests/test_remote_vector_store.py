"""RemoteVectorStoreEvaluator against a local OpenAI-compatible stub
(the reference's hosted-OpenAI comparison, _bench.py:210-296 — this image
has no egress, so the wire protocol is exercised with a stub server)."""

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


@pytest.fixture(scope="module")
def vector_store_stub():
    """Implements /files, /vector_stores, attach, and /search with a
    trivial keyword-overlap ranking."""
    files: dict[str, dict] = {}
    stores: dict[str, list[str]] = {}
    counter = {"n": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:
            pass

        def _reply(self, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self) -> None:  # noqa: N802
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length)
            counter["n"] += 1
            if self.path == "/files":
                text = raw.decode(errors="replace")
                name = re.search(r'filename="([^"]+)"', text).group(1)
                content = text.split("\r\n\r\n", 2)[-1].rsplit("\r\n--", 1)[0]
                fid = f"file_{counter['n']}"
                files[fid] = {"filename": name, "content": content}
                self._reply({"id": fid, "filename": name})
                return
            if self.path == "/vector_stores":
                sid = f"vs_{counter['n']}"
                stores[sid] = []
                self._reply({"id": sid})
                return
            attach = re.fullmatch(r"/vector_stores/(vs_\d+)/files", self.path)
            if attach:
                payload = json.loads(raw)
                stores[attach.group(1)].append(payload["file_id"])
                self._reply({"id": payload["file_id"], "status": "completed"})
                return
            search = re.fullmatch(r"/vector_stores/(vs_\d+)/search", self.path)
            if search:
                payload = json.loads(raw)
                terms = set(payload["query"].lower().split())
                scored = []
                for fid in stores[search.group(1)]:
                    doc = files[fid]
                    words = set(doc["content"].lower().split())
                    score = len(terms & words) / max(len(terms), 1)
                    scored.append((score, fid, doc["filename"]))
                scored.sort(reverse=True)
                self._reply({
                    "data": [
                        {"file_id": fid, "filename": name, "score": score}
                        for score, fid, name in scored[: payload.get("max_num_results", 10)]
                        if score > 0
                    ]
                })
                return
            self._reply({"error": "unknown path"})

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_remote_vector_store_evaluator(vector_store_stub, tmp_path) -> None:
    from raglite_tpu.documents import Document
    from raglite_tpu.irbench import IRDataset, RemoteVectorStoreEvaluator

    docs = [
        Document.from_text("the quick brown fox jumps over fences", id="d_fox"),
        Document.from_text("photons carry momentum and energy", id="d_photon"),
        Document.from_text("violins have four strings in fifths", id="d_violin"),
    ]
    dataset = IRDataset(
        name="stub",
        documents=docs,
        queries={"q1": "brown fox jumps", "q2": "photons momentum"},
        qrels={"q1": {"d_fox": 1}, "q2": {"d_photon": 1}},
    )
    evaluator = RemoteVectorStoreEvaluator(
        dataset, base_url=vector_store_stub, api_key="test", cache_dir=str(tmp_path)
    )
    assert evaluator.search("brown fox jumps", 2)[0] == "d_fox"
    assert evaluator.search("photons momentum", 2)[0] == "d_photon"
    score = evaluator.score("AP@10")
    assert score == 1.0
