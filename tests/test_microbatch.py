"""Serving micro-batcher: coalescing, ordering, errors, and the webchat
/api/search integration (concurrent requests -> one batched device program)."""

import threading
import time

import numpy as np

from raglite_tpu.utils.microbatch import KeyedMicroBatcher, MicroBatcher


def test_microbatcher_coalesces_and_orders() -> None:
    calls: list[list[int]] = []

    def batch_fn(items):
        calls.append(list(items))
        time.sleep(0.01)  # make batching windows overlap
        return [i * 10 for i in items]

    mb = MicroBatcher(batch_fn, max_batch=16, max_wait_ms=20.0)
    results: dict[int, int] = {}

    def worker(i):
        results[i] = mb.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: i * 10 for i in range(24)}
    assert sum(len(c) for c in calls) == 24
    assert max(len(c) for c in calls) > 1, "no coalescing happened"


def test_microbatcher_max_batch_wakes_leader_early() -> None:
    mb = MicroBatcher(lambda xs: xs, max_batch=4, max_wait_ms=5_000.0)
    out = []
    threads = [
        threading.Thread(target=lambda i=i: out.append(mb.submit(i))) for i in range(4)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert time.perf_counter() - t0 < 2.0, "leader slept the full max_wait"
    assert sorted(out) == [0, 1, 2, 3]


def test_microbatcher_propagates_errors() -> None:
    def boom(items):
        msg = "kaput"
        raise RuntimeError(msg)

    mb = MicroBatcher(boom, max_wait_ms=1.0)
    errors = []

    def worker():
        try:
            mb.submit(1)
        except RuntimeError as exc:
            errors.append(str(exc))

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == ["kaput"] * 3


def test_keyed_batcher_separates_incompatible_requests() -> None:
    seen: dict[str, list[list[int]]] = {"a": [], "b": []}

    def factory(key):
        def run(items):
            seen[key].append(list(items))
            return items

        return run

    kb = KeyedMicroBatcher(factory, max_wait_ms=10.0)
    threads = [
        threading.Thread(target=lambda k=k, i=i: kb.submit(k, i))
        for i in range(6)
        for k in ("a", "b")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(len(c) for c in seen["a"]) == 6
    assert sum(len(c) for c in seen["b"]) == 6


def test_webchat_concurrent_search_batches(tmp_path) -> None:
    """Concurrent /api/search requests return per-query-correct results
    while actually coalescing into batched calls."""
    from raglite_tpu import Document, RAGLiteConfig, insert_documents
    from raglite_tpu.webchat import WebChatApp

    config = RAGLiteConfig(store_path=str(tmp_path / "kb"), embedder="hash:256", llm="echo")
    doc = Document.from_text(
        "# Fruit\n\nApples are red or green fruit from trees. " * 8
        + "\n\n# Light\n\nThe speed of light is a universal constant. " * 8
    )
    insert_documents([doc], config=config)
    app = WebChatApp(config)
    queries = ["red green fruit apples", "speed of light constant"] * 4
    out: dict[int, dict] = {}

    def worker(i):
        out[i] = app.handle_search({"query": queries[i], "method": "vector", "num_results": 2})

    # warm the device program first so the batching window isn't dominated
    # by compile time
    app.handle_search({"query": "warmup", "method": "vector", "num_results": 2})
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    fruit = out[0]["results"][0]["body"]
    light = out[1]["results"][0]["body"]
    assert "fruit" in fruit.lower()
    assert "light" in light.lower()
    for i in range(2, len(queries)):
        expected = fruit if i % 2 == 0 else light
        assert out[i]["results"][0]["body"] == expected
