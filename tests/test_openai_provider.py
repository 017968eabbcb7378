"""OpenAI-compatible provider tests against a stdlib stub server
(models/llm.py:OpenAICompatLLM — the reference's LiteLLM API path analogue,
_litellm.py there)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from raglite_tpu.models.llm import OpenAICompatLLM, ToolCall


@pytest.fixture(scope="module")
def stub_server():
    """An OpenAI-compatible /chat/completions stub recording requests."""
    received: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:
            pass

        def do_POST(self) -> None:  # noqa: N802
            length = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(length))
            received.append({"path": self.path, "payload": payload})
            if payload.get("tools") and "weather" in json.dumps(payload["messages"]):
                message = {
                    "role": "assistant",
                    "content": None,
                    "tool_calls": [
                        {
                            "id": "call_1",
                            "type": "function",
                            "function": {
                                "name": "get_weather",
                                "arguments": json.dumps({"city": "Paris"}),
                            },
                        }
                    ],
                }
            else:
                message = {"role": "assistant", "content": "stub answer"}
            body = json.dumps(
                {"choices": [{"index": 0, "message": message, "finish_reason": "stop"}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield server.server_address[1], received
    server.shutdown()


def test_openai_provider_complete_and_path(stub_server) -> None:
    port, received = stub_server
    llm = OpenAICompatLLM(f"http://127.0.0.1:{port}/v1#mymodel")
    response = llm.complete([{"role": "user", "content": "hello"}], temperature=0.5)
    assert response.content == "stub answer"
    assert received[-1]["path"] == "/v1/chat/completions"
    assert received[-1]["payload"]["model"] == "mymodel"
    assert received[-1]["payload"]["temperature"] == 0.5


def test_openai_provider_tool_calls(stub_server) -> None:
    port, received = stub_server
    llm = OpenAICompatLLM(f"http://127.0.0.1:{port}/v1#mymodel")
    tools = [
        {
            "type": "function",
            "function": {"name": "get_weather", "parameters": {"type": "object"}},
        }
    ]
    response = llm.complete(
        [{"role": "user", "content": "weather in paris?"}], tools=tools
    )
    assert response.content is None
    assert len(response.tool_calls) == 1
    call = response.tool_calls[0]
    assert isinstance(call, ToolCall)
    assert call.name == "get_weather"
    assert json.loads(call.arguments) == {"city": "Paris"}
    assert received[-1]["payload"]["tool_choice"] == "auto"
    # Streaming protocol yields content or tool calls.
    items = list(
        llm.stream([{"role": "user", "content": "weather in paris?"}], tools=tools)
    )
    assert any(isinstance(i, ToolCall) for i in items)


def test_openai_provider_via_config(stub_server) -> None:
    port, _ = stub_server
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.models.llm import llm_from_config

    config = RAGLiteConfig(
        store_path=":memory:", embedder="hash:128",
        llm=f"openai:http://127.0.0.1:{port}/v1#mymodel",
    )
    llm = llm_from_config(config)
    assert llm.complete([{"role": "user", "content": "hi"}]).content == "stub answer"
