"""Test fixtures.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the reference's analogue is its
DuckDB-vs-Postgres backend matrix, tests/conftest.py:26-74 there).
"""

import os

# Tests run on a virtual 8-device CPU mesh for speed and multi-chip coverage.
# The harness's sitecustomize registers the tunneled TPU backend at interpreter
# start and pins jax_platforms programmatically, so overriding the env var is
# not enough — update the jax config before any backend is initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_force_host_platform_device_count=8".strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile
from pathlib import Path

import pytest

# Keep IR-bench run caches out of the user-data dir during tests.
os.environ["RAGLITE_TPU_BENCH_CACHE"] = tempfile.mkdtemp(prefix="raglite_bench_cache_")

SPECREL_PDF = Path("/root/reference/tests/specrel.pdf")


@pytest.fixture(scope="session")
def specrel_markdown() -> str:
    from raglite_tpu.markdown import document_to_markdown

    return document_to_markdown(SPECREL_PDF)


@pytest.fixture(scope="session")
def raglite_test_config(tmp_path_factory: pytest.TempPathFactory):
    """A config with the specrel corpus inserted once per session
    (reference: tests/conftest.py:114-129)."""
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.documents import Document
    from raglite_tpu.insert import insert_documents

    store = tmp_path_factory.mktemp("store")
    config = RAGLiteConfig(store_path=str(store), embedder="hash:256", llm="echo")
    document = Document.from_path(
        SPECREL_PDF, type="Paper", topic="Physics", author="Albert Einstein"
    )
    insert_documents([document], config=config)
    return config
