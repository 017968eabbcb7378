"""Model parameter checkpointing (orbax).

The reference downloads GGUF weights through llama.cpp's loader
(/root/reference/src/raglite/_litellm.py:96-148); here model parameters are
JAX pytrees checkpointed with orbax — the TPU-native format (async-friendly,
shard-aware, works under jit/pjit shardings).  A checkpoint directory holds:

- ``params/``     the orbax pytree checkpoint
- ``config.json`` the architecture config used to rebuild the model

``JaxChatLLM("path:/ckpt/dir")`` and ``TransformerEncoder("path:/ckpt/dir")``
load from such directories (models/decoder.py, models/encoder.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str | Path, params: Any, config: dict) -> None:
    """Write ``params`` (a JAX pytree) and its architecture config."""
    import orbax.checkpoint as ocp

    root = Path(path).absolute()
    root.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(root / "params", params, force=True)
    (root / "config.json").write_text(json.dumps(config))


def load_checkpoint(path: str | Path) -> tuple[Any, dict]:
    """Read (params pytree, architecture config) from a checkpoint dir."""
    import orbax.checkpoint as ocp

    root = Path(path).absolute()
    config = json.loads((root / "config.json").read_text())
    with ocp.PyTreeCheckpointer() as checkpointer:
        params = checkpointer.restore(root / "params")
    return params, config
