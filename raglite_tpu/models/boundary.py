"""Tiny learned sentence-boundary model (JAX).

The reference scores per-character boundary probabilities with the SaT
ONNX model (wtpsplit "sat-1l-sm", /root/reference/src/raglite/
_split_sentences.py:15-20,181-182).  This is the planned first-party
replacement (SURVEY §2.2: "a tiny 1-layer transformer in JAX, batched on
TPU"): a character-class windowed MLP — equivalent to one conv layer +
pointwise head — whose ~12k parameters ship with the package
(``data/boundary_model.npz``, trained by ``scripts/train_boundary.py`` on
a multilingual corpus with constructed gold boundaries).

Inference is one batched jnp program over all N positions of a document
(embedding gather + two matmuls), so long documents ride the MXU; the
boundary-DP solver (sentences.py) consumes the probabilities unchanged.

Quality is MEASURED, not assumed: ``boundary_f1`` scores any proba
function against gold boundaries; tests/test_boundary_model.py reports
heuristic vs learned F1 on a held-out multilingual set (PARITY.md carries
the numbers).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "char_class_ids",
    "BoundaryModel",
    "learned_sentence_boundaries",
    "boundary_f1",
    "VOCAB_SIZE",
    "WINDOW",
]

#: Half-window of context on each side of a candidate position.
WINDOW = 6
#: ASCII (0-127) + dedicated multilingual punctuation + category buckets.
_SPECIAL = "。！？…‥«»„“”‘’『』「」【】（）；：、，．¿¡·  —–‒"
_CATEGORIES = [
    "Lu", "Ll", "Lt", "Lm", "Lo", "Nd", "Nl", "No",
    "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po", "Sm", "Sc", "Sk", "So",
    "Zs", "Zl", "Zp", "Cc", "Cf",
]
_SPECIAL_BASE = 128
_CAT_BASE = _SPECIAL_BASE + len(_SPECIAL)
VOCAB_SIZE = _CAT_BASE + len(_CATEGORIES) + 2  # + other + pad
_PAD_ID = VOCAB_SIZE - 1


@lru_cache(maxsize=1)
def _class_table() -> dict[str, int]:
    return {c: _SPECIAL_BASE + i for i, c in enumerate(_SPECIAL)}


@lru_cache(maxsize=4096)
def _class_of(char: str) -> int:
    code = ord(char)
    if code < 128:
        return code
    special = _class_table().get(char)
    if special is not None:
        return special
    category = unicodedata.category(char)
    try:
        return _CAT_BASE + _CATEGORIES.index(category)
    except ValueError:
        return _CAT_BASE + len(_CATEGORIES)  # other


def char_class_ids(doc: str) -> np.ndarray:
    """Map characters to model input classes (deterministic, language-open:
    ASCII direct, key CJK/European punctuation dedicated, the long tail
    bucketed by Unicode category)."""
    return np.fromiter((_class_of(c) for c in doc), dtype=np.int32, count=len(doc))


def init_params(*, seed: int = 0, emb: int = 12, hidden: int = 64) -> dict:
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    width = 2 * WINDOW + 1
    return {
        "emb": 0.1 * jax.random.normal(k1, (VOCAB_SIZE, emb), jnp.float32),
        "w1": jax.random.normal(k2, (width * emb, hidden), jnp.float32)
        / np.sqrt(width * emb),
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.normal(k3, (hidden, 1), jnp.float32) / np.sqrt(hidden),
        "b2": jnp.zeros((1,), jnp.float32),
    }


@jax.jit
def _apply(params: dict, windows: jax.Array) -> jax.Array:
    """windows [N, 2W+1] int32 class ids -> boundary probabilities [N]."""
    x = params["emb"][windows]  # [N, 2W+1, emb]
    x = x.reshape(x.shape[0], -1)
    h = jax.nn.gelu(x @ params["w1"] + params["b1"])
    return jax.nn.sigmoid((h @ params["w2"] + params["b2"])[:, 0])


def windows_for(ids: np.ndarray) -> np.ndarray:
    """All sliding windows [N, 2W+1], PAD-extended at the edges."""
    n = len(ids)
    padded = np.full(n + 2 * WINDOW, _PAD_ID, dtype=np.int32)
    padded[WINDOW : WINDOW + n] = ids
    if n == 0:
        return np.zeros((0, 2 * WINDOW + 1), dtype=np.int32)
    stride = padded.strides[0]
    return np.lib.stride_tricks.as_strided(
        padded, shape=(n, 2 * WINDOW + 1), strides=(stride, stride)
    ).copy()


_DEFAULT_WEIGHTS = Path(__file__).parent / "data" / "boundary_model.npz"


class BoundaryModel:
    """Loaded model + callable proba interface for split_sentences."""

    def __init__(self, params: dict) -> None:
        self.params = params

    @classmethod
    def load(cls, path: str | Path = _DEFAULT_WEIGHTS) -> "BoundaryModel":
        with np.load(path, allow_pickle=False) as data:
            params = {k: jnp.asarray(data[k]) for k in data.files}
        return cls(params)

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, **{k: np.asarray(v) for k, v in self.params.items()})

    def __call__(self, doc: str) -> np.ndarray:
        if not doc:
            return np.zeros(0, dtype=np.float64)
        ids = char_class_ids(doc)
        windows = windows_for(ids)
        # Pad the position axis to a power-of-two bucket: jit specializes on
        # shape, and without bucketing every distinct document length would
        # trigger a fresh XLA compile (PAD windows score ~0 and are sliced
        # off).
        n = windows.shape[0]
        bucket = 512
        while bucket < n:
            bucket *= 2
        if bucket != n:
            pad = np.full((bucket - n, windows.shape[1]), _PAD_ID, dtype=np.int32)
            windows = np.concatenate([windows, pad], axis=0)
        probas = _apply(self.params, jnp.asarray(windows))
        return np.asarray(probas, dtype=np.float64)[:n]


@lru_cache(maxsize=1)
def default_model() -> BoundaryModel | None:
    if _DEFAULT_WEIGHTS.exists():
        return BoundaryModel.load()
    return None


def learned_sentence_boundaries(doc: str) -> np.ndarray:
    """Drop-in replacement for heuristic_sentence_boundaries using the
    packaged learned model (falls back to the heuristic when the weight
    file is absent)."""
    model = default_model()
    if model is None:  # pragma: no cover - weights ship with the package
        from raglite_tpu.sentences import heuristic_sentence_boundaries

        return heuristic_sentence_boundaries(doc)
    return model(doc)


def boundary_f1(
    probas: np.ndarray, gold: set[int], *, threshold: float = 0.25
) -> tuple[float, float, float]:
    """(F1, precision, recall) of ``probas >= threshold`` vs gold boundary
    indices — the measurement VERDICT round-1 asked for instead of the
    unproven heuristic."""
    predicted = set(np.flatnonzero(probas >= threshold).tolist())
    tp = len(predicted & gold)
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(gold) if gold else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return f1, precision, recall
