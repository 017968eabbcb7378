"""Embedding encoders.

The reference delegates embedding to llama.cpp (bge-m3 GGUF) or remote APIs
(/root/reference/src/raglite/_embed.py:16-200, _litellm.py:96-148).  Here the
encoder is a first-party JAX component with token-level outputs so late
chunking runs on-device:

- ``HashEncoder`` ("hash:<dim>"): a deterministic feature-hashing encoder —
  token/char-n-gram features hash into a fixed random projection table in
  HBM; a token's embedding is a gather + segment-sum, so the whole encode is
  one jitted device program.  Needs no weights, making the full stack
  hermetic and fast (used by tests and as the offline default).
- ``TransformerEncoder`` ("flax:<preset>" / "flax:<safetensors path>"): an
  XLM-RoBERTa-style flax encoder (the bge-m3 architecture class) under jit,
  with token-level outputs for late chunking; weights load from safetensors
  when available, otherwise deterministic random init.

Both satisfy the ``Encoder`` protocol consumed by embed.py.
"""

from __future__ import annotations

import os
import re
import zlib
from functools import lru_cache, partial
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Encoder", "HashEncoder", "TransformerEncoder", "encoder_from_config", "embedding_dim"]


class Encoder(Protocol):
    """Uniform encoder interface (replaces the reference's llama.cpp /
    LiteLLM split, _embed.py:146-154)."""

    dim: int
    max_tokens: int
    supports_token_embeddings: bool

    def count_tokens(self, texts: list[str]) -> list[int]: ...

    def embed_token_level(self, text: str) -> np.ndarray:
        """Token-level embeddings [num_tokens, dim] (pre-pooling)."""
        ...

    def embed(self, texts: list[str]) -> np.ndarray:
        """Mean-pooled embeddings [len(texts), dim]."""
        ...


# --- Hash encoder -------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


from raglite_tpu.utils.padding import bucket as _bucket, round_up as _round_up


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("num_segments",))
def _hash_pool(table, ids, signs, segments, *, num_segments):
    """Per-token feature pooling: one gather + one segment-sum.

    Measured 13x faster than the cumsum-difference formulation on CPU
    (448 vs 5813 ms at 64k features x 1024 dims — the cumsum materializes
    an [F, d] running sum, 256 MB of traffic).  ``table`` must be an
    argument, not a closure capture: a captured device constant of this
    size makes XLA constant-processing pathologically slow.
    """
    rows = table[ids].astype(jnp.float32) * signs[:, None]
    token_emb = jax.ops.segment_sum(rows, segments, num_segments=num_segments)
    norm = jnp.linalg.norm(token_emb, axis=1, keepdims=True)
    return token_emb / jnp.maximum(norm, 1e-6)


class HashEncoder:
    """Deterministic feature-hashing encoder running as one device program.

    A token's features are the word itself plus its character trigrams; each
    feature hashes (crc32) to a row of a fixed Gaussian table with a ±1 sign.
    The token embedding is the signed sum of its feature rows; text
    embeddings mean-pool tokens.  Word overlap thus yields high cosine
    similarity while trigrams give subword robustness — sufficient retrieval
    signal for hermetic tests and throughput benchmarking without weights.
    """

    supports_token_embeddings = True

    def __init__(self, dim: int = 1024, *, vocab_bits: int = 16, max_tokens: int = 8192, seed: int = 0) -> None:
        self.dim = dim
        self.max_tokens = max_tokens
        self._mask = (1 << vocab_bits) - 1
        key = jax.random.PRNGKey(seed)
        # Values are always generated in fp32 (cross-platform determinism);
        # storage is bf16 in HBM on TPU, fp32 on CPU where bf16 arithmetic
        # is software-emulated (~2x slower measured).
        table32 = jax.random.normal(key, (1 << vocab_bits, dim), dtype=jnp.float32)
        self._table = (
            table32.astype(jnp.bfloat16) if jax.default_backend() == "tpu" else table32
        )
        self._table_np: np.ndarray | None = None  # host copy for the C++ path

    # Python featurization oracle (production path is the C++ featurizer,
    # native/postings.cpp:rlt_hash_featurize; parity is fuzz-tested).
    def _features(self, token: str) -> tuple[list[int], list[float]]:
        feats = [token]
        padded = f"#{token}#"
        if len(token) > 2:
            feats.extend(padded[i : i + 3] for i in range(len(padded) - 2))
        ids, signs = [], []
        for f in feats:
            h = zlib.crc32(f.encode("utf-8"))
            ids.append(h & self._mask)
            signs.append(1.0 if (h >> 31) & 1 else -1.0)
        return ids, signs

    def _featurize(self, text: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Returns (feature ids, signs, per-token feature bounds [n+1], n).

        Runs in C++ when the native library is built (native/postings.cpp:
        rlt_hash_featurize — ~50x the Python loop); the fallback below is
        the behavioral oracle."""
        from raglite_tpu.native import hash_featurize

        native = hash_featurize(text, max_tokens=self.max_tokens, mask=self._mask)
        if native is not None:
            return native
        tokens = _TOKEN_RE.findall(text.lower())[: self.max_tokens]
        ids: list[int] = []
        signs: list[float] = []
        bounds = [0]
        for token in tokens:
            f_ids, f_signs = self._features(token)
            ids.extend(f_ids)
            signs.extend(f_signs)
            bounds.append(len(ids))
        return (
            np.asarray(ids, dtype=np.int32),
            np.asarray(signs, dtype=np.float32),
            np.asarray(bounds, dtype=np.int64),
            len(tokens),
        )

    def count_tokens(self, texts: list[str]) -> list[int]:
        from raglite_tpu.native import count_tokens as native_count

        counts = []
        for text in texts:
            n = native_count(text)
            counts.append(n if n is not None else len(_TOKEN_RE.findall(text.lower())))
        return counts

    def embed_token_level(self, text: str) -> np.ndarray:
        # CPU: fused C++ path (tokenize+hash+pool in one pass; measured ~10x
        # the XLA CPU gather/scatter).  TPU: device gather + segment-sum.
        if jax.default_backend() != "tpu":
            from raglite_tpu.native import hash_embed

            if self._table_np is None:
                self._table_np = np.ascontiguousarray(np.asarray(self._table, np.float32))
            native = hash_embed(
                text, self._table_np, max_tokens=self.max_tokens, mask=self._mask
            )
            if native is not None:
                return native
        ids, signs, bounds, n = self._featurize(text)
        if n == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        # Bucket-pad both axes so jit compiles once per size bucket.
        f_pad = _bucket(len(ids))
        t_pad = _bucket(n)
        segments = np.repeat(np.arange(n, dtype=np.int32), np.diff(bounds))
        ids = np.pad(ids, (0, f_pad - len(ids)))
        signs = np.pad(signs, (0, f_pad - len(signs)))  # zero sign = no-op
        # Padding features scatter into an extra trailing segment (dropped).
        segments = np.pad(segments, (0, f_pad - len(segments)), constant_values=t_pad)
        out = _hash_pool(
            self._table,
            jnp.asarray(ids),
            jnp.asarray(signs),
            jnp.asarray(segments),
            num_segments=t_pad + 1,
        )
        return np.asarray(out[:n])

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            tok = self.embed_token_level(text)
            if tok.shape[0]:
                out[i] = tok.mean(axis=0)
        return out


# --- Transformer encoder ------------------------------------------------------


class TransformerEncoder:
    """XLM-RoBERTa-class encoder (bge-m3 architecture family) in flax.

    Presets: ``flax:tiny`` (2 layers, d=256 — tests), ``flax:base``
    (12 layers, d=768), ``flax:large`` (24 layers, d=1024 ≈ bge-m3).  A path
    to a safetensors checkpoint loads real weights; otherwise parameters are
    deterministic random init (still exercises the full compute path).
    """

    supports_token_embeddings = True

    _PRESETS = {
        "tiny": dict(layers=2, d_model=256, heads=4, d_ff=512, vocab=8192, max_len=512),
        "base": dict(layers=12, d_model=768, heads=12, d_ff=3072, vocab=250002, max_len=8192),
        "large": dict(layers=24, d_model=1024, heads=16, d_ff=4096, vocab=250002, max_len=8192),
    }

    def __init__(self, spec: str = "tiny", *, seed: int = 0, dtype=jnp.bfloat16) -> None:
        from raglite_tpu.models.transformer import EncoderModel, init_encoder_params
        from raglite_tpu.models.tokenizer import ByteTokenizer

        import os

        if spec == "sem":
            # The packaged semantic encoder trained on-TPU from the in-image
            # corpus (scripts/train_encoder.py; MLM + Contriever-style
            # contrastive).  Replaces the reference's downloaded bge-m3
            # default (_config.py:50-64) in the no-egress image.
            spec = os.path.join(os.path.dirname(__file__), "data", "encoder")
        if spec.startswith("ckpt:"):
            # orbax checkpoint written by save_checkpoint() below.
            from raglite_tpu.models.checkpoint import load_checkpoint

            params, cfg = load_checkpoint(spec.removeprefix("ckpt:"))
            tokenizer = ByteTokenizer(vocab_size=cfg["vocab"])
        elif os.path.isdir(spec) and os.path.exists(os.path.join(spec, "encoder.npz")):
            from raglite_tpu.models.tokenizer import load_tokenizer
            from raglite_tpu.models.transformer import load_npz_encoder

            cfg, params, _ = load_npz_encoder(os.path.join(spec, "encoder.npz"), dtype=dtype)
            tokenizer = load_tokenizer(os.path.join(spec, "tokenizer.json"))
        elif os.path.isdir(spec) or spec.endswith(".safetensors"):
            cfg, params, tokenizer = load_pretrained_encoder(spec, dtype=dtype)
        else:
            cfg = dict(self._PRESETS.get(spec, self._PRESETS["tiny"]))
            params = init_encoder_params(cfg, seed=seed, dtype=dtype)
            tokenizer = ByteTokenizer(vocab_size=cfg["vocab"])
        self._cfg = cfg
        self._params = params
        self._tokenizer = tokenizer
        self.dim = cfg["d_model"]
        self.max_tokens = cfg["max_len"]
        self._model = EncoderModel(cfg)
        self._forward = jax.jit(self._model.apply_tokens)

        # Batched mean-pooled embedding in one jitted program (bucketed
        # shapes): the throughput path for index builds — one [B, T] forward
        # instead of B single-text forwards.
        def _pooled(params, ids, mask):
            hidden = self._model.apply_tokens(params, ids, mask)
            denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
            return jnp.sum(hidden * mask[:, :, None], axis=1) / denom

        self._forward_pooled = jax.jit(_pooled)

    def save_checkpoint(self, path: str) -> None:
        """Write an orbax checkpoint loadable via ``flax:ckpt:<path>``."""
        from raglite_tpu.models.checkpoint import save_checkpoint

        save_checkpoint(path, self._params, self._cfg)

    def count_tokens(self, texts: list[str]) -> list[int]:
        return [len(self._tokenizer.encode(t)) for t in texts]

    def _run(self, token_ids: np.ndarray) -> np.ndarray:
        n = token_ids.shape[0]
        pad = _round_up(max(n, 8), 128)
        ids = np.zeros(pad, dtype=np.int32)
        ids[:n] = token_ids
        mask = np.zeros(pad, dtype=np.bool_)
        mask[:n] = True
        out = self._forward(self._params, jnp.asarray(ids)[None], jnp.asarray(mask)[None])
        return np.asarray(out[0, :n], dtype=np.float32)

    def embed_token_level(self, text: str) -> np.ndarray:
        ids = np.asarray(self._tokenizer.encode(text)[: self.max_tokens], dtype=np.int32)
        if ids.size == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._run(ids)

    def embed_token_level_batch(self, texts: list[str]) -> list[np.ndarray]:
        """Token-level embeddings for MANY texts as length-bucketed [B, T]
        forwards — the late-chunking insert path runs one device program per
        (B, T) bucket instead of one per segment.  Returns [n_i, d] per text
        (numerically identical to per-text :meth:`embed_token_level`)."""
        encoded = [
            np.asarray(self._tokenizer.encode(t)[: self.max_tokens], np.int32) for t in texts
        ]
        out: list[np.ndarray] = [np.zeros((0, self.dim), np.float32) for _ in texts]
        buckets: dict[int, list[int]] = {}
        for i, ids in enumerate(encoded):
            if ids.size:
                buckets.setdefault(_round_up(max(ids.size, 8), 128), []).append(i)
        for pad, members in buckets.items():
            # Token-level outputs are [B, T, d]: keep tiles modest so the
            # fetched hidden states stay a few MB per dispatch.
            for start in range(0, len(members), 8):
                group = members[start : start + 8]
                bpad = _round_up(len(group), 8)
                ids = np.zeros((bpad, pad), np.int32)
                mask = np.zeros((bpad, pad), np.bool_)
                for row, i in enumerate(group):
                    ids[row, : encoded[i].size] = encoded[i]
                    mask[row, : encoded[i].size] = True
                hidden = np.asarray(
                    self._forward(self._params, jnp.asarray(ids), jnp.asarray(mask)),
                    dtype=np.float32,
                )
                for row, i in enumerate(group):
                    out[i] = hidden[row, : encoded[i].size]
        return out

    def _ensure_rerank_programs(self) -> None:
        if hasattr(self, "_rerank_encode"):
            return

        def _encode_norm(params, ids, mask):
            """L2-normalized token states [B, T, d] fp32 (stay on device)."""
            hidden = self._model.apply_tokens(params, ids, mask)
            return hidden / jnp.maximum(
                jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-12
            )

        def _score(qh, q_mask, ch, c_mask):
            """Masked MaxSim of query states [Tq, d] against candidate
            states [C, Tc, d]; returns [C] fp32 (the only host fetch)."""
            sims = jnp.einsum(
                "qd,ctd->cqt", qh, ch,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            sims = jnp.where(c_mask[:, None, :], sims, -jnp.inf)
            best = jnp.max(sims, axis=-1)  # [C, Tq]
            best = jnp.where(jnp.isfinite(best), best, 0.0)
            return jnp.sum(best * q_mask[0][None, :], axis=-1)  # [C]

        self._rerank_encode = jax.jit(_encode_norm)
        self._rerank_score = jax.jit(_score)
        # Device-RESIDENT normalized token states keyed by candidate text:
        # warm reranks skip the candidate encode entirely and run only the
        # MaxSim score program (the encode dominates cold rerank cost).
        # Insertion-ordered for LRU; entries are [tc, d] fp32 device arrays
        # (~1.5 MB at tc=512/d=768), so the default 128-entry cap holds
        # ~200 MB HBM.  RAGLITE_TPU_RERANK_CACHE sets the cap (0 disables).
        self._rerank_cache: dict[str, tuple[jax.Array, int]] = {}
        self._rerank_cache_cap = int(os.environ.get("RAGLITE_TPU_RERANK_CACHE", "128"))

    def rerank_maxsim(self, query: str, texts: list[str]) -> np.ndarray:
        """Token-level MaxSim scores [len(texts)] computed ENTIRELY on
        device: encode the query and any uncached candidates, L2-normalize
        the token states, MaxSim, and fetch only the per-candidate scalars.

        The host-matrix path (embed_token_level_batch + ops/maxsim.py)
        moves the full [C, T, d] hidden states across the host<->device
        boundary TWICE (fetch after encode, upload before scoring) — ~50 MB
        per 32 long candidates, which through the dev tunnel costs seconds.
        This path moves C floats, and candidate token states are cached ON
        DEVICE by text (LRU, RAGLITE_TPU_RERANK_CACHE entries), so warm
        reranks run only the score program.  Numerically identical to the
        host path (same forward, same L2, same masked MaxSim; fp32 scoring
        matmul) — asserted by tests/test_rerank.py.
        """
        q_ids_np = np.asarray(self._tokenizer.encode(query)[: self.max_tokens], np.int32)
        if q_ids_np.size == 0 or not texts:
            return np.zeros(len(texts), np.float32)
        self._ensure_rerank_programs()
        encoded = [
            np.asarray(self._tokenizer.encode(t)[: self.max_tokens], np.int32) for t in texts
        ]
        qt = _round_up(max(q_ids_np.size, 8), 128)
        q_ids = np.zeros((1, qt), np.int32)
        q_mask = np.zeros((1, qt), np.bool_)
        q_ids[0, : q_ids_np.size] = q_ids_np
        q_mask[0, : q_ids_np.size] = True
        q_mask_j = jnp.asarray(q_mask)
        qh = self._rerank_encode(self._params, jnp.asarray(q_ids), q_mask_j)[0]
        cache, cap = self._rerank_cache, self._rerank_cache_cap
        # Refresh hits' recency BEFORE this call's inserts so a candidate
        # list near the cap can't evict its own entries.
        for text in texts:
            if text in cache:
                cache[text] = cache.pop(text)
        # Encode misses, bucketed by each candidate's OWN padded length (so
        # a text's cached states don't depend on what it co-encoded with).
        missing: dict[int, list[int]] = {}
        for i, ids in enumerate(encoded):
            if texts[i] not in cache:
                missing.setdefault(_round_up(max(ids.size, 8), 128), []).append(i)
        tile = 32  # bounds the encode's [B, heads, T, T] attention ephemeral
        for tc, members in missing.items():
            for start in range(0, len(members), tile):
                group = members[start : start + tile]
                bpad = _round_up(len(group), 8)
                c_ids = np.zeros((bpad, tc), np.int32)
                c_mask = np.zeros((bpad, tc), np.bool_)
                for row, i in enumerate(group):
                    c_ids[row, : encoded[i].size] = encoded[i]
                    c_mask[row, : encoded[i].size] = True
                states = self._rerank_encode(
                    self._params, jnp.asarray(c_ids), jnp.asarray(c_mask)
                )  # [bpad, tc, d] fp32, on device
                for row, i in enumerate(group):
                    cache[texts[i]] = (states[row], int(encoded[i].size))
        # Score: one dispatch per candidate-length bucket over the cached
        # device states (stacked on device — nothing crosses the tunnel),
        # then ONE concatenated scores fetch for the whole call: per-bucket
        # fetches each paid a full tunnel RTT (~30 ms), which dominated the
        # measured cold rerank-32 p50 (451 ms with 4 length buckets x 2
        # dispatch kinds); device outputs pipeline, the fetch serializes.
        scores = np.zeros(len(texts), np.float32)
        by_tc: dict[int, list[int]] = {}
        for i, text in enumerate(texts):
            by_tc.setdefault(int(cache[text][0].shape[0]), []).append(i)
        pieces: list[tuple[list[int], int]] = []  # (group, offset in concat)
        dev_scores: list[jax.Array] = []
        offset = 0
        for tc, members in by_tc.items():
            for start in range(0, len(members), tile):
                group = members[start : start + tile]
                bpad = _round_up(len(group), 8)
                rows = [cache[texts[i]][0] for i in group]
                if bpad > len(rows):
                    pad_row = jnp.zeros_like(rows[0])
                    rows.extend([pad_row] * (bpad - len(rows)))
                ch = jnp.stack(rows)  # [bpad, tc, d] device-side
                c_mask = np.zeros((bpad, tc), np.bool_)
                for row, i in enumerate(group):
                    c_mask[row, : cache[texts[i]][1]] = True
                dev_scores.append(
                    self._rerank_score(qh, q_mask_j, ch, jnp.asarray(c_mask))
                )
                pieces.append((group, offset))
                offset += bpad
        flat = np.asarray(
            dev_scores[0] if len(dev_scores) == 1 else jnp.concatenate(dev_scores),
            np.float32,
        )
        for group, off in pieces:
            scores[group] = flat[off : off + len(group)]
        while len(cache) > cap:
            cache.pop(next(iter(cache)))
        return scores

    def embed(self, texts: list[str]) -> np.ndarray:
        """Batched mean-pooled embeddings: texts bucket by padded length and
        run as [B, T] forwards (compiles once per (B, T) bucket) — the
        throughput path for index builds, versus B single-text forwards."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        encoded = [
            np.asarray(self._tokenizer.encode(t)[: self.max_tokens], np.int32) for t in texts
        ]
        buckets: dict[int, list[int]] = {}
        for i, ids in enumerate(encoded):
            if ids.size == 0:
                continue
            buckets.setdefault(_round_up(max(ids.size, 8), 128), []).append(i)
        for pad, members in buckets.items():
            for start in range(0, len(members), 64):  # batch tile
                group = members[start : start + 64]
                bpad = _round_up(len(group), 8)
                ids = np.zeros((bpad, pad), np.int32)
                mask = np.zeros((bpad, pad), np.bool_)
                for row, i in enumerate(group):
                    ids[row, : encoded[i].size] = encoded[i]
                    mask[row, : encoded[i].size] = True
                pooled = np.asarray(
                    self._forward_pooled(self._params, jnp.asarray(ids), jnp.asarray(mask)),
                    dtype=np.float32,
                )
                for row, i in enumerate(group):
                    out[i] = pooled[row]
        return out


def load_pretrained_encoder(path: str, *, dtype=jnp.bfloat16):
    """Load an XLM-R-family checkpoint from safetensors (offline image has no
    hub access; this path activates when the user mounts weights)."""
    from raglite_tpu.models.transformer import load_safetensors_encoder

    return load_safetensors_encoder(path, dtype=dtype)


# --- Factory ------------------------------------------------------------------


class OpenAICompatEncoder:
    """Remote embeddings over any OpenAI-compatible ``/embeddings`` endpoint
    (spec ``openai:<base_url>#<model>``) — the API-embedder path of the
    reference (_embed.py:144-184 batches LiteLLM ``embedding()`` calls the
    same way, 96 inputs per request; its bench uses text-embedding-3-large
    through this route, _bench.py:154-160)."""

    supports_token_embeddings = False
    BATCH = 96  # reference: _embed.py:150

    def __init__(self, spec: str, *, dim: int | None = None) -> None:
        import os

        base, _, model = spec.partition("#")
        self.base_url = base.rstrip("/")
        self.model = model or "default"
        self._dim = dim
        # Authenticated endpoints (api.openai.com and most hosted
        # compatibles) need a bearer token; unauthenticated local servers
        # work with none set.
        self.api_key = os.environ.get("RAGLITE_TPU_EMBEDDER_API_KEY") or os.environ.get(
            "OPENAI_API_KEY", ""
        )

    def _post(self, texts: list[str]) -> np.ndarray:
        import json
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/embeddings",
            data=json.dumps({"model": self.model, "input": texts}).encode(),
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}),
            },
        )
        with urllib.request.urlopen(req, timeout=300) as resp:  # noqa: S310
            payload = json.loads(resp.read())
        rows = sorted(payload["data"], key=lambda d: d.get("index", 0))
        return np.asarray([r["embedding"] for r in rows], dtype=np.float32)

    @property
    def dim(self) -> int:
        if self._dim is None:
            # Probe with a one-token request (reference: get_embedding_dim's
            # embed-probe fallback, _litellm.py:352-374).
            self._dim = int(self._post(["dimension probe"]).shape[1])
        return self._dim

    def count_tokens(self, texts: list[str]) -> list[int]:
        # len//3 chars-per-token proxy (reference: _rag.py:67-69).
        return [max(len(t) // 3, 1) for t in texts]

    def embed_token_level(self, text: str) -> np.ndarray:  # pragma: no cover
        msg = "remote embedders expose no token-level embeddings"
        raise NotImplementedError(msg)

    def embed(self, texts: list[str]) -> np.ndarray:
        out: list[np.ndarray] = []
        for start in range(0, len(texts), self.BATCH):
            out.append(self._post(texts[start : start + self.BATCH]))
        stacked = np.concatenate(out, axis=0) if out else np.zeros((0, self.dim), np.float32)
        norms = np.linalg.norm(stacked, axis=1, keepdims=True)
        return (stacked / np.maximum(norms, 1e-12)).astype(np.float16)


@lru_cache(maxsize=4)
def _make_encoder(embedder: str) -> Encoder:
    kind, _, arg = embedder.partition(":")
    if kind == "hash":
        dim = int(arg) if arg else 1024
        return HashEncoder(dim=dim)
    if kind == "flax":
        return TransformerEncoder(arg or "tiny")
    if kind == "openai":
        return OpenAICompatEncoder(arg)
    msg = (
        f"unknown embedder {embedder!r} (expected 'hash:<dim>', "
        "'flax:<preset|path>', or 'openai:<base_url>#<model>')"
    )
    raise ValueError(msg)


def encoder_from_config(config) -> Encoder:
    """Resolve the configured embedder to an encoder instance (cached like the
    reference's lru_cached llm() factory, _litellm.py:96-98)."""
    return _make_encoder(config.embedder)


def embedding_dim(config) -> int:
    """Embedding dimensionality (reference: _litellm.py:352-374)."""
    return encoder_from_config(config).dim
