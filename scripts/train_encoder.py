"""Train a small semantic text encoder ON the TPU, from scratch, offline.

Round-3 deliverable (VERDICT.md "Next round" #1): every retrieval-quality
lever of the framework (multivector blend, query adapter, MaxSim rerank —
reference semantics: /root/reference/src/raglite/_insert.py:125-145,
_query_adapter.py:41, _search.py:364-397) only *means* anything on semantic
embeddings, and the image ships no pretrained weights.  So we train our own:

  phase 1  masked-language-model pretraining (BERT-style, 15% masking with
           the 80/10/10 corruption split) over the in-image documentation
           corpus built by scripts/build_corpus.py — this is where
           distributional semantics come from;
  phase 2  unsupervised contrastive finetuning (Contriever-style independent
           cropping: two random spans of the same document are a positive
           pair, in-batch negatives, InfoNCE with symmetric cross-entropy) —
           this aligns the mean-pooled sentence space for retrieval.

The model is the framework's own `EncoderModel` (models/transformer.py);
sizes in SIZES below — r3 shipped `small` (4L/d512/8k vocab, 17M params),
r4 ships `base` (8L/d768/16k vocab, ~64M params; d % 256 == 0 keeps the
int4 scan routing), plus a hard-negative contrastive phase (--phase hardneg)
that mines in-corpus near-misses after the Contriever phase.
Training runs in bf16 on the MXU with an fp32 Adam state; steps are
async-dispatched so the dev-tunnel RPC floor does not serialize the loop.

The final checkpoint is exported to raglite_tpu/models/data/encoder/
(flat npz + tokenizer.json + config.json) and loads as embedder="flax:sem".

Usage:
  python scripts/train_encoder.py --phase all            # tokenize+mlm+clip+export
  python scripts/train_encoder.py --phase mlm --steps 20000
  python scripts/train_encoder.py --phase contrastive --steps 4000
  python scripts/train_encoder.py --phase export
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Persistent XLA compile cache: fresh processes reuse compiled programs
# instead of re-compiling through the (intermittently stalling) tunnel
# compile service.
import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CORPUS = REPO / "data" / "corpus"
EXPORT = REPO / "raglite_tpu" / "models" / "data" / "encoder"

# Model sizes.  r3 shipped `small` (17M); r4 scales one notch (VERDICT r4
# task #8): 8 layers x d768 (dim % 256 == 0 keeps the int4 scan routing),
# 16k BPE vocab = 69.6M params.
SIZES = {
    "small": dict(layers=4, d_model=512, heads=8, d_ff=2048, vocab=8192, max_len=512),
    "base": dict(layers=8, d_model=768, heads=12, d_ff=3072, vocab=16384, max_len=512),
    # r5 scales the next notch (VERDICT r4 "next round" #5: "12L/d1024"):
    # ~168M params, d % 256 == 0 keeps the int4 scan routing.  The post-LN
    # stack is unstable at this depth at the base recipe's 4e-4 peak (the
    # first large MLM run spike-collapsed to the unigram solution at step
    # ~4200), so `large` carries its own MLM optimizer knobs.
    "large": dict(
        layers=12, d_model=1024, heads=16, d_ff=4096, vocab=16384, max_len=512,
        mlm_lr=1.5e-4, mlm_warmup=2500, clip=0.5,
    ),
}
CFG = SIZES["base"]
WORKDIR = REPO / "data" / "encoder_train_base"
PAD, BOS, EOS, MASK = 0, 1, 2, 3
# Training sequence length (inference runs up to max_len).  Overridable per
# phase with --seq: the late-chunking insert path encodes documents in
# max_len-token segments, so a final MLM stage at --seq 512 gives the
# position rows 128..511 real gradients instead of leaving them at init.
SEQ = 128
# Query towers (contrastive/hardneg/maxsim short crops, 8..48 tokens) pad to
# this instead of SEQ — padding the short tower to SEQ wastes ~75% of its
# tower FLOPs at SEQ >= 256.
QSEQ = 64


# --- Tokenizer + token cache --------------------------------------------------


def train_tokenizer() -> None:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    WORKDIR.mkdir(parents=True, exist_ok=True)
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=CFG["vocab"],
        special_tokens=["<pad>", "<s>", "</s>", "<mask>"],
        show_progress=False,
    )

    def lines():
        with open(CORPUS / "train.jsonl") as f:
            for line in f:
                yield json.loads(line)["text"]

    t0 = time.time()
    tok.train_from_iterator(lines(), trainer)
    tok.save(str(WORKDIR / "tokenizer.json"))
    print(f"tokenizer: vocab={tok.get_vocab_size()} in {time.time()-t0:.0f}s")


def build_token_cache() -> None:
    """Tokenize the train corpus once into a flat int16 array + doc offsets."""
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(str(WORKDIR / "tokenizer.json"))
    ids_all: list[np.ndarray] = []
    offsets = [0]
    n = 0
    t0 = time.time()
    with open(CORPUS / "train.jsonl") as f:
        batch: list[str] = []
        for line in f:
            batch.append(json.loads(line)["text"])
            if len(batch) == 2048:
                for e in tok.encode_batch(batch):
                    arr = np.asarray(e.ids, dtype=np.uint16)
                    ids_all.append(arr)
                    n += arr.size
                    offsets.append(n)
                batch = []
        for e in tok.encode_batch(batch):
            arr = np.asarray(e.ids, dtype=np.uint16)
            ids_all.append(arr)
            n += arr.size
            offsets.append(n)
    flat = np.concatenate(ids_all)
    np.savez(WORKDIR / "tokens.npz", flat=flat, offsets=np.asarray(offsets, np.int64))
    print(f"token cache: {n/1e6:.1f}M tokens, {len(offsets)-1} docs, {time.time()-t0:.0f}s")


def _load_tokens():
    z = np.load(WORKDIR / "tokens.npz")
    return z["flat"], z["offsets"]


# --- Model/optimizer scaffolding ---------------------------------------------


def _make_state(params_dtype, seed: int = 0, resume: str | None = None):
    import jax.numpy as jnp

    from raglite_tpu.models.transformer import init_encoder_params

    if resume and (WORKDIR / resume).exists():
        from raglite_tpu.models.transformer import load_npz_encoder

        cfg, params, _ = load_npz_encoder(str(WORKDIR / resume), dtype=jnp.float32)
        print(f"resumed params from {resume}")
        return params
    params = init_encoder_params(CFG, seed=seed, dtype=jnp.float32)
    return params


def _adamw(lr_schedule):
    import optax

    return optax.chain(
        optax.clip_by_global_norm(CFG.get("clip", 1.0)),
        optax.adamw(lr_schedule, b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01),
    )


def _doc_sampler(flat, offsets, rng, min_len=24):
    """Yield random document (start, length) with at least min_len tokens."""
    lengths = np.diff(offsets)
    ok = np.flatnonzero(lengths >= min_len)
    while True:
        idx = ok[rng.integers(0, ok.size)]
        yield offsets[idx], lengths[idx]


# --- Phase 1: masked language modeling ---------------------------------------


def run_mlm(steps: int, batch: int, resume: bool) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from raglite_tpu.models.transformer import EncoderModel, save_npz_encoder

    flat, offsets = _load_tokens()
    params = _make_state(jnp.float32, resume="mlm.npz" if resume else None)
    model = EncoderModel(CFG)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, peak_value=CFG.get("mlm_lr", 4e-4),
        warmup_steps=min(CFG.get("mlm_warmup", 1000), steps // 4),
        decay_steps=steps, end_value=2e-5,
    )
    optimizer = _adamw(schedule)
    opt_state = optimizer.init(params)

    def loss_fn(p, ids, labels, weights):
        p16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p
        )
        hidden = model.apply_tokens(p16, ids, ids != PAD)  # [B,T,d] fp32
        logits = jnp.einsum(
            "btd,vd->btv", hidden.astype(jnp.bfloat16), p16["tok_emb"],
            preferred_element_type=jnp.float32,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    @jax.jit
    def train_step(p, o, ids, labels, weights):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, labels, weights)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    sampler = _doc_sampler(flat, offsets, rng, min_len=SEQ // 2)

    def make_batch():
        ids = np.full((batch, SEQ), PAD, np.int32)
        labels = np.zeros((batch, SEQ), np.int32)
        weights = np.zeros((batch, SEQ), np.float32)
        for b in range(batch):
            start, length = next(sampler)
            take = min(length, SEQ)
            off = start + (rng.integers(0, length - take + 1) if length > take else 0)
            row = flat[off : off + take].astype(np.int32)
            # 15% masking, 80/10/10 corruption.
            n_mask = max(1, int(0.15 * take))
            pos = rng.choice(take, size=n_mask, replace=False)
            labels[b, pos] = row[pos]
            weights[b, pos] = 1.0
            corrupted = row.copy()
            split = rng.random(n_mask)
            corrupted[pos[split < 0.8]] = MASK
            rand_pos = pos[(split >= 0.8) & (split < 0.9)]
            corrupted[rand_pos] = rng.integers(4, CFG["vocab"], rand_pos.size)
            ids[b, :take] = corrupted
        return ids, labels, weights

    from collections import deque

    t0 = time.time()
    losses = deque(maxlen=50)  # bounded: each entry is a live device scalar
    best_saved = float("inf")
    for step in range(steps):
        ids, labels, weights = make_batch()
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(weights)
        )
        losses.append(loss)
        if (step + 1) % 200 == 0:
            recent = float(np.mean([float(l) for l in losses]))
            rate = (step + 1) / (time.time() - t0)
            print(f"mlm step {step+1}/{steps} loss {recent:.3f} ({rate:.1f} steps/s)", flush=True)
        if (step + 1) % 2000 == 0:
            # Collapse guard: a post-LN spike-collapse (loss jumps and flattens
            # at the unigram solution) must not clobber the last good
            # checkpoint — only save when the recent loss is no worse than the
            # best checkpointed loss plus slack.
            recent = float(np.mean([float(l) for l in losses]))
            if recent < best_saved + 0.05:
                best_saved = min(best_saved, recent)
                save_npz_encoder(str(WORKDIR / "mlm.npz"), params, CFG)
            else:
                print(
                    f"mlm step {step+1}: loss {recent:.3f} regressed past best "
                    f"saved {best_saved:.3f} — checkpoint NOT overwritten",
                    flush=True,
                )
    final = float(np.mean([float(l) for l in losses]))
    if final < best_saved + 0.05:
        save_npz_encoder(str(WORKDIR / "mlm.npz"), params, CFG)
    print(f"mlm done: final loss {final:.3f} (best saved {min(best_saved, final):.3f})")


# --- Phase 2: contrastive (Contriever-style independent cropping) -------------


def run_contrastive(steps: int, batch: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from raglite_tpu.models.transformer import (
        EncoderModel,
        load_npz_encoder,
        save_npz_encoder,
    )

    flat, offsets = _load_tokens()
    _, params, _ = load_npz_encoder(str(WORKDIR / "mlm.npz"), dtype=jnp.float32)
    model = EncoderModel(CFG)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, peak_value=1e-4, warmup_steps=min(500, steps // 10),
        decay_steps=steps, end_value=1e-5,
    )
    optimizer = _adamw(schedule)
    opt_state = optimizer.init(params)
    temp = 0.05

    @jax.checkpoint  # remat each tower: keep only [B, d] outputs between
    def embed(p, ids):  # towers, recompute activations in backward — the
        # base-size model's two un-remat'd towers at batch 512 OOM'd 16 GB.
        mask = ids != PAD
        hidden = model.apply_tokens(p, ids, mask)
        pooled = jnp.sum(hidden * mask[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        )
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=1, keepdims=True), 1e-6)

    def loss_fn(p, a_ids, b_ids):
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p)
        za = embed(p16, a_ids)
        zb = embed(p16, b_ids)
        logits = za @ zb.T / temp
        labels = jnp.arange(za.shape[0])
        loss_ab = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss_ba = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        return 0.5 * (jnp.mean(loss_ab) + jnp.mean(loss_ba))

    @jax.jit
    def train_step(p, o, a_ids, b_ids):
        loss, grads = jax.value_and_grad(loss_fn)(p, a_ids, b_ids)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(1)
    sampler = _doc_sampler(flat, offsets, rng, min_len=48)

    def crop(start, length, lo, hi):
        size = int(rng.integers(lo, min(hi, length) + 1))
        off = int(rng.integers(0, length - size + 1))
        return flat[start + off : start + off + size].astype(np.int32)

    def make_batch():
        a = np.full((batch, SEQ), PAD, np.int32)
        b = np.full((batch, QSEQ), PAD, np.int32)
        for i in range(batch):
            start, length = next(sampler)
            # Asymmetric crops: one passage-like, one short query-like span —
            # matching the retrieval workload (short questions vs chunks).
            ca = crop(start, length, 32, SEQ)
            cb = crop(start, length, 8, min(48, QSEQ))
            a[i, : ca.size] = ca
            b[i, : cb.size] = cb
        return a, b

    from collections import deque

    t0 = time.time()
    losses = deque(maxlen=50)
    for step in range(steps):
        a, b = make_batch()
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(a), jnp.asarray(b))
        losses.append(loss)
        if (step + 1) % 100 == 0:
            recent = float(np.mean([float(l) for l in losses]))
            rate = (step + 1) / (time.time() - t0)
            print(
                f"contrastive step {step+1}/{steps} loss {recent:.3f} ({rate:.1f} steps/s)",
                flush=True,
            )
        if (step + 1) % 1000 == 0:
            save_npz_encoder(str(WORKDIR / "contrastive.npz"), params, CFG)
    save_npz_encoder(str(WORKDIR / "contrastive.npz"), params, CFG)
    print(f"contrastive done: final loss {float(np.mean([float(l) for l in losses])):.3f}")


# --- Phase 3: hard-negative contrastive finetuning -----------------------------


def _mine_hard_negatives(params, flat, offsets, k: int = 8):
    """Embed one representative crop per train document with the CURRENT
    model and return each document's top-k nearest OTHER documents.

    These are the "hard" negatives: documents the model currently confuses
    with the anchor.  In-batch negatives (phase 2) are random and mostly
    easy; appending mined negatives to the InfoNCE denominator is the
    standard lift step (e.g. DPR/ANCE-style training) and is what VERDICT
    r4 task #8 asks for.  All compute is on-device: batched encoder
    forwards, then a tiled [N, N] similarity matmul + top-k.
    """
    import jax
    import jax.numpy as jnp

    from raglite_tpu.models.transformer import EncoderModel

    model = EncoderModel(CFG)
    lengths = np.diff(offsets)
    ok = np.flatnonzero(lengths >= 48)
    n = ok.size

    p16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )

    # Params/embeddings are jit ARGUMENTS, not closures: a closed-over tree
    # is baked into the HLO as constants, and at the large size the ~336 MB
    # compile request exceeds the tunnel compile service's body limit
    # (HTTP 413).
    @jax.jit
    def embed_batch(p16, ids):
        mask = ids != PAD
        hidden = model.apply_tokens(p16, ids, mask)
        pooled = jnp.sum(hidden * mask[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        )
        return (
            pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=1, keepdims=True), 1e-6)
        ).astype(jnp.bfloat16)

    B = 512
    embs = []
    t0 = time.time()
    for i in range(0, n, B):
        batch_idx = ok[i : i + B]
        ids = np.full((len(batch_idx), SEQ), PAD, np.int32)
        for r, di in enumerate(batch_idx):
            take = min(int(lengths[di]), SEQ)
            ids[r, :take] = flat[offsets[di] : offsets[di] + take].astype(np.int32)
        pad = B - len(batch_idx)
        if pad:
            ids = np.concatenate([ids, np.full((pad, SEQ), PAD, np.int32)])
            ids[len(batch_idx):, 0] = BOS  # avoid all-PAD rows
        embs.append(embed_batch(p16, jnp.asarray(ids))[: len(batch_idx)])
    embs = jnp.concatenate(embs)  # [n, d] bf16, device-resident
    print(f"hardneg: embedded {n} docs in {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def topk_tile(embs, tile, tile_idx):
        sims = (tile @ embs.T).astype(jnp.float32)  # [B, n]
        cols = jnp.arange(embs.shape[0])[None, :]
        sims = jnp.where(cols == tile_idx[:, None], -jnp.inf, sims)  # drop self
        _, idx = jax.lax.top_k(sims, k)
        return idx

    t0 = time.time()
    neigh = np.empty((n, k), np.int64)
    for i in range(0, n, B):
        tile = embs[i : i + B]
        tile_idx = jnp.arange(i, i + tile.shape[0])
        neigh[i : i + tile.shape[0]] = np.asarray(topk_tile(embs, tile, tile_idx))
    print(f"hardneg: mined top-{k} neighbors in {time.time()-t0:.0f}s", flush=True)
    # Map row positions back to document indices.
    return ok, ok[neigh]


def run_hardneg(steps: int, batch: int) -> None:
    """InfoNCE with mined hard negatives: logits are [B, 2B] — the B
    in-batch positives plus each anchor's mined hard-negative passage."""
    import jax
    import jax.numpy as jnp
    import optax

    from raglite_tpu.models.transformer import (
        EncoderModel,
        load_npz_encoder,
        save_npz_encoder,
    )

    flat, offsets = _load_tokens()
    _, params, _ = load_npz_encoder(str(WORKDIR / "contrastive.npz"), dtype=jnp.float32)
    ok_docs, neighbors = _mine_hard_negatives(params, flat, offsets)
    doc_row = {int(d): i for i, d in enumerate(ok_docs)}
    model = EncoderModel(CFG)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, peak_value=5e-5, warmup_steps=min(300, steps // 10),
        decay_steps=steps, end_value=5e-6,
    )
    optimizer = _adamw(schedule)
    opt_state = optimizer.init(params)
    temp = 0.05

    @jax.checkpoint  # three towers per step: remat keeps peak at one tower
    def embed(p, ids):
        mask = ids != PAD
        hidden = model.apply_tokens(p, ids, mask)
        pooled = jnp.sum(hidden * mask[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        )
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=1, keepdims=True), 1e-6)

    def loss_fn(p, q_ids, pos_ids, neg_ids):
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p)
        zq = embed(p16, q_ids)            # [B, d]
        zp = embed(p16, pos_ids)          # [B, d]
        zn = embed(p16, neg_ids)          # [B, d] mined hard negatives
        logits = zq @ jnp.concatenate([zp, zn]).T / temp  # [B, 2B]
        labels = jnp.arange(zq.shape[0])
        loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        # Reverse direction over the positive block keeps the phase-2
        # symmetric objective.
        loss_pq = optax.softmax_cross_entropy_with_integer_labels(
            (zp @ zq.T) / temp, labels
        )
        return 0.5 * (jnp.mean(loss_qp) + jnp.mean(loss_pq))

    @jax.jit
    def train_step(p, o, q_ids, pos_ids, neg_ids):
        loss, grads = jax.value_and_grad(loss_fn)(p, q_ids, pos_ids, neg_ids)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(2)
    lengths = np.diff(offsets)

    def crop(doc_idx, lo, hi):
        start, length = int(offsets[doc_idx]), int(lengths[doc_idx])
        size = int(rng.integers(lo, min(hi, length) + 1))
        off = int(rng.integers(0, length - size + 1))
        return flat[start + off : start + off + size].astype(np.int32)

    def make_batch():
        q = np.full((batch, QSEQ), PAD, np.int32)
        p_ = np.full((batch, SEQ), PAD, np.int32)
        n_ = np.full((batch, SEQ), PAD, np.int32)
        for i in range(batch):
            di = int(ok_docs[rng.integers(0, ok_docs.size)])
            cq = crop(di, 8, min(48, QSEQ))
            cp = crop(di, 32, SEQ)
            # A random one of the anchor's mined neighbors, passage crop.
            ni = int(neighbors[doc_row[di], rng.integers(0, neighbors.shape[1])])
            cn = crop(ni, 32, SEQ)
            q[i, : cq.size] = cq
            p_[i, : cp.size] = cp
            n_[i, : cn.size] = cn
        return q, p_, n_

    from collections import deque

    t0 = time.time()
    losses = deque(maxlen=50)
    for step in range(steps):
        q, p_, n_ = make_batch()
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(q), jnp.asarray(p_), jnp.asarray(n_)
        )
        losses.append(loss)
        if (step + 1) % 100 == 0:
            recent = float(np.mean([float(l) for l in losses]))
            rate = (step + 1) / (time.time() - t0)
            print(f"hardneg step {step+1}/{steps} loss {recent:.3f} ({rate:.1f} steps/s)", flush=True)
        if (step + 1) % 1000 == 0:
            save_npz_encoder(str(WORKDIR / "hardneg.npz"), params, CFG)
    save_npz_encoder(str(WORKDIR / "hardneg.npz"), params, CFG)
    print(f"hardneg done: final loss {float(np.mean([float(l) for l in losses])):.3f}")


# --- Phase 4: joint mean-pool + token-level MaxSim finetuning ------------------


def run_maxsim(steps: int, batch: int, lr: float = 3e-5, dense_weight: float = 1.0) -> None:
    """Train the TOKEN geometry the reranker actually scores with.

    The default reranker is ColBERT-style late interaction: per query token,
    max cosine over candidate tokens, summed (search.py `_rank_with_token_
    maxsim`, ops/maxsim.py — replacing the reference's FlashRank cross-
    encoder, /root/reference/src/raglite/_config.py:73-79).  Through r4 those
    token states were only ever trained as a *mean-pool* bag (MLM +
    contrastive phases), so per-token similarities were noisy and rerank was
    quality-negative (IRBENCH_r04).  This phase optimizes BOTH heads of the
    same encoder jointly:

      L = InfoNCE(mean-pool, hard negs)  +  InfoNCE(MaxSim, hard negs)

    so dense retrieval quality is preserved while the token-level MaxSim
    score becomes discriminative.  The MaxSim here is exactly the inference
    scoring rule (L2-normalized token states, masked max over candidate
    tokens, masked aggregation over query tokens).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from raglite_tpu.models.transformer import (
        EncoderModel,
        load_npz_encoder,
        save_npz_encoder,
    )

    flat, offsets = _load_tokens()
    _, params, _ = load_npz_encoder(str(WORKDIR / "hardneg.npz"), dtype=jnp.float32)
    ok_docs, neighbors = _mine_hard_negatives(params, flat, offsets)
    doc_row = {int(d): i for i, d in enumerate(ok_docs)}
    model = EncoderModel(CFG)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, peak_value=lr, warmup_steps=min(200, steps // 10),
        decay_steps=steps, end_value=lr / 10,
    )
    optimizer = _adamw(schedule)
    opt_state = optimizer.init(params)
    temp = 0.05

    @jax.checkpoint  # four tower applications per step: remat each
    def tokens_and_pool(p, ids):
        """L2-normalized token states [B, T, d] + L2 mean-pooled [B, d]."""
        mask = ids != PAD
        hidden = model.apply_tokens(p, ids, mask)
        pooled = jnp.sum(hidden * mask[:, :, None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1
        )
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=1, keepdims=True), 1e-6)
        tok = hidden / jnp.maximum(jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-6)
        tok = tok * mask[:, :, None]
        return tok.astype(jnp.bfloat16), pooled

    def maxsim_matrix(qt, q_mask, dt, d_mask):
        """[B, C] mean-over-query-token MaxSim (the inference scoring rule up
        to a per-query positive scale, which ranking is invariant to)."""
        sims = jnp.einsum("bqd,ctd->bcqt", qt, dt, preferred_element_type=jnp.float32)
        sims = jnp.where(d_mask[None, :, None, :], sims, -jnp.inf)
        best = jnp.max(sims, axis=-1)  # [B, C, Tq]
        best = jnp.where(jnp.isfinite(best), best, 0.0)
        denom = jnp.maximum(jnp.sum(q_mask, axis=1), 1.0)  # [B]
        return jnp.einsum("bcq,bq->bc", best, q_mask) / denom[:, None]

    def loss_fn(p, q_ids, pos_ids, neg_ids):
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p)
        qt, zq = tokens_and_pool(p16, q_ids)
        pt, zp = tokens_and_pool(p16, pos_ids)
        nt, zn = tokens_and_pool(p16, neg_ids)
        labels = jnp.arange(zq.shape[0])
        # Dense head: identical objective to phase 3 (keeps retrieval quality).
        dense_logits = zq @ jnp.concatenate([zp, zn]).T / temp
        loss_dense = 0.5 * (
            jnp.mean(optax.softmax_cross_entropy_with_integer_labels(dense_logits, labels))
            + jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels((zp @ zq.T) / temp, labels)
            )
        )
        # Token head: InfoNCE over the MaxSim score against the same
        # positives + mined hard negatives.
        q_mask = (q_ids != PAD).astype(jnp.float32)
        d_mask = jnp.concatenate([pos_ids, neg_ids]) != PAD
        dt = jnp.concatenate([pt, nt])
        ms_logits = maxsim_matrix(qt, q_mask, dt, d_mask) / temp
        loss_tok = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(ms_logits, labels)
        )
        # dense_weight > 1 biases the joint objective toward preserving the
        # mean-pool retrieval geometry (the r5 A/B measured the 1.0/3e-5
        # recipe costing sem-multivector -0.0145 MRR@10 while the token head
        # learned; the v2 recipe trades slower token-head convergence for a
        # smaller dense dip).
        return dense_weight * loss_dense + loss_tok, (loss_dense, loss_tok)

    @jax.jit
    def train_step(p, o, q_ids, pos_ids, neg_ids):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, q_ids, pos_ids, neg_ids
        )
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, aux

    rng = np.random.default_rng(3)
    lengths = np.diff(offsets)

    def crop(doc_idx, lo, hi):
        start, length = int(offsets[doc_idx]), int(lengths[doc_idx])
        size = int(rng.integers(lo, min(hi, length) + 1))
        off = int(rng.integers(0, length - size + 1))
        return flat[start + off : start + off + size].astype(np.int32)

    def make_batch():
        q = np.full((batch, QSEQ), PAD, np.int32)
        p_ = np.full((batch, SEQ), PAD, np.int32)
        n_ = np.full((batch, SEQ), PAD, np.int32)
        for i in range(batch):
            di = int(ok_docs[rng.integers(0, ok_docs.size)])
            cq = crop(di, 8, min(48, QSEQ))
            cp = crop(di, 32, SEQ)
            ni = int(neighbors[doc_row[di], rng.integers(0, neighbors.shape[1])])
            cn = crop(ni, 32, SEQ)
            q[i, : cq.size] = cq
            p_[i, : cp.size] = cp
            n_[i, : cn.size] = cn
        return q, p_, n_

    from collections import deque

    t0 = time.time()
    losses = deque(maxlen=50)
    for step in range(steps):
        q, p_, n_ = make_batch()
        params, opt_state, loss, aux = train_step(
            params, opt_state, jnp.asarray(q), jnp.asarray(p_), jnp.asarray(n_)
        )
        losses.append((loss, *aux))
        if (step + 1) % 100 == 0:
            tot, dn, tk = (
                float(np.mean([float(entry[j]) for entry in losses])) for j in range(3)
            )
            rate = (step + 1) / (time.time() - t0)
            print(
                f"maxsim step {step+1}/{steps} loss {tot:.3f}"
                f" (dense {dn:.3f} tok {tk:.3f}) ({rate:.1f} steps/s)",
                flush=True,
            )
        if (step + 1) % 500 == 0:
            save_npz_encoder(str(WORKDIR / "maxsim.npz"), params, CFG)
    save_npz_encoder(str(WORKDIR / "maxsim.npz"), params, CFG)
    tot = float(np.mean([float(entry[0]) for entry in losses]))
    print(f"maxsim done: final loss {tot:.3f}")


# --- Export -------------------------------------------------------------------


def run_export() -> None:
    import jax.numpy as jnp

    from raglite_tpu.models.transformer import load_npz_encoder, save_npz_encoder

    EXPORT.mkdir(parents=True, exist_ok=True)
    src = next(
        WORKDIR / name
        for name in ("maxsim.npz", "hardneg.npz", "contrastive.npz", "mlm.npz")
        if (WORKDIR / name).exists()
    )
    cfg, params, _ = load_npz_encoder(str(src), dtype=jnp.float16)
    save_npz_encoder(str(EXPORT / "encoder.npz"), params, cfg, dtype=np.float16)
    (EXPORT / "tokenizer.json").write_text((WORKDIR / "tokenizer.json").read_text())
    (EXPORT / "config.json").write_text(
        json.dumps({**cfg, "pad_token_id": PAD, "bos_token_id": BOS, "eos_token_id": EOS})
    )
    size = os.path.getsize(EXPORT / "encoder.npz") / 1e6
    print(f"exported {src.name} -> {EXPORT} ({size:.1f} MB)")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--phase", default="all",
                        choices=["tokenizer", "tokens", "mlm", "contrastive",
                                 "hardneg", "maxsim", "export", "all"])
    parser.add_argument("--size", default="base", choices=sorted(SIZES))
    parser.add_argument("--steps", type=int, default=0)
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--seq", type=int, default=0,
                        help="training sequence length (default 128; a final "
                             "MLM stage at 512 trains the full position table)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--lr", type=float, default=3e-5,
                        help="maxsim-phase peak learning rate")
    parser.add_argument("--dense-weight", type=float, default=1.0,
                        help="maxsim-phase dense-loss weight (tok loss = 1)")
    args = parser.parse_args()
    global CFG, WORKDIR, SEQ
    CFG = SIZES[args.size]
    WORKDIR = REPO / "data" / f"encoder_train_{args.size}"
    if args.seq:
        SEQ = min(args.seq, CFG["max_len"])
    if args.phase == "export":
        # Export is pure array juggling; pin to CPU so the weights do not
        # round-trip the dev tunnel's ~15 MB/s device link.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.phase in ("tokenizer", "all") and not (WORKDIR / "tokenizer.json").exists():
        train_tokenizer()
    if args.phase in ("tokens", "all") and not (WORKDIR / "tokens.npz").exists():
        build_token_cache()
    if args.phase in ("mlm", "all"):
        run_mlm(args.steps or 20000, args.batch or 256, args.resume)
    if args.phase in ("contrastive", "all"):
        run_contrastive(args.steps or 4000, args.batch or 512)
    if args.phase in ("hardneg", "all"):
        run_hardneg(args.steps or 2000, args.batch or 256)
    if args.phase in ("maxsim", "all"):
        run_maxsim(args.steps or 1200, args.batch or 64,
                   lr=args.lr, dense_weight=args.dense_weight)
    if args.phase in ("export", "all"):
        run_export()


if __name__ == "__main__":
    main()
