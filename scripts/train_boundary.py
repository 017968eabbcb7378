"""Train the tiny learned sentence-boundary model (models/boundary.py).

Reproducible: synthesizes the multilingual corpus (models/boundary_data.py,
train seeds disjoint from the eval seeds used in tests), trains the
windowed char-class MLP with optax Adam for a few epochs on CPU/TPU, and
writes ``raglite_tpu/models/data/boundary_model.npz`` (~50 KB, committed).

Run:  python scripts/train_boundary.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import optax

from raglite_tpu.models.boundary import (
    BoundaryModel,
    _DEFAULT_WEIGHTS,
    _apply,
    boundary_f1,
    char_class_ids,
    init_params,
    windows_for,
)
from raglite_tpu.models.boundary_data import make_corpus

TRAIN_SEED, EVAL_SEED = 1000, 2000  # tests evaluate on EVAL_SEED documents
NUM_TRAIN_DOCS = 800


def build_examples(corpus) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(windows [N, 2W+1], labels [N], weights [N]) — all gold positives,
    all punctuation-adjacent negatives (the hard ones), and a 5% sample of
    the rest."""
    rng = np.random.default_rng(0)
    xs, ys, ws = [], [], []
    punct = set(".!?;。！？…\n")
    for doc, gold in corpus:
        ids = char_class_ids(doc)
        wins = windows_for(ids)
        labels = np.zeros(len(doc), dtype=np.float32)
        labels[list(gold)] = 1.0
        near_punct = np.array([c in punct for c in doc], dtype=bool)
        keep = labels.astype(bool) | near_punct | (rng.random(len(doc)) < 0.05)
        xs.append(wins[keep])
        ys.append(labels[keep])
        # Up-weight positives: negatives dominate the sample.
        ws.append(np.where(labels[keep] > 0, 3.0, 1.0).astype(np.float32))
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(ws)


def main() -> None:
    corpus = make_corpus(num_documents=NUM_TRAIN_DOCS, seed=TRAIN_SEED)
    windows, labels, weights = build_examples(corpus)
    print(f"{len(corpus)} docs -> {len(labels)} examples "
          f"({int(labels.sum())} positives)")
    params = init_params(seed=0)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, wb):
        def loss_fn(p):
            probs = _apply(p, xb)
            eps = 1e-7
            bce = -(yb * jnp.log(probs + eps) + (1 - yb) * jnp.log(1 - probs + eps))
            return jnp.mean(wb * bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(1)
    batch = 1024
    t0 = time.perf_counter()
    for epoch in range(40):
        order = rng.permutation(len(labels))
        losses = []
        for start in range(0, len(order) - batch + 1, batch):
            sel = order[start : start + batch]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(windows[sel]),
                jnp.asarray(labels[sel]), jnp.asarray(weights[sel]),
            )
            losses.append(float(loss))
        if epoch % 8 == 0 or epoch == 39:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.perf_counter() - t0:.0f}s)")

    model = BoundaryModel(params)
    model.save(_DEFAULT_WEIGHTS)
    print(f"saved {_DEFAULT_WEIGHTS}")

    # Held-out report (the same protocol tests/PARITY.md use).
    from raglite_tpu.sentences import heuristic_sentence_boundaries

    eval_corpus = make_corpus(num_documents=60, seed=EVAL_SEED)
    for name, fn in (("heuristic", heuristic_sentence_boundaries), ("learned", model)):
        f1s = [boundary_f1(fn(doc), gold)[0] for doc, gold in eval_corpus]
        print(f"{name}: held-out boundary-F1 {np.mean(f1s):.4f}")


if __name__ == "__main__":
    main()
