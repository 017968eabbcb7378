"""Eval generation, answering, and quality evaluation.

Counterpart of /root/reference/src/raglite/_eval.py:26-303.  Eval
generation/judging/answering use the first-party LLM protocol; `evaluate`
computes Ragas-style metrics with a first-party implementation built on the
framework's own embedder (the reference bridges to the optional ``ragas``
package, _eval.py:232-303) — so quality evaluation runs fully offline.
"""

from __future__ import annotations

import contextlib
import re
from concurrent.futures import ThreadPoolExecutor, as_completed
from random import randint
from typing import ClassVar

import numpy as np
import pandas as pd
from pydantic import BaseModel, ConfigDict, Field, field_validator
from tqdm.auto import tqdm

from raglite_tpu.config import RAGLiteConfig
from raglite_tpu.documents import Eval
from raglite_tpu.embed import embed_queries
from raglite_tpu.extract import extract_with_llm
from raglite_tpu.rag import add_context, rag, retrieve_context
from raglite_tpu.search import retrieve_chunk_spans, vector_search
from raglite_tpu.store import store_from_config

__all__ = [
    "generate_eval",
    "insert_evals",
    "answer_evals",
    "evaluate",
    "answer_faithfulness",
    "context_precision",
    "answer_relevancy",
    "context_recall",
]


class QuestionResponse(BaseModel):
    """A specific question about the content of a set of document contexts."""

    model_config = ConfigDict(extra="forbid")
    question: str = Field(
        ..., description="A specific question about the content of a set of document contexts."
    )
    system_prompt: ClassVar[str] = """
You are given a set of contexts extracted from a document.
You are a subject matter expert on the document's topic.
Your task is to generate a question to quiz other subject matter experts on the information in the provided context.
The question MUST be specific, self-contained, answerable using ONLY the provided context, and MUST NOT reference the existence of the context.
""".strip()

    @field_validator("question")
    @classmethod
    def validate_question(cls, value: str) -> str:
        """Reject generic/context-referential questions
        (reference: _eval.py:51-60)."""
        question = value.strip().lower()
        if "context" in question or "document" in question or "question" in question:
            raise ValueError(value)
        if not question.endswith("?"):
            raise ValueError(value)
        return value


def generate_eval(*, max_chunks: int = 20, config: RAGLiteConfig | None = None) -> Eval:
    """Generate one eval: seed chunk -> related contexts -> LLM question ->
    LLM-judged relevant chunks -> LLM ground-truth answer
    (reference: _eval.py:26-165)."""
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    alive = store.alive_chunk_ids()
    if not alive:
        msg = "First run `insert_documents()` before generating evals."
        raise ValueError(msg)
    # Random seed chunk (never a tombstoned one), expanded via vector search
    # on its mean embedding.
    seed_chunk_id = alive[randint(0, len(alive) - 1)]  # noqa: S311
    seed_matrix = store.embeddings[seed_chunk_id].astype(np.float32)
    related_chunk_ids, _ = vector_search(
        np.mean(seed_matrix, axis=0),
        num_results=randint(1, max_chunks),  # noqa: S311
        config=config,
    )
    related_contexts = [
        str(span) if isinstance(span, str) else span.content
        for span in retrieve_chunk_spans(related_chunk_ids, config=config)
    ]
    question = extract_with_llm(
        QuestionResponse, related_contexts, strict=True, config=config
    ).question
    # Candidate chunks for the question, judged for relevance by the LLM.
    candidate_chunk_ids, _ = vector_search(question, num_results=2 * max_chunks, config=config)
    candidate_chunks = [store.get_chunk(cid) for cid in candidate_chunk_ids]

    class ContextEvalResponse(BaseModel):
        """Indicate whether the provided context can be used to answer a given question."""

        model_config = ConfigDict(extra="forbid")
        hit: bool = Field(
            ...,
            description="True if the provided context contains (a part of) the answer to the given question, false otherwise.",
        )
        system_prompt: ClassVar[str] = (
            "You are given a context extracted from a document. Determine whether it contains "
            f'(a part of) the answer to this question: "{question}"'
        )

    candidates = [c for c in candidate_chunks if c is not None]
    candidate_strs = [str(c) for c in candidates]
    # Judge ALL candidates in one batched decode when the LLM supports it
    # (one prefill + one forward per step for the whole panel — the
    # reference fans out one llama.cpp call per chunk); failures fall back
    # to the per-chunk retry loop, and unjudgeable chunks count as misses.
    from raglite_tpu.extract import _extract_batch_first_pass

    try:
        first_pass = _extract_batch_first_pass(
            ContextEvalResponse, candidate_strs, True, config
        )
    except Exception:  # noqa: BLE001 - e.g. a [B, T] cache/prefill OOM
        first_pass = None  # degrade to the per-chunk loop below
    relevant_chunks = []
    for i, candidate in enumerate(
        tqdm(candidates, desc="Evaluating chunks", unit="chunk", dynamic_ncols=True, leave=False)
    ):
        verdict = first_pass[i] if first_pass is not None else None
        if verdict is None:
            with contextlib.suppress(ValueError):
                verdict = extract_with_llm(
                    ContextEvalResponse, candidate_strs[i], strict=True, config=config
                )
        if verdict is not None and verdict.hit:
            relevant_chunks.append(candidate)
    if not relevant_chunks:
        msg = "No relevant chunks found to answer the question."
        raise ValueError(msg)

    class AnswerResponse(BaseModel):
        """Answer a question using the provided context."""

        model_config = ConfigDict(extra="forbid")
        answer: str = Field(
            ..., description="A complete answer to the given question using the provided context."
        )
        system_prompt: ClassVar[str] = (
            "You are given a set of contexts extracted from a document. Generate a complete, "
            f'self-contained answer to the following question using them: "{question}"'
        )

    answer = extract_with_llm(
        AnswerResponse, [str(c) for c in relevant_chunks], strict=True, config=config
    ).answer
    return Eval.from_chunks(question=question, contexts=relevant_chunks, ground_truth=answer)


def insert_evals(
    *, num_evals: int = 100, max_chunks_per_eval: int = 20, config: RAGLiteConfig | None = None
) -> None:
    """Generate and store evals; individual failures are suppressed
    (reference: _eval.py:168-192)."""
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    evals: list[Eval] = []
    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = [
            pool.submit(generate_eval, max_chunks=max_chunks_per_eval, config=config)
            for _ in range(num_evals)
        ]
        for future in tqdm(
            as_completed(futures), total=num_evals, desc="Generating evals",
            unit="eval", dynamic_ncols=True, leave=False,
        ):
            with contextlib.suppress(Exception):
                evals.append(future.result())
    with store.write_lock():
        store.add_evals(evals)
        store.save()


def answer_evals(
    num_evals: int = 100, *, config: RAGLiteConfig | None = None
) -> pd.DataFrame:
    """Answer stored evals with RAG; returns a DataFrame of
    question/answer/contexts/ground_truth (reference: _eval.py:195-229)."""
    config = config or RAGLiteConfig()
    store = store_from_config(config)
    evals = sorted(store.evals.values(), key=lambda e: e.id)[:num_evals]
    answers: list[str] = []
    contexts: list[list[str]] = []
    for eval_ in tqdm(evals, desc="Answering evals", unit="eval", dynamic_ncols=True, leave=False):
        spans = retrieve_context(query=eval_.question, config=config)
        messages = [add_context(user_prompt=eval_.question, context=spans, config=config)]
        answer = "".join(rag(messages, config=config))
        answers.append(answer)
        contexts.append([span.content for span in spans])
    return pd.DataFrame(
        {
            "question": [e.question for e in evals],
            "answer": answers,
            "contexts": contexts,
            "ground_truth": [e.ground_truth for e in evals],
        }
    )


def _similarity(a: list[str], b: list[str], config: RAGLiteConfig) -> np.ndarray:
    """Pairwise cosine similarity between two string lists via the
    framework's embedder (one batched device call)."""
    emb = embed_queries([*a, *b], config=config).astype(np.float32)
    ea, eb = emb[: len(a)], emb[len(a) :]
    return np.sum(ea * eb, axis=1)


# --- LLM-judged metrics (Ragas-fidelity faithfulness / context precision) ----

#: Per-judgment context budget (chars); keeps judge prompts inside small
#: local-model windows the way Ragas relies on the provider's own limits.
_JUDGE_CONTEXT_CHARS = 6000
_SENTENCE_RE = re.compile(r"[^.!?\n]+[.!?]?")


def _judge_bool_batch(
    prompt_pairs: list[tuple[str, str]], field: str, config: RAGLiteConfig
) -> list[bool | None]:
    """One boolean verdict per (system_prompt, user_text) pair.

    All verdicts share ONE schema but need DIFFERENT system prompts (each
    embeds the claim/question under judgment), so this batches through
    ``llm.complete_batch`` directly — one batched decode for the whole panel
    — with a per-item fallback; unjudgeable items return None.  The
    reference reaches the same metrics through Ragas's LLM bridge
    (/root/reference/src/raglite/_eval.py:232-303)."""
    import json

    from raglite_tpu.models.llm import llm_from_config

    llm = llm_from_config(config)
    schema = {
        "type": "object",
        "properties": {field: {"type": "boolean"}},
        "required": [field],
        "additionalProperties": False,
    }
    response_format = (
        {"type": "json_schema", "json_schema": {"name": "Verdict", "schema": schema, "strict": True}}
        if llm.supports_response_format
        else None
    )
    schema_suffix = (
        "" if response_format is not None
        else f"\n\nFormat your response according to this JSON schema:\n{schema}"
    )
    messages = [
        [
            {"role": "system", "content": system + schema_suffix},
            {"role": "user", "content": user},
        ]
        for system, user in prompt_pairs
    ]
    responses: list | None = None
    if hasattr(llm, "complete_batch"):
        try:
            responses = list(llm.complete_batch(messages, response_format=response_format))
        except Exception:  # noqa: BLE001 — e.g. batched prefill OOM
            responses = None
    verdicts: list[bool | None] = []
    for i, msg in enumerate(messages):
        response = responses[i] if responses is not None else None
        if response is None:
            try:
                response = llm.complete(msg, response_format=response_format)
            except Exception:  # noqa: BLE001
                response = None
        verdict: bool | None = None
        if response is not None and response.content:
            with contextlib.suppress(ValueError, TypeError, AttributeError):
                parsed = json.loads(response.content)
                if isinstance(parsed.get(field), bool):
                    verdict = parsed[field]
        verdicts.append(verdict)
    return verdicts


def _decompose_claims(question: str, answer: str, config: RAGLiteConfig) -> list[str]:
    """Split an answer into standalone factual claims: LLM decomposition
    (Ragas's statement generation) with a deterministic sentence-split
    fallback for providers without reliable list output."""

    class ClaimsResponse(BaseModel):
        """Standalone factual claims made by an answer."""

        model_config = ConfigDict(extra="forbid")
        claims: list[str] = Field(
            ..., description="Short standalone factual claims made by the answer, one per item."
        )
        system_prompt: ClassVar[str] = (
            f'You are given the answer to the question "{question}". Decompose the answer '
            "into short standalone factual claims, each fully understandable on its own. "
            "Include every claim the answer makes and nothing it does not state."
        )

    claims: list[str] = []
    with contextlib.suppress(ValueError):
        claims = extract_with_llm(ClaimsResponse, answer, strict=True, config=config).claims
    claims = [c.strip() for c in claims if c and c.strip()]
    if not claims:
        claims = [m.group(0).strip() for m in _SENTENCE_RE.finditer(answer) if m.group(0).strip()]
    return claims[:16]


def answer_faithfulness(df: pd.DataFrame, config: RAGLiteConfig | None = None) -> np.ndarray:
    """LLM-judged faithfulness: fraction of the answer's claims directly
    supported by the retrieved contexts (Ragas semantics — the reference
    gets this metric from ragas_evaluate, _eval.py:299-303).  NaN where no
    claim could be judged."""
    config = config or RAGLiteConfig()
    pairs: list[tuple[str, str]] = []
    owners: list[int] = []
    for i, (question, answer, contexts) in enumerate(
        zip(df["question"], df["answer"], df["contexts"])
    ):
        context_block = "\n\n".join(contexts)[:_JUDGE_CONTEXT_CHARS]
        if not context_block.strip():
            continue
        for claim in _decompose_claims(question, str(answer), config):
            system = (
                "You are given context passages extracted from documents. Determine "
                f'whether this claim is directly supported by them: "{claim}"'
            )
            pairs.append((system, context_block))
            owners.append(i)
    verdicts = _judge_bool_batch(pairs, "supported", config)
    supported = np.zeros(len(df))
    total = np.zeros(len(df))
    for owner, verdict in zip(owners, verdicts):
        if verdict is not None:
            total[owner] += 1
            supported[owner] += bool(verdict)
    with np.errstate(invalid="ignore"):
        return np.where(total > 0, supported / np.maximum(total, 1), np.nan)


def context_precision(df: pd.DataFrame, config: RAGLiteConfig | None = None) -> np.ndarray:
    """LLM-judged context precision: rank-weighted usefulness of each
    retrieved context — sum_k(precision@k * v_k) / sum_k(v_k) over the
    judged verdicts v_k in retrieval order (Ragas's formula).  NaN where no
    context could be judged."""
    config = config or RAGLiteConfig()
    pairs: list[tuple[str, str]] = []
    owners: list[int] = []
    for i, (question, ground_truth, contexts) in enumerate(
        zip(df["question"], df["ground_truth"], df["contexts"])
    ):
        system = (
            "You are given ONE retrieved context passage. Determine whether it contains "
            f'information useful for answering this question: "{question}" '
            f"(reference answer: {str(ground_truth)[:800]})"
        )
        for context in contexts:
            pairs.append((system, str(context)[:_JUDGE_CONTEXT_CHARS]))
            owners.append(i)
    verdicts = _judge_bool_batch(pairs, "useful", config)
    per_eval: dict[int, list[bool]] = {}
    for owner, verdict in zip(owners, verdicts):
        if verdict is not None:
            per_eval.setdefault(owner, []).append(bool(verdict))
    out = np.full(len(df), np.nan)
    for i, ordered in per_eval.items():
        hits, score = 0, 0.0
        for k, useful in enumerate(ordered, start=1):
            if useful:
                hits += 1
                score += hits / k
        out[i] = score / hits if hits else 0.0
    return out


def answer_relevancy(df: pd.DataFrame, config: RAGLiteConfig | None = None) -> np.ndarray:
    """LLM-bridged answer relevancy: mean cosine similarity between the
    original question and questions the LLM generates FROM the answer
    (Ragas's answer_relevancy formula — the reference gets it from
    ragas_evaluate, /root/reference/src/raglite/_eval.py:232-303).

    An evasive/noncommittal answer yields no reverse questions; the
    deterministic fallback then scores cosine(question, answer) directly, so
    the metric stays defined for every row (Ragas instead multiplies by a
    judged noncommittal flag).
    """
    config = config or RAGLiteConfig()

    class ReverseQuestions(BaseModel):
        """Questions that a given answer directly and completely answers."""

        model_config = ConfigDict(extra="forbid")
        questions: list[str] = Field(
            ...,
            description=(
                "Up to 3 distinct questions the given answer directly and completely "
                "answers. Empty if the answer is evasive, vague, or declines to answer."
            ),
        )
        system_prompt: ClassVar[str] = (
            "You are given an answer. Generate up to 3 distinct questions that this "
            "answer directly and completely answers. If the answer is evasive, vague, "
            "or declines to answer, return an empty list."
        )

    reverse: list[list[str]] = []
    for answer in df["answer"]:
        questions: list[str] = []
        with contextlib.suppress(ValueError):
            questions = extract_with_llm(
                ReverseQuestions, str(answer), strict=True, config=config
            ).questions
        reverse.append([q.strip() for q in questions if q and q.strip()][:3])
    # ONE batched embed: every original question + every generated question +
    # every fallback answer.
    from raglite_tpu.embed import embed_queries

    questions = [str(q) for q in df["question"]]
    fallbacks = [str(a) for a in df["answer"]]
    flat = [q for qs in reverse for q in qs]
    emb = embed_queries([*questions, *fallbacks, *flat], config=config).astype(np.float32)
    q_emb = emb[: len(questions)]
    a_emb = emb[len(questions) : 2 * len(questions)]
    r_emb = emb[2 * len(questions) :]
    out = np.zeros(len(df))
    offset = 0
    for i, qs in enumerate(reverse):
        if qs:
            block = r_emb[offset : offset + len(qs)]
            offset += len(qs)
            out[i] = float(np.mean(block @ q_emb[i]))
        else:
            out[i] = float(a_emb[i] @ q_emb[i])
    return out


def context_recall(df: pd.DataFrame, config: RAGLiteConfig | None = None) -> np.ndarray:
    """LLM-judged context recall: fraction of the ground-truth answer's
    claims attributable to the retrieved contexts (Ragas semantics —
    reference: _eval.py:232-303).  NaN where no claim could be judged."""
    config = config or RAGLiteConfig()
    pairs: list[tuple[str, str]] = []
    owners: list[int] = []
    for i, (question, ground_truth, contexts) in enumerate(
        zip(df["question"], df["ground_truth"], df["contexts"])
    ):
        context_block = "\n\n".join(contexts)[:_JUDGE_CONTEXT_CHARS]
        if not context_block.strip():
            continue
        for claim in _decompose_claims(question, str(ground_truth), config):
            system = (
                "You are given context passages retrieved from documents. Determine "
                f'whether this claim can be attributed to them: "{claim}"'
            )
            pairs.append((system, context_block))
            owners.append(i)
    verdicts = _judge_bool_batch(pairs, "attributed", config)
    attributed = np.zeros(len(df))
    total = np.zeros(len(df))
    for owner, verdict in zip(owners, verdicts):
        if verdict is not None:
            total[owner] += 1
            attributed[owner] += bool(verdict)
    with np.errstate(invalid="ignore"):
        return np.where(total > 0, attributed / np.maximum(total, 1), np.nan)


def evaluate(
    answered_evals: pd.DataFrame | int = 100,
    config: RAGLiteConfig | None = None,
    *,
    judge: bool = True,
) -> pd.DataFrame:
    """Compute Ragas-fidelity quality metrics (reference bridges to the
    ragas package, _eval.py:232-303):

    - faithfulness: LLM-judged fraction of the answer's claims supported by
      the contexts (per-claim verdicts via one batched decode)
    - context_precision: LLM-judged rank-weighted context usefulness
      (Ragas's sum(precision@k * v_k) / sum(v_k))
    - answer_relevancy: mean cosine(question, LLM-generated questions from
      the answer) — Ragas's formula (cosine(question, answer) fallback when
      the answer yields no reverse questions)
    - context_recall: LLM-judged fraction of the ground-truth answer's
      claims attributable to the retrieved contexts

    — the full default Ragas quartet the reference computes
    (_eval.py:232-303) — plus cheap embedding-based companions:

    - answer_similarity: cosine(answer, ground_truth)
    - context_relevancy: mean cosine(question, context)
    - faithfulness_proxy: cosine(answer, concatenated contexts) — topical
      agreement only; the judged ``faithfulness`` column is the real metric

    ``judge=False`` skips the LLM-judged columns (embedding-only, no LLM
    calls — useful for quick smoke evaluations).
    """
    config = config or RAGLiteConfig()
    df = (
        answered_evals
        if isinstance(answered_evals, pd.DataFrame)
        else answer_evals(answered_evals, config=config)
    )
    if df.empty:
        return pd.DataFrame(
            columns=[
                "question", "answer_similarity", "context_relevancy",
                "faithfulness_proxy", "faithfulness", "context_precision",
                "answer_relevancy", "context_recall",
            ]
        )
    answer_similarity = _similarity(list(df["answer"]), list(df["ground_truth"]), config)
    # Context relevancy: ONE batched embed of every question and every
    # context (each question encoded once), instead of one device dispatch
    # per eval with the question re-encoded per context.
    from raglite_tpu.embed import embed_queries

    questions = list(df["question"])
    contexts_per_eval = [list(ctx) or [""] for ctx in df["contexts"]]
    flat_contexts = [c for ctx in contexts_per_eval for c in ctx]
    emb = embed_queries([*questions, *flat_contexts], config=config).astype(np.float32)
    q_emb = emb[: len(questions)]
    c_emb = emb[len(questions) :]
    context_relevancy = np.zeros(len(questions))
    offset = 0
    for i, ctx in enumerate(contexts_per_eval):
        block = c_emb[offset : offset + len(ctx)]
        offset += len(ctx)
        context_relevancy[i] = float(np.mean(block @ q_emb[i]))
    faithfulness_cosine = _similarity(
        list(df["answer"]), ["\n".join(ctx) for ctx in df["contexts"]], config
    )
    out = {
        "question": df["question"],
        "answer_similarity": answer_similarity,
        "context_relevancy": context_relevancy,
        "faithfulness_proxy": faithfulness_cosine,
    }
    if judge:
        out["faithfulness"] = answer_faithfulness(df, config)
        out["context_precision"] = context_precision(df, config)
        out["answer_relevancy"] = answer_relevancy(df, config)
        out["context_recall"] = context_recall(df, config)
    return pd.DataFrame(out)
