"""Quality/perf evaluation harness.

Re-creates the reference's three benchmark families
(benchmarks/benchmark.swift):
  - matrix_quality_sweep  <- goBucketPerformance / goQuickBucketPerformance
    (:159-260): cos-sim of bucketMul vs the dense product on one weight
    matrix across the effort scale.
  - agreement_sweep       <- goBenchmarkSimilarity (:128-156): generate a
    text at effort=1, re-feed it, and measure per-position argmax agreement
    at lower efforts.
  - run_quiz              <- goQuiz (:52-124): multiple-choice QA via the
    limit-logits mechanism, scored across the effort scale.
"""

from __future__ import annotations

import json
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def effort_scale() -> List[float]:
    """Effort grid: coarse on top, fine through the interesting low range
    (the shape of makeScale, benchmark.swift:34-45)."""
    top = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4, 0.35]
    fine = [x / 100 for x in range(30, 1, -2)]
    return top + fine


def cossim(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    n = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / n) if n else 0.0


def matrix_quality_sweep(bm, v, efforts: Optional[Sequence[float]] = None,
                         expert: int = 0, impl: str = "jnp",
                         wt_dense=None) -> Dict[float, float]:
    """cos-sim of bucketMul vs dense per effort on one matrix."""
    from effort_tpu.ops.bucketmul import bucket_matvec, dense_matvec
    efforts = list(efforts or effort_scale())
    if wt_dense is None:
        wt_dense = bm.reconstruct_dense(expert)
    y_ref = np.asarray(jnp.asarray(v) @ jnp.asarray(wt_dense))
    out = {}
    for e in efforts:
        y = bucket_matvec(bm, jnp.asarray(v), e, expert=expert, impl=impl)
        out[e] = cossim(y, y_ref)
    return out


def agreement_sweep(engine, prompt_ids: Sequence[int], n_tokens: int = 100,
                    efforts: Optional[Sequence[float]] = None
                    ) -> Dict[float, float]:
    """% of positions where low-effort argmax == full-effort argmax over a
    full-effort-generated continuation."""
    efforts = list(efforts or effort_scale())
    gen = engine.generate(list(prompt_ids), n_new=n_tokens, effort=1.0)
    text_ids = list(prompt_ids) + gen.token_ids
    _, control = engine.prompt_logits(text_ids, effort=1.0)
    out = {}
    for e in efforts:
        _, preds = engine.prompt_logits(text_ids, effort=e)
        hits = sum(int(a == b) for a, b in zip(preds, control))
        out[e] = hits / max(1, len(control))
    return out


def log_softmax(logits: np.ndarray) -> np.ndarray:
    x = np.asarray(logits, np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def kl_divergence_sweep(engine, prompt_ids: Sequence[int],
                        efforts: Optional[Sequence[float]] = None
                        ) -> Dict[float, float]:
    """Mean per-position KL(P_full || P_effort) in nats over a text.

    The distribution-level quality metric the reference quotes in prose
    but ships no harness for ("KL divergence tests... okay-ish",
    docs/pesky.html): argmax agreement (agreement_sweep) only sees the
    top token; KL sees the whole next-token distribution, so it
    separates "picked another good token" from "distribution fell
    apart", and it is the standard scale for comparing effort against
    quantization at equal speedup."""
    efforts = list(efforts or effort_scale())
    ref_lp = log_softmax(engine.position_logits(prompt_ids, effort=1.0))
    ref_p = np.exp(ref_lp)
    out = {}
    for e in efforts:
        lp = log_softmax(engine.position_logits(prompt_ids, effort=e))
        out[e] = float((ref_p * (ref_lp - lp)).sum(axis=-1).mean())
    return out


def nll_sweep(engine, token_ids: Sequence[int],
              efforts: Optional[Sequence[float]] = None
              ) -> Dict[float, float]:
    """Mean teacher-forced negative log-likelihood (nats/token) of a
    text per effort; exp() of a value is the perplexity. Uses
    Engine.score — the held-out-text scale on which effort can be
    compared against quantization directly."""
    efforts = list(efforts or effort_scale())
    return {e: float(-np.mean(engine.score(token_ids, effort=e)))
            for e in efforts}


def run_quiz(engine, quiz: List[dict], tokenizer,
             efforts: Optional[Sequence[float]] = None,
             shuffle_seed: int = 0, progress=None) -> Dict[float, float]:
    """Multiple-choice accuracy per effort.

    quiz items: {"question": str, "answers": [str, ...], "correct": int}.
    Answers are shuffled per item (the reference shuffles answer order,
    benchmark.swift:58-66) and asked as numbered options; the model's pick
    is the best next token among "1"..."N" via limit-logits.
    """
    efforts = list(efforts or effort_scale())
    rng = random.Random(shuffle_seed)
    scores = {e: 0 for e in efforts}
    for qi, item in enumerate(quiz):
        order = list(range(len(item["answers"])))
        rng.shuffle(order)
        correct_slot = order.index(item["correct"])
        opts = "\n".join(f"{i+1}. {item['answers'][j]}"
                         for i, j in enumerate(order))
        prompt = (f"[INST]{item['question']}\n{opts}\n"
                  f"Answer with a single number.[/INST] ")
        ids = tokenizer.encode(prompt)
        allowed = [tokenizer.encode(str(i + 1), bos=False)[-1]
                   for i in range(len(order))]
        for e in efforts:
            pick = engine.answer_limited(ids, allowed, effort=e)
            if pick == correct_slot:
                scores[e] += 1
        if progress:
            progress(qi + 1, len(quiz))
    return {e: s / len(quiz) for e, s in scores.items()}


def load_quiz(path: str) -> List[dict]:
    with open(path) as f:
        return json.load(f)
