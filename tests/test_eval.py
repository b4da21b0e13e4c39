"""Eval harness tests on the tiny model (CPU)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.generate import Engine
from effort_tpu.eval.harness import (matrix_quality_sweep, agreement_sweep,
                                     run_quiz, effort_scale, load_quiz,
                                     kl_divergence_sweep, log_softmax)

QUIZ = os.path.join(os.path.dirname(__file__), "..", "effort_tpu", "eval",
                    "data", "quiz.json")


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            keep_dense=True)
    return Engine(w, cfg, impl="jnp", pad_to=8)


def test_effort_scale_shape():
    s = effort_scale()
    assert s[0] == 1.0 and min(s) <= 0.03
    assert all(a > b for a, b in zip(s, s[1:]))


def test_matrix_quality_sweep(engine, rng):
    from effort_tpu.ops.bucketize import bucketize
    wt = (rng.standard_normal((64, 256)) * 0.02).astype(np.float32)
    bm = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=8))
    out = matrix_quality_sweep(bm, jnp.asarray(rng.standard_normal(
        64).astype(np.float32)), efforts=[1.0, 0.5, 0.2], wt_dense=wt)
    assert out[1.0] > 0.999
    assert out[1.0] >= out[0.2] - 1e-6


def test_agreement_sweep(engine):
    out = agreement_sweep(engine, [1, 5, 9], n_tokens=4,
                          efforts=[1.0, 0.4])
    assert out[1.0] == 1.0          # control agrees with itself
    assert 0.0 <= out[0.4] <= 1.0


def test_quiz_data_wellformed():
    for fn in ("quiz.json", "basic.json"):
        quiz = load_quiz(os.path.join(os.path.dirname(QUIZ), fn))
        assert len(quiz) >= 30
        for item in quiz:
            assert 0 <= item["correct"] < len(item["answers"])


def test_log_softmax_normalizes(rng):
    lp = log_softmax(rng.standard_normal((5, 32)) * 3)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-12)


def test_kl_divergence_sweep(engine):
    out = kl_divergence_sweep(engine, [1, 5, 9, 2, 7],
                              efforts=[1.0, 0.5, 0.2])
    assert abs(out[1.0]) < 1e-9          # identical distributions
    assert out[0.5] >= -1e-12 and out[0.2] >= -1e-12
    assert out[0.2] >= out[0.5] - 1e-9   # lower effort, larger KL


def test_position_logits_matches_prompt_logits(engine):
    ids = [1, 5, 9, 2]
    pl = engine.position_logits(ids, effort=0.6)
    last, preds = engine.prompt_logits(ids, effort=0.6)
    assert pl.shape == (len(ids), engine.cfg.vocab_size)
    np.testing.assert_allclose(pl[-1], last, rtol=1e-5, atol=1e-5)
    assert [int(np.argmax(row)) for row in pl] == preds


class _FakeTok:
    """Maps text to stable pseudo-ids (tiny model has no real tokenizer)."""
    def encode(self, text, bos=True):
        ids = [1] if bos else []
        ids += [17 + (hash(w) % 400) for w in text.split()][:12]
        return ids or [3]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_run_quiz_mechanism(engine):
    quiz = load_quiz(QUIZ)[:3]
    scores = run_quiz(engine, quiz, _FakeTok(), efforts=[1.0, 0.3])
    assert set(scores) == {1.0, 0.3}
    assert all(0.0 <= v <= 1.0 for v in scores.values())


def test_engine_score_logprobs(engine):
    ids = [1, 5, 9, 2, 7]
    lp = engine.score(ids, effort=1.0)
    assert lp.shape == (len(ids) - 1,)
    assert np.all(lp <= 0.0)
    # consistency: score picks from the same distributions position_logits
    # exposes
    pl = engine.position_logits(ids, effort=1.0)
    from effort_tpu.eval.harness import log_softmax
    want = log_softmax(pl[:-1])[np.arange(len(ids) - 1), ids[1:]]
    # score computes its logsumexp in chunked float32 (memory)
    np.testing.assert_allclose(lp, want, rtol=1e-5, atol=1e-5)
    # greedy text scores itself higher at full effort than at 4% effort
    # in NLL terms on average is NOT guaranteed on random weights, so no
    # cross-effort assertion here — kl_divergence_sweep covers that axis.


def test_nll_sweep(engine):
    from effort_tpu.eval.harness import nll_sweep
    out = nll_sweep(engine, [1, 5, 9, 2, 7], efforts=[1.0, 0.3])
    assert set(out) == {1.0, 0.3}
    assert all(v > 0 for v in out.values())   # NLL in nats


def test_tf_agreement_sweep(engine):
    """Teacher-forced real-text protocol (round 4): agreement at full
    effort is 1.0 by construction; values bounded; efforts keyed."""
    from effort_tpu.eval.harness import tf_agreement_sweep
    ids = [1, 5, 9, 2, 7, 3, 8, 4, 6, 2, 5, 1]
    out = tf_agreement_sweep(engine, ids, efforts=[1.0, 0.4])
    assert out[1.0] == 1.0
    assert 0.0 <= out[0.4] <= 1.0


def test_streamed_fraction_bounds(engine):
    """Kernel-prologue coverage replica: fractions in (0, 1]; higher
    effort never streams less; w2 keys present on unfused layouts."""
    from effort_tpu.eval.harness import streamed_fraction
    out = streamed_fraction(engine.w, engine.cfg, list(range(1, 13)),
                            efforts=(0.5, 0.25), n_probe_tokens=3)
    for tag in (50, 25):
        f = out[f"streamed_chunk_frac_{tag}"]
        assert 0.0 < f <= 1.0, (tag, f)
        assert 0.0 <= out[f"selected_row_frac_{tag}"] <= 1.0
        assert 0.0 < out[f"w2_streamed_chunk_frac_{tag}"] <= 1.0
    assert (out["selected_row_frac_50"]
            >= out["selected_row_frac_25"] - 1e-6)


def test_decode_speed_sweep_structure(engine):
    """Timing numbers are garbage on CPU; the structure and the
    dense/effort code paths must still work end to end."""
    from effort_tpu.eval.harness import decode_speed_sweep
    out = decode_speed_sweep(engine.w, engine.cfg, efforts=(1.0, 0.5),
                             impl="jnp", n_lo=2, n_hi=4)
    assert "dense_toks_per_s" in out
    for tag in (100, 50):
        assert f"toks_per_s_{tag}" in out
        assert f"speedup_vs_dense_{tag}" in out


def test_limited_quiz_sweep_counts():
    """limit-logits quiz harness: a stub engine that knows the answers
    at high effort and guesses slot 0 at low effort."""
    from effort_tpu.eval.harness import limited_quiz_sweep

    class Stub:
        def answer_limited(self, prompt_ids, allowed_ids, effort=1.0):
            return prompt_ids[0] if effort >= 0.5 else 0

    items = [{"prompt_ids": [i % 3], "allowed_ids": [10, 11, 12],
              "correct": i % 3} for i in range(9)]
    acc = limited_quiz_sweep(Stub(), items, efforts=[1.0, 0.1])
    assert acc[1.0] == 1.0
    assert abs(acc[0.1] - 3 / 9) < 1e-9


def test_build_fact_quiz_items_single_token_answers():
    from scripts.trained_quiz import build_fact_quiz, quiz_items
    from effort_tpu.runtime.word_tokenizer import N_BYTE, WordTokenizer

    words = ([f" word{chr(97+i)}" for i in range(26)]
             + ["the", " the", " of", " is", "plain"])
    facts = build_fact_quiz(words, n_facts=8, seed=1)
    tok = WordTokenizer(words)
    for f in facts:
        assert f["val"].startswith(" ")
        assert tok.encode(f["val"]) == [f["val_id"]], f
    items = quiz_items(facts, tok)
    for it, f in zip(items, facts):
        assert len(it["allowed_ids"]) == 4
        assert it["allowed_ids"][it["correct"]] == f["val_id"]
        # prompt must not leak the answer id
        assert f["val_id"] not in it["prompt_ids"]
