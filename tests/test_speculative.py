"""Self-speculative decode: effort as the draft model.

The contract: generate_speculative emits EXACTLY the effort=1.0 greedy
continuation (every emitted token is a verifier argmax over full-effort
logits, and drafted KV rows are rewritten at full effort before any
future step attends to them).
"""

import numpy as np
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.generate import Engine


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test_model(max_seq_len=96)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=1)
    return Engine(w, cfg, impl="jnp", pad_to=8)


@pytest.mark.parametrize("draft_effort,k", [(0.5, 4), (0.25, 6), (1.0, 4)])
def test_spec_matches_full_greedy(engine, draft_effort, k):
    prompt = [1, 5, 9, 2, 7]
    n_new = 20
    ref = engine.generate(prompt, n_new=n_new, effort=1.0)
    spec = engine.generate_speculative(prompt, n_new=n_new,
                                       draft_effort=draft_effort, k=k)
    assert spec.token_ids == ref.token_ids
    assert spec.spec_tokens_per_iter >= 1.0
    if draft_effort == 1.0:
        # a perfect draft accepts everything: k tokens per round
        assert spec.spec_tokens_per_iter >= k - 1


def test_spec_acceptance_monotone_in_effort(engine):
    """Higher draft effort -> no fewer accepted tokens per round."""
    prompt = [1, 3, 8]
    lo = engine.generate_speculative(prompt, n_new=24, draft_effort=0.1,
                                     k=6)
    hi = engine.generate_speculative(prompt, n_new=24, draft_effort=1.0,
                                     k=6)
    assert hi.spec_tokens_per_iter >= lo.spec_tokens_per_iter - 1e-9


# ---- sampling (temperature / top-k / top-p) --------------------------


def test_temperature_zero_is_greedy(engine):
    a = engine.generate([1, 5, 9], n_new=8, effort=1.0)
    b = engine.generate([1, 5, 9], n_new=8, effort=1.0, temperature=0.0)
    assert a.token_ids == b.token_ids


def test_sampling_deterministic_per_seed(engine):
    a = engine.generate([1, 5, 9], n_new=8, temperature=0.8, seed=7)
    b = engine.generate([1, 5, 9], n_new=8, temperature=0.8, seed=7)
    c = engine.generate([1, 5, 9], n_new=8, temperature=0.8, seed=8)
    assert a.token_ids == b.token_ids
    assert len(c.token_ids) == 8


def test_top_k_one_is_greedy(engine):
    g = engine.generate([1, 5, 9], n_new=8)
    s = engine.generate([1, 5, 9], n_new=8, temperature=1.5, top_k=1,
                        seed=3)
    assert s.token_ids == g.token_ids


def test_top_p_tiny_is_greedy(engine):
    g = engine.generate([1, 5, 9], n_new=8)
    s = engine.generate([1, 5, 9], n_new=8, temperature=1.5, top_p=1e-9,
                        seed=3)
    assert s.token_ids == g.token_ids


def test_sampling_params_do_not_recompile(engine):
    """temperature/top_p are traced: one executable serves any value."""
    engine.generate([1, 5, 9], n_new=4, temperature=0.7, seed=1)
    n_fns = len(engine._fns)
    engine.generate([1, 5, 9], n_new=4, temperature=0.9, top_p=0.95,
                    seed=2)
    engine.generate([1, 5, 9], n_new=4, temperature=1.3, top_p=0.5,
                    seed=3)
    assert len(engine._fns) == n_fns


def test_spec_refuses_non_full_kv():
    from effort_tpu.config import tiny_test_model, BucketConfig
    from effort_tpu.models.transformer import init_random_weights
    cfg = tiny_test_model(max_seq_len=32, sliding_window=8)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    eng = Engine(w, cfg, impl="jnp", pad_to=8, ring_kv=True)
    import pytest as _pt
    with _pt.raises(AssertionError, match="full bf16 cache"):
        eng.generate_speculative([1, 5], n_new=4)


def test_prefill_engine_sampling():
    from effort_tpu.config import tiny_test_model, BucketConfig
    from effort_tpu.models.transformer import init_random_weights
    cfg = tiny_test_model(max_seq_len=96)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=1)
    eng = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                 prefill_impl="jnp")
    g = eng.generate([1, 5, 9], n_new=8)
    s1 = eng.generate([1, 5, 9], n_new=8, temperature=0.8, seed=4)
    s2 = eng.generate([1, 5, 9], n_new=8, temperature=0.8, seed=4)
    assert s1.token_ids == s2.token_ids
    assert len(s1.token_ids) == 8
    t1 = eng.generate([1, 5, 9], n_new=8, temperature=1.5, top_k=1)
    assert t1.token_ids == g.token_ids


def test_presence_penalty_blocks_repeats(engine):
    """A huge presence penalty makes greedy decode never repeat a token
    (until the vocab is exhausted) — the tiny random model otherwise
    loops within a few steps."""
    base = engine.generate([1, 5, 9], n_new=16)
    assert len(set(base.token_ids)) < 16      # it does loop unpenalized
    pen = engine.generate([1, 5, 9], n_new=16, presence_penalty=1e9)
    seen = set([1, 5, 9])
    for t in pen.token_ids:
        assert t not in seen, pen.token_ids
        seen.add(t)


def test_penalty_values_do_not_recompile(engine):
    engine.generate([1, 5, 9], n_new=4, presence_penalty=0.5)
    n = len(engine._fns)
    engine.generate([1, 5, 9], n_new=4, presence_penalty=0.7,
                    frequency_penalty=0.2)
    assert len(engine._fns) == n


def test_zero_penalty_is_plain_greedy(engine):
    a = engine.generate([1, 5, 9], n_new=8)
    b = engine.generate([1, 5, 9], n_new=8, presence_penalty=0.0,
                        frequency_penalty=0.0)
    assert a.token_ids == b.token_ids


def test_generate_logprobs(engine):
    r = engine.generate([1, 5, 9], n_new=6, logprobs=3)
    assert r.logprobs is not None and len(r.logprobs) == 6
    for tok, lp in zip(r.token_ids, r.logprobs):
        assert len(lp) == 3
        assert all(v <= 0.0 for v in lp.values())
        # greedy: the emitted token is the top-1 entry
        assert tok == max(lp, key=lp.get)
    # without the flag, no logprobs and no extra compile key reuse issue
    r2 = engine.generate([1, 5, 9], n_new=6)
    assert r2.logprobs is None
    assert r2.token_ids == r.token_ids
