"""Batched prefill (forward_seq / left-padded Engine path) vs the
token-at-a-time reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.generate import Engine
from effort_tpu.models.transformer import (forward_seq, forward_token,
                                           init_random_weights,
                                           make_kv_cache)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=0)
    return cfg, w


def test_forward_seq_matches_token_loop(model):
    cfg, w = model
    T = 6
    ids = jnp.asarray([3, 1, 4, 1, 5, 9], jnp.int32)

    kc, vc = make_kv_cache(cfg)
    logits_seq, kc_s, vc_s = forward_seq(w, cfg, ids, kc, vc,
                                         effort=1.0, impl="jnp")

    kc, vc = make_kv_cache(cfg)
    logits_tok = []
    for t in range(T):
        lg, kc, vc = forward_token(w, cfg, ids[t], jnp.asarray(t), kc, vc,
                                   effort=1.0, impl="jnp")
        logits_tok.append(lg)
    logits_tok = jnp.stack(logits_tok)

    np.testing.assert_allclose(np.asarray(logits_seq),
                               np.asarray(logits_tok), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kc_s[:, :T]),
                               np.asarray(kc[:, :T]), rtol=2e-2, atol=2e-3)


def test_forward_seq_low_effort_matches(model):
    """Per-token effort selection is preserved under the batched pass."""
    cfg, w = model
    ids = jnp.asarray([7, 2, 9, 11], jnp.int32)
    kc, vc = make_kv_cache(cfg)
    logits_seq, _, _ = forward_seq(w, cfg, ids, kc, vc,
                                   effort=0.5, impl="jnp")
    kc, vc = make_kv_cache(cfg)
    last = None
    for t in range(4):
        last, kc, vc = forward_token(w, cfg, ids[t], jnp.asarray(t), kc, vc,
                                     effort=0.5, impl="jnp")
    np.testing.assert_allclose(np.asarray(logits_seq[-1]), np.asarray(last),
                               rtol=2e-4, atol=2e-4)


def test_engine_prefill_matches_scan(model):
    cfg, w = model
    prompt = [1, 5, 9, 2, 6]  # shorter than pad_to=8 -> exercises left-pad
    eng_scan = Engine(w, cfg, impl="jnp", pad_to=8, prefill=False)
    eng_pre = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                     prefill_impl="jnp")
    r1 = eng_scan.generate(prompt, n_new=6, effort=1.0)
    r2 = eng_pre.generate(prompt, n_new=6, effort=1.0)
    assert r1.token_ids == r2.token_ids, (r1.token_ids, r2.token_ids)


def test_engine_prefill_prompt_logits(model):
    cfg, w = model
    prompt = [4, 8, 15, 16, 23, 42]
    eng_scan = Engine(w, cfg, impl="jnp", pad_to=8, prefill=False)
    eng_pre = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                     prefill_impl="jnp")
    lg1, preds1 = eng_scan.prompt_logits(prompt, effort=1.0)
    lg2, preds2 = eng_pre.prompt_logits(prompt, effort=1.0)
    np.testing.assert_allclose(lg1, lg2, rtol=2e-4, atol=2e-4)
    assert preds1 == preds2


def test_prefill_moe(model):
    cfg = tiny_test_model(n_experts=4, n_experts_per_tok=2)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=1)
    prompt = [3, 9, 27]
    eng_scan = Engine(w, cfg, impl="jnp", pad_to=4, prefill=False)
    eng_pre = Engine(w, cfg, impl="jnp", pad_to=4, prefill=True,
                     prefill_impl="jnp")
    r1 = eng_scan.generate(prompt, n_new=4, effort=0.6)
    r2 = eng_pre.generate(prompt, n_new=4, effort=0.6)
    assert r1.token_ids == r2.token_ids
