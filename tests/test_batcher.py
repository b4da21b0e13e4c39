"""Continuous batching: batched slots must reproduce single-request
generation, and admission must recycle slots across a request wave."""

import numpy as np
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.generate import Engine
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.serving.batcher import BatchEngine, ContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_model(max_seq_len=64)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=0)
    return cfg, w


def test_batch_matches_single_requests(model):
    cfg, w = model
    prompts = [[1, 5, 9], [4, 8, 15, 16, 23], [7, 7, 7, 3]]
    efforts = [1.0, 1.0, 0.6]
    n_new = 6

    ref_engine = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                        prefill_impl="jnp")
    refs = [ref_engine.generate(p, n_new=n_new, effort=e).token_ids
            for p, e in zip(prompts, efforts)]

    be = BatchEngine(w, cfg, batch_size=4, pad_to=8, impl="jnp",
                     prefill_impl="jnp")
    cb = ContinuousBatcher(be)
    results = {}
    for i, (p, e) in enumerate(zip(prompts, efforts)):
        cb.submit(p, n_new, e, lambda out, i=i: results.__setitem__(i, out))
    cb.run_until_drained()

    assert len(results) == 3
    for i in range(3):
        assert results[i] == refs[i], (i, results[i], refs[i])


def test_continuous_admission_recycles_slots(model):
    cfg, w = model
    be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                     prefill_impl="jnp")
    cb = ContinuousBatcher(be)
    results = {}
    # 5 requests through 2 slots -> forced recycling mid-flight
    for i in range(5):
        cb.submit([1 + i, 2 + i, 3], 4, 1.0,
                  lambda out, i=i: results.__setitem__(i, out))
    cb.run_until_drained()
    assert len(results) == 5
    for i, out in results.items():
        assert 1 <= len(out) <= 4
        assert all(isinstance(t, int) for t in out)

    # recycled-slot output must equal a fresh single-request run
    ref_engine = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                        prefill_impl="jnp")
    ref = ref_engine.generate([1 + 4, 2 + 4, 3], n_new=4,
                              effort=1.0).token_ids
    assert results[4] == ref


def test_mixed_effort_batch(model):
    """Different efforts share one decode step (traced effort vector)."""
    cfg, w = model
    be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                     prefill_impl="jnp")
    cb = ContinuousBatcher(be)
    results = {}
    cb.submit([3, 1, 4], 5, 1.0, lambda o: results.__setitem__("hi", o))
    cb.submit([3, 1, 4], 5, 0.3, lambda o: results.__setitem__("lo", o))
    cb.run_until_drained()
    ref_engine = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                        prefill_impl="jnp")
    ref_hi = ref_engine.generate([3, 1, 4], n_new=5, effort=1.0).token_ids
    assert results["hi"] == ref_hi
    assert len(results["lo"]) >= 1


def test_forward_token_batch_matches_per_slot(model):
    """Batched decode step == per-slot forward_token (jnp path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from effort_tpu.models.transformer import (forward_token,
                                               forward_token_batch,
                                               make_kv_cache)
    cfg, w = model
    B = 3
    L, S, KV, D = cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads, cfg.head_dim
    kb = jnp.zeros((L, B, S, KV, D), jnp.bfloat16)
    vb = jnp.zeros_like(kb)
    toks = jnp.asarray([3, 7, 11], jnp.int32)
    pos = jnp.asarray([0, 2, 1], jnp.int32)
    offs = jnp.asarray([0, 1, 0], jnp.int32)
    efforts = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    lg_b, kb2, vb2 = forward_token_batch(w, cfg, toks, pos, kb, vb,
                                         efforts, offs=offs, impl="jnp")
    for s in range(B):
        kc, vc = make_kv_cache(cfg)
        lg, kc, vc = forward_token(
            w, cfg, toks[s], pos[s], kc, vc, effort=float(efforts[s]),
            impl="jnp", rope_offset=offs[s], mask_from=offs[s])
        np.testing.assert_allclose(np.asarray(lg_b[s]), np.asarray(lg),
                                   rtol=2e-4, atol=2e-4)
        # bf16 cache entries may differ by 1 ulp (different f32
        # reduction orders before the cast)
        np.testing.assert_allclose(
            np.asarray(kb2[:, s]).astype(np.float32),
            np.asarray(kc).astype(np.float32), atol=0.02)


def test_batch_matches_single_with_window():
    """Batched decode honors sliding-window attention: slot outputs
    match single-request generation on a windowed config."""
    cfg = tiny_test_model(max_seq_len=64, sliding_window=6)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=4)
    prompts = [[1, 5, 9, 2, 7, 4, 6], [4, 8, 15]]
    n_new = 8   # prompt + gen crosses the window for slot 0

    ref = Engine(w, cfg, impl="jnp", pad_to=8, prefill=True,
                 prefill_impl="jnp")
    refs = [ref.generate(p, n_new=n_new, effort=1.0).token_ids
            for p in prompts]

    be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                     prefill_impl="jnp")
    cb = ContinuousBatcher(be)
    results = {}
    for i, p in enumerate(prompts):
        cb.submit(p, n_new, 1.0,
                  lambda out, i=i: results.__setitem__(i, out))
    cb.run_until_drained()
    for i in range(len(prompts)):
        assert results[i] == refs[i], (i, results[i], refs[i])


def test_speculative_batching_matches_plain(model):
    """spec_k slots emit exactly what plain batched decode emits at the
    same per-slot efforts (verify-argmax contract), several per step."""
    cfg, w = model
    prompts = [[1, 5, 9], [4, 8, 15, 16, 23]]
    efforts = [1.0, 0.6]
    n_new = 8

    def run(**kw):
        be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                         prefill_impl="jnp", **kw)
        cb = ContinuousBatcher(be)
        res = {}
        for i, (p, e) in enumerate(zip(prompts, efforts)):
            cb.submit(p, n_new, e, lambda o, i=i: res.__setitem__(i, o))
        cb.run_until_drained()
        return res, be

    plain, _ = run()
    spec, be = run(spec_k=4, spec_draft_effort=0.3)
    for i in range(len(prompts)):
        assert spec[i] == plain[i], (i, spec[i], plain[i])


def test_speculative_batching_streams_all_tokens(model):
    cfg, w = model
    be = BatchEngine(w, cfg, batch_size=2, pad_to=8, impl="jnp",
                     prefill_impl="jnp", spec_k=4)
    cb = ContinuousBatcher(be)
    streamed, res = [], {}
    cb.submit([1, 5, 9], 6, 1.0, lambda o: res.__setitem__(0, o),
              on_token=streamed.append)
    cb.run_until_drained()
    assert streamed == res[0]
