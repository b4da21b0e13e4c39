"""Sliding-window attention (Mistral-7B architecture, window=4096 in the
real checkpoint). The reference ignores SWA — safe only because its
maxSeqLen (2048) never reaches the window; here long contexts are a
feature, so windows must be honored on every attention path."""

import numpy as np
import jax
import jax.numpy as jnp

from effort_tpu.config import BucketConfig, tiny_test_model, mistral_7b
from effort_tpu.kernels.flash_attention import flash_attention_seq
from effort_tpu.models.transformer import (_attention, _attention_seq,
                                           init_random_weights,
                                           forward_token, forward_seq,
                                           make_kv_cache)


def _np_windowed_attention(q, kc, vc, pos, cfg):
    """Oracle: f64 softmax over exactly the last `window` positions."""
    KV, D, rep = cfg.n_kv_heads, cfg.head_dim, cfg.kv_repeats
    qh = np.asarray(q, np.float64).reshape(KV, rep, D)
    kf = np.asarray(kc, np.float64)
    vf = np.asarray(vc, np.float64)
    lo = max(0, pos - cfg.sliding_window + 1) if cfg.sliding_window else 0
    out = np.zeros((KV, rep, D))
    for h in range(KV):
        for r in range(rep):
            s = kf[lo:pos + 1, h] @ qh[h, r] / np.sqrt(D)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[h, r] = p @ vf[lo:pos + 1, h]
    return out.reshape(-1)


def test_attention_window_oracle(rng):
    cfg = tiny_test_model(n_heads=4, n_kv_heads=2, head_dim=8,
                          max_seq_len=32, sliding_window=8)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    q = jnp.asarray(rng.standard_normal(H * D), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((32, KV, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((32, KV, D)), jnp.float32)
    for pos in (3, 7, 8, 20, 31):   # straddles the window boundary
        got = _attention(q, kc, vc, pos, cfg)
        want = _np_windowed_attention(q, kc, vc, pos, cfg)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
        # and differs from full-causal once pos crosses the window
        full = _attention(q, kc, vc, pos,
                          tiny_test_model(n_heads=4, n_kv_heads=2,
                                          head_dim=8, max_seq_len=32))
        if pos >= cfg.sliding_window:
            assert not np.allclose(np.asarray(got), np.asarray(full))


def test_attention_seq_window_matches_token_path(rng):
    """Prefill (_attention_seq) == decode (_attention) with a window."""
    cfg = tiny_test_model(n_heads=4, n_kv_heads=2, head_dim=8,
                          max_seq_len=16, sliding_window=5)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    T = 16
    Q = jnp.asarray(rng.standard_normal((T, H * D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((T, KV, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((T, KV, D)), jnp.float32)
    seq = _attention_seq(Q, kc, vc, jnp.arange(T), 0, cfg)
    for pos in (0, 4, 5, 11, 15):
        tok = _attention(Q[pos], kc, vc, pos, cfg)
        np.testing.assert_allclose(np.asarray(seq[pos]), np.asarray(tok),
                                   rtol=2e-4, atol=2e-4)


def test_flash_window_matches_reference(rng):
    cfg = tiny_test_model(n_heads=4, n_kv_heads=2, head_dim=128,
                          max_seq_len=64, sliding_window=24)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    T = S = 64
    Q2 = jax.random.normal(jax.random.key(1), (T, H * D), jnp.float32)
    kc = jax.random.normal(jax.random.key(2), (S, KV, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.key(3), (S, KV, D), jnp.bfloat16)
    ref = _attention_seq(Q2, kc, vc, jnp.arange(T), 0, cfg)
    out = flash_attention_seq(Q2, kc, vc, 0, 0, H, D, block_q=16,
                              block_k=16, window=cfg.sliding_window,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=8e-3)
    # sanity: the window changed the answer vs full-causal flash
    full = flash_attention_seq(Q2, kc, vc, 0, 0, H, D, block_q=16,
                               block_k=16, interpret=True)
    assert not np.allclose(np.asarray(out), np.asarray(full), atol=1e-3)


def test_model_decode_prefill_agree_with_window():
    """Whole-model: token-scan decode and batched prefill produce the
    same logits when the sequence exceeds the window."""
    cfg = tiny_test_model(max_seq_len=24, sliding_window=6)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    ids = jnp.asarray((np.arange(20) * 7 + 3) % cfg.vocab_size, jnp.int32)

    kc, vc = make_kv_cache(cfg)
    logits_scan = []
    for pos in range(len(ids)):
        lg, kc, vc = forward_token(w, cfg, ids[pos],
                                   jnp.asarray(pos, jnp.int32), kc, vc,
                                   effort=1.0, impl="jnp")
        logits_scan.append(np.asarray(lg))
    kc2, vc2 = make_kv_cache(cfg)
    logits_seq, _, _ = forward_seq(w, cfg, ids, kc2, vc2, effort=1.0,
                                   impl="jnp")
    np.testing.assert_allclose(np.stack(logits_scan),
                               np.asarray(logits_seq)[:len(ids)],
                               rtol=2e-3, atol=2e-3)


def test_sp_decode_with_window_matches_single_device():
    """Sequence-parallel decode honors the window across shard
    boundaries (the window straddles two KV shards here)."""
    from jax.sharding import PartitionSpec as P
    from effort_tpu.parallel import shard_map
    from effort_tpu.parallel.sp import (make_sp_mesh, sp_cache_specs,
                                        sp_forward_token, sp_weight_specs)
    cfg = tiny_test_model(max_seq_len=16, sliding_window=6)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=0)
    n_sp = 4
    mesh = make_sp_mesh(n_sp)
    tokens = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 8, 7]

    kc, vc = make_kv_cache(cfg)
    ref_logits = []
    for t, tok in enumerate(tokens):
        lg, kc, vc = forward_token(w, cfg, jnp.asarray(tok),
                                   jnp.asarray(t), kc, vc,
                                   effort=1.0, impl="jnp")
        ref_logits.append(np.asarray(lg))

    kspec, vspec = sp_cache_specs()

    def step(w_rep, tok, pos, kc, vc):
        return sp_forward_token(w_rep, cfg, tok, pos, kc, vc,
                                effort=1.0, impl="jnp", n_sp=n_sp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(sp_weight_specs(w), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))
    kc2, vc2 = make_kv_cache(cfg)
    for t, tok in enumerate(tokens):
        lg, kc2, vc2 = fn(w, jnp.asarray(tok), jnp.asarray(t), kc2, vc2)
        np.testing.assert_allclose(np.asarray(lg), ref_logits[t],
                                   rtol=2e-3, atol=2e-3)


def test_ring_kv_matches_full_cache():
    """Rolling O(window) cache decode == full-cache windowed decode."""
    from effort_tpu.models.transformer import (make_ring_kv_cache,
                                               ring_kv_hooks)
    cfg = tiny_test_model(max_seq_len=24, sliding_window=6)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    ids = jnp.asarray((np.arange(20) * 5 + 2) % cfg.vocab_size, jnp.int32)

    kc, vc = make_kv_cache(cfg)
    kr, vr = make_ring_kv_cache(cfg)
    assert kr.shape[1] == cfg.sliding_window       # O(window) memory
    kv_up, attn = ring_kv_hooks(cfg)
    for pos in range(len(ids)):
        p = jnp.asarray(pos, jnp.int32)
        lg, kc, vc = forward_token(w, cfg, ids[pos], p, kc, vc,
                                   effort=1.0, impl="jnp")
        lr, kr, vr = forward_token(w, cfg, ids[pos], p, kr, vr,
                                   effort=1.0, impl="jnp",
                                   kv_update_fn=kv_up, attn_fn=attn)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lg),
                                   rtol=2e-3, atol=2e-3)


def test_engine_ring_kv_unbounded_decode():
    """ring_kv decodes PAST max_seq_len; tokens match an engine whose
    full cache is big enough to hold the whole sequence."""
    from effort_tpu.models.generate import Engine
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    cfg_small = tiny_test_model(max_seq_len=16, sliding_window=8)
    cfg_big = tiny_test_model(max_seq_len=64, sliding_window=8)
    w = init_random_weights(cfg_small, bcfg, seed=3)
    prompt = [1, 5, 9, 2]
    n_new = 24                                 # 4 + 24 > max_seq_len=16
    ring = Engine(w, cfg_small, impl="jnp", pad_to=8, ring_kv=True)
    full = Engine(w, cfg_big, impl="jnp", pad_to=8)
    r_ring = ring.generate(prompt, n_new=n_new, effort=1.0)
    r_full = full.generate(prompt, n_new=n_new, effort=1.0)
    assert r_ring.token_ids == r_full.token_ids


def test_mistral_config_has_window():
    assert mistral_7b().sliding_window == 4096
    # round-trips through JSON (checkpoint config.json)
    from effort_tpu.config import ModelConfig
    cfg = mistral_7b(max_seq_len=8192)
    assert ModelConfig.from_json(cfg.to_json()).sliding_window == 4096
