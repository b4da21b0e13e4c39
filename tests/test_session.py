"""ChatSession: pad-invariance, multi-turn continuity, save/resume."""

import numpy as np
import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.session import ChatSession


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_model(max_seq_len=96)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8),
                            seed=0)
    return cfg, w


def test_pad_invariance(model):
    """Outputs must not depend on the prompt padding bucket."""
    cfg, w = model
    outs = []
    for pad_to in (4, 16):
        s = ChatSession(w, cfg, impl="jnp", pad_to=pad_to)
        outs.append(s.turn([1, 5, 9], n_new=5, effort=0.6))
    assert outs[0] == outs[1], outs


def test_multi_turn_positions(model):
    """Turn 2 continues from the cache; positions advance correctly."""
    cfg, w = model
    s = ChatSession(w, cfg, impl="jnp", pad_to=4)
    out1 = s.turn([1, 5, 9], n_new=4, effort=1.0)
    p_after_1 = s.pos
    assert p_after_1 == 3 + 4
    out2 = s.turn([7, 2], n_new=4, effort=1.0)
    assert s.pos == p_after_1 + 2 + 4
    assert len(out2) <= 4


def test_save_resume(tmp_path, model):
    cfg, w = model
    s = ChatSession(w, cfg, impl="jnp", pad_to=4)
    s.turn([1, 5, 9], n_new=4, effort=1.0)
    s.save(str(tmp_path / "sess"))

    s2 = ChatSession.load(str(tmp_path / "sess"), w, cfg, impl="jnp",
                          pad_to=4)
    assert s2.pos == s.pos
    a = s.turn([7, 2], n_new=4, effort=1.0)
    b = s2.turn([7, 2], n_new=4, effort=1.0)
    assert a == b


def test_ring_session_matches_full_cache():
    """ring_kv session == full-cache session under the same window,
    while the session runs past max_seq_len."""
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    cfg_ring = tiny_test_model(max_seq_len=16, sliding_window=8)
    cfg_full = tiny_test_model(max_seq_len=96, sliding_window=8)
    from effort_tpu.models.transformer import init_random_weights as irw
    w = irw(cfg_ring, bcfg, seed=0)
    s_ring = ChatSession(w, cfg_ring, impl="jnp", pad_to=4, ring_kv=True)
    s_full = ChatSession(w, cfg_full, impl="jnp", pad_to=4)
    for turn in ([1, 5, 9], [7, 2], [3, 3, 4, 8]):
        a = s_ring.turn(turn, n_new=6, effort=1.0)
        b = s_full.turn(turn, n_new=6, effort=1.0)
        assert a == b
    assert s_ring.pos > cfg_ring.max_seq_len   # ran past the cap
    assert s_ring.k_cache.shape[1] == cfg_ring.sliding_window


def test_ring_session_save_resume(tmp_path):
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    cfg = tiny_test_model(max_seq_len=16, sliding_window=8)
    from effort_tpu.models.transformer import init_random_weights as irw
    w = irw(cfg, bcfg, seed=0)
    s = ChatSession(w, cfg, impl="jnp", pad_to=4, ring_kv=True)
    s.turn([1, 5, 9, 2, 6], n_new=8, effort=1.0)   # wraps the ring
    s.save(str(tmp_path / "rs"))
    s2 = ChatSession.load(str(tmp_path / "rs"), w, cfg, impl="jnp",
                          pad_to=4)
    assert s2.ring_kv and s2.pos == s.pos
    assert s.turn([7, 2], n_new=4) == s2.turn([7, 2], n_new=4)


def test_session_sampling_and_penalties(model):
    cfg, w = model
    s = ChatSession(w, cfg, impl="jnp", pad_to=4)
    a = s.turn([1, 5, 9], n_new=8, temperature=0.8, seed=3)
    s2 = ChatSession(w, cfg, impl="jnp", pad_to=4)
    b = s2.turn([1, 5, 9], n_new=8, temperature=0.8, seed=3)
    assert a == b and len(a) == 8          # deterministic per seed
    s3 = ChatSession(w, cfg, impl="jnp", pad_to=4)
    pen = s3.turn([1, 5, 9], n_new=10, presence_penalty=1e9)
    # all generated tokens distinct (the greedy turn-boundary token is
    # counted too before the penalized steps)
    assert len(set(pen)) == len(pen), pen


def test_turn_stream_matches_turn(model):
    """Chunked streaming yields exactly the unsplit turn's tokens."""
    cfg, w = model
    s1 = ChatSession(w, cfg, impl="jnp", pad_to=4)
    full = s1.turn([1, 5, 9], n_new=12)
    s2 = ChatSession(w, cfg, impl="jnp", pad_to=4)
    chunks = list(s2.turn_stream([1, 5, 9], n_new=12, chunk=5))
    flat = [t for c in chunks for t in c]
    assert flat == full
    assert s2.pos == s1.pos and s2.history == s1.history


def test_session_reset(model):
    cfg, w = model
    s = ChatSession(w, cfg, impl="jnp", pad_to=4)
    a = s.turn([1, 5, 9], n_new=6)
    s.turn([7, 2], n_new=4)
    s.reset()
    assert s.pos == 0 and s.history == []
    b = s.turn([1, 5, 9], n_new=6)
    assert a == b          # fresh-conversation behavior after reset
