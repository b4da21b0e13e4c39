"""Sequence-parallel (sharded KV cache) decode vs single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from effort_tpu.parallel import shard_map

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache)
from effort_tpu.parallel.sp import (make_sp_mesh, sp_cache_specs,
                                    sp_forward_token, sp_weight_specs)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


@pytest.fixture(scope="module")
def setup():
    # max_seq_len=16 over 4 chips -> 4 slots/chip; a 10-step decode crosses
    # three shard boundaries
    cfg = tiny_test_model(max_seq_len=16)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    w = init_random_weights(cfg, bcfg, seed=0)
    n_sp = 4
    mesh = make_sp_mesh(n_sp)
    return cfg, w, n_sp, mesh


def test_sp_decode_matches_single_device(setup):
    cfg, w, n_sp, mesh = setup
    tokens = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]

    # reference: single-device sequential decode
    kc, vc = make_kv_cache(cfg)
    ref_logits = []
    for t, tok in enumerate(tokens):
        lg, kc, vc = forward_token(w, cfg, jnp.asarray(tok),
                                   jnp.asarray(t), kc, vc,
                                   effort=1.0, impl="jnp")
        ref_logits.append(lg)

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
        lg, kc2, vc2 = fn(w, jnp.asarray(tok, jnp.int32),
                          jnp.asarray(t, jnp.int32), kc2, vc2)
        cs = _cos(ref_logits[t], lg)
        assert cs > 0.9999, (t, cs)

    # cache rows landed on the right shards (global view equals reference)
    np.testing.assert_allclose(
        np.asarray(kc2[:, :len(tokens)], np.float32),
        np.asarray(kc[:, :len(tokens)], np.float32), rtol=2e-2, atol=2e-3)


def test_sp_low_effort(setup):
    cfg, w, n_sp, mesh = setup
    kspec, vspec = sp_cache_specs()

    kc, vc = make_kv_cache(cfg)
    ref = None
    for t, tok in enumerate([7, 3, 11]):
        ref, kc, vc = forward_token(w, cfg, jnp.asarray(tok),
                                    jnp.asarray(t), kc, vc,
                                    effort=0.4, impl="jnp")

    def step(w_rep, tok, pos, kc, vc):
        return sp_forward_token(w_rep, cfg, tok, pos, kc, vc,
                                effort=0.4, impl="jnp", n_sp=n_sp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(sp_weight_specs(w), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))
    kc2, vc2 = make_kv_cache(cfg)
    out = None
    for t, tok in enumerate([7, 3, 11]):
        out, kc2, vc2 = fn(w, jnp.asarray(tok, jnp.int32),
                           jnp.asarray(t, jnp.int32), kc2, vc2)
    # weights replicated + local dispatch => selection identical
    assert _cos(ref, out) > 0.9999
