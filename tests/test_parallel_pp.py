"""Pipeline-parallel decode (round-robin microbatches) vs single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from effort_tpu.parallel import shard_map

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache)
from effort_tpu.parallel.pp import (make_pp_mesh, make_pp_weights,
                                    make_pp_caches, pp_cache_specs,
                                    pp_decode_step, pp_specs, local_config)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_model(n_layers=4, max_seq_len=32)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    n_pp = 4
    mesh = make_pp_mesh(n_pp)
    w_pp, cfg_local = make_pp_weights(cfg, bcfg, n_pp, seed=0)
    w_single = init_random_weights(cfg, bcfg, seed=0)
    return cfg, cfg_local, n_pp, mesh, w_pp, w_single


def test_pp_decode_matches_single_device(setup):
    cfg, cfg_local, n_pp, mesh, w_pp, w_single = setup
    M = n_pp
    # M independent sequences, 3 decode steps each
    seqs = [[3, 1, 4], [1, 5, 9], [2, 6, 5], [8, 9, 7]]

    # reference: each sequence decoded on the single-device model
    ref = []
    for s in seqs:
        kc, vc = make_kv_cache(cfg)
        lg_seq = []
        for t, tok in enumerate(s):
            lg, kc, vc = forward_token(w_single, cfg, jnp.asarray(tok),
                                       jnp.asarray(t), kc, vc,
                                       effort=1.0, impl="jnp")
            lg_seq.append(lg)
        ref.append(lg_seq)

    kspec, vspec = pp_cache_specs()

    def step(w_local, toks, pos, kc, vc):
        return pp_decode_step(w_local, cfg_local, toks, pos, kc, vc,
                              effort=1.0, impl="jnp", n_pp=n_pp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(pp_specs(w_pp), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))

    kc, vc = make_pp_caches(cfg, M)
    for t in range(3):
        toks = jnp.asarray([s[t] for s in seqs], jnp.int32)
        pos = jnp.full((M,), t, jnp.int32)
        logits, kc, vc = fn(w_pp, toks, pos, kc, vc)
        assert logits.shape == (M, cfg.vocab_size)
        for m in range(M):
            cs = _cos(ref[m][t], logits[m])
            assert cs > 0.9999, (t, m, cs)


def test_pp_low_effort_runs(setup):
    cfg, cfg_local, n_pp, mesh, w_pp, w_single = setup
    M = n_pp
    kspec, vspec = pp_cache_specs()

    def step(w_local, toks, pos, kc, vc):
        return pp_decode_step(w_local, cfg_local, toks, pos, kc, vc,
                              effort=0.5, impl="jnp", n_pp=n_pp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(pp_specs(w_pp), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))
    kc, vc = make_pp_caches(cfg, M)
    logits, kc, vc = fn(w_pp, jnp.asarray([1, 2, 3, 4], jnp.int32),
                        jnp.zeros((M,), jnp.int32), kc, vc)
    assert bool(jnp.isfinite(logits).all())

    # parity with the single-device model at the same effort
    kc1, vc1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(2), jnp.asarray(0),
                              kc1, vc1, effort=0.5, impl="jnp")
    assert _cos(ref, logits[1]) > 0.999
