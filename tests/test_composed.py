"""Composed 2D parallelism (tp x ep, tp x sp) on the simulated CPU mesh,
checked against the single-device model of the same seed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from effort_tpu.parallel import shard_map

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache)
from effort_tpu.parallel.composed import (make_tp_ep_mesh, make_tp_sp_mesh,
                                          make_tp_ep_weights,
                                          tp_ep_forward_token, tp_ep_specs,
                                          tp_ep_local_config,
                                          tp_sp_cache_specs,
                                          tp_sp_forward_token)
from effort_tpu.parallel.tp import (make_tp_weights, tp_specs,
                                    local_config as tp_local_config)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


# --------------------------------------------------------------------------
# tp x ep
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tpep():
    cfg = tiny_test_model(n_experts=4, n_experts_per_tok=2)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    n_tp, n_ep = 2, 2
    mesh = make_tp_ep_mesh(n_tp, n_ep)
    w2d, cfg_local = make_tp_ep_weights(cfg, bcfg, n_tp, n_ep, seed=0)
    w_single = init_random_weights(cfg, bcfg, seed=0)
    return cfg, cfg_local, mesh, w2d, w_single


def _run_tp_ep(cfg, cfg_local, mesh, w2d, effort, tok=3, pos=0):
    kv_global = jnp.zeros((cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads,
                           cfg.head_dim), jnp.bfloat16)

    def step(w_local, tok, pos, kc, vc):
        return tp_ep_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                   effort=effort, impl="jnp")

    kv_spec = P(None, None, "tp", None)
    fn = shard_map(step, mesh=mesh,
                   in_specs=(tp_ep_specs(w2d), P(), P(), kv_spec, kv_spec),
                   out_specs=(P(), kv_spec, kv_spec))
    return jax.jit(fn)(w2d, jnp.asarray(tok), jnp.asarray(pos),
                       kv_global, kv_global)


def test_tp_ep_matches_single_device(tpep):
    cfg, cfg_local, mesh, w2d, w_single = tpep
    k1, v1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(3),
                              jnp.asarray(0), k1, v1, effort=1.0,
                              impl="jnp")
    logits, kc2, _ = _run_tp_ep(cfg, cfg_local, mesh, w2d, effort=1.0)
    assert logits.shape == (cfg.vocab_size,)
    assert _cos(ref, logits) > 0.999, _cos(ref, logits)
    # KV written on every tp shard's local heads
    assert np.abs(np.asarray(kc2[0, 0])).sum() > 0


def test_tp_ep_low_effort(tpep):
    cfg, cfg_local, mesh, w2d, w_single = tpep
    k1, v1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(3),
                              jnp.asarray(0), k1, v1, effort=0.5,
                              impl="jnp")
    logits, _, _ = _run_tp_ep(cfg, cfg_local, mesh, w2d, effort=0.5)
    # per-(ep,tp)-shard cutoffs differ slightly from the global ones
    assert _cos(ref, logits) > 0.95, _cos(ref, logits)


# --------------------------------------------------------------------------
# tp x sp
# --------------------------------------------------------------------------

def test_tp_sp_matches_single_device():
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    n_tp, n_sp = 2, 2
    mesh = make_tp_sp_mesh(n_tp, n_sp)
    w_tp, cfg_local = make_tp_weights(cfg, bcfg, n_tp, seed=0)
    w_single = init_random_weights(cfg, bcfg, seed=0)

    kv_global = jnp.zeros((cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads,
                           cfg.head_dim), jnp.bfloat16)
    kspec, vspec = tp_sp_cache_specs()

    def step(w_local, tok, pos, kc, vc):
        return tp_sp_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                   effort=1.0, impl="jnp", n_sp=n_sp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(tp_specs(w_tp), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))

    # decode a few tokens so cache slots cross the sp shard boundary
    # behavior (each owned by one sp chip) actually gets exercised
    k1, v1 = make_kv_cache(cfg)
    kc, vc = kv_global, kv_global
    toks = [3, 5, 7]
    for pos, tok in enumerate(toks):
        ref, k1, v1 = forward_token(w_single, cfg, jnp.asarray(tok),
                                    jnp.asarray(pos), k1, v1,
                                    effort=1.0, impl="jnp")
        logits, kc, vc = fn(w_tp, jnp.asarray(tok), jnp.asarray(pos),
                            kc, vc)
        assert logits.shape == (cfg.vocab_size,)
        cs = _cos(ref, logits)
        assert cs > 0.999, (pos, cs)


def test_tp_sp_low_effort_runs():
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=1, chunk_rows=8)  # row-prefix layout
    n_tp, n_sp = 2, 4
    mesh = make_tp_sp_mesh(n_tp, n_sp)
    w_tp, cfg_local = make_tp_weights(cfg, bcfg, n_tp, seed=1)
    kv = jnp.zeros((cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads,
                    cfg.head_dim), jnp.bfloat16)
    kspec, vspec = tp_sp_cache_specs()

    def step(w_local, tok, pos, kc, vc):
        return tp_sp_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                   effort=0.5, impl="jnp", n_sp=n_sp)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(tp_specs(w_tp), P(), P(), kspec, vspec),
        out_specs=(P(), kspec, vspec)))
    logits, _, _ = fn(w_tp, jnp.asarray(3), jnp.asarray(0), kv, kv)
    assert logits.shape == (cfg.vocab_size,)
    assert np.isfinite(np.asarray(logits)).all()
