"""Tensor-parallel forward on the simulated 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from effort_tpu.parallel import shard_map

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache)
from effort_tpu.parallel.tp import (make_mesh, make_tp_weights,
                                    tp_forward_token, tp_specs,
                                    local_config)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_model()
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    n_tp = 2
    mesh = make_mesh(1, n_tp)
    w_tp, cfg_local = make_tp_weights(cfg, bcfg, n_tp, seed=0)
    w_single = init_random_weights(cfg, bcfg, seed=0)
    return cfg, cfg_local, bcfg, mesh, w_tp, w_single


def test_tp_matches_single_device(setup):
    cfg, cfg_local, bcfg, mesh, w_tp, w_single = setup
    n_tp = mesh.shape["tp"]

    k1, v1 = make_kv_cache(cfg)
    logits_ref, _, _ = forward_token(
        w_single, cfg, jnp.asarray(3), jnp.asarray(0), k1, v1,
        effort=1.0, impl="jnp")

    kl, vl = make_kv_cache(cfg)  # global KV with full heads, tp-sharded

    def step(w_local, tok, pos, kc, vc):
        return tp_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                effort=1.0, impl="jnp")

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(tp_specs(w_tp), P(), P(), P(None, None, "tp", None),
                  P(None, None, "tp", None)),
        out_specs=(P(), P(None, None, "tp", None),
                   P(None, None, "tp", None)))
    logits_tp, kc2, vc2 = jax.jit(fn)(
        w_tp, jnp.asarray(3), jnp.asarray(0), kl, vl)

    a = np.asarray(logits_ref)
    b = np.asarray(logits_tp)
    cs = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cs > 0.999, cs
    # KV cache written on every shard's local heads
    assert np.abs(np.asarray(kc2[0, 0])).sum() > 0


def test_tp_effort_sweep_quality(setup):
    """Per-shard cutoffs: low effort still tracks the single-device
    result closely."""
    cfg, cfg_local, bcfg, mesh, w_tp, w_single = setup

    k1, v1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(3), jnp.asarray(0),
                              k1, v1, effort=0.5, impl="jnp")

    kl, vl = make_kv_cache(cfg)

    def step(w_local, tok, pos, kc, vc):
        return tp_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                effort=0.5, impl="jnp")

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(tp_specs(w_tp), P(), P(), P(None, None, "tp", None),
                  P(None, None, "tp", None)),
        out_specs=(P(), P(None, None, "tp", None),
                   P(None, None, "tp", None)))
    logits_tp, _, _ = jax.jit(fn)(w_tp, jnp.asarray(3), jnp.asarray(0),
                                  kl, vl)
    a, b = np.asarray(ref), np.asarray(logits_tp)
    cs = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cs > 0.95, cs  # per-shard cutoffs differ slightly from global


def test_tp_row_prefix_layout():
    """TP sharding works with the bucket_size=1 (row-prefix MXU) layout."""
    cfg = tiny_test_model()
    n_tp = 2
    bcfg1 = BucketConfig(bucket_size=1, chunk_rows=8)
    w_tp, cfg_l = make_tp_weights(cfg, bcfg1, n_tp, seed=0)
    mesh = make_mesh(1, n_tp)
    kv = jnp.zeros((cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads,
                    cfg.head_dim), jnp.bfloat16)

    def step(w_local, tok, pos, kc, vc):
        return tp_forward_token(w_local, cfg_l, tok, pos, kc, vc,
                                effort=0.5, impl="jnp")

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(tp_specs(w_tp), P(), P(), P(None, None, "tp", None),
                  P(None, None, "tp", None)),
        out_specs=(P(), P(None, None, "tp", None),
                   P(None, None, "tp", None)))
    logits, _, _ = jax.jit(fn)(w_tp, jnp.asarray(3), jnp.asarray(0), kv, kv)
    assert logits.shape == (cfg.vocab_size,)
    assert bool(jnp.isfinite(logits).all())
