"""Expert-parallel MoE on the simulated CPU mesh: decode (cond+psum) and
batched all-to-all routing, both checked against the single-device model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from effort_tpu.parallel import shard_map

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache,
                                           rms_norm, _ffn)
from effort_tpu.parallel.ep import (make_ep_mesh, make_ep_weights,
                                    ep_forward_token, ep_ffn_tokens,
                                    ep_specs)


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b,
                                                         np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_model(n_experts=4, n_experts_per_tok=2)
    bcfg = BucketConfig(bucket_size=4, chunk_rows=8)
    n_ep = 4
    mesh = make_ep_mesh(n_ep)
    w_ep, cfg_local = make_ep_weights(cfg, bcfg, n_ep, seed=0)
    w_single = init_random_weights(cfg, bcfg, seed=0)
    return cfg, cfg_local, n_ep, mesh, w_ep, w_single


def test_ep_decode_matches_single_device(setup):
    cfg, cfg_local, n_ep, mesh, w_ep, w_single = setup

    k1, v1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(3), jnp.asarray(0),
                              k1, v1, effort=1.0, impl="jnp")

    kl, vl = make_kv_cache(cfg)

    def step(w_local, tok, pos, kc, vc):
        return ep_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                effort=1.0, impl="jnp", n_ep=n_ep)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(ep_specs(w_ep), P(), P(), P(), P()),
                   out_specs=(P(), P(), P()))
    logits, kc2, _ = jax.jit(fn)(w_ep, jnp.asarray(3), jnp.asarray(0),
                                 kl, vl)
    assert _cos(ref, logits) > 0.9999, _cos(ref, logits)
    assert np.abs(np.asarray(kc2[0, 0])).sum() > 0


def test_ep_decode_low_effort(setup):
    cfg, cfg_local, n_ep, mesh, w_ep, w_single = setup
    k1, v1 = make_kv_cache(cfg)
    ref, _, _ = forward_token(w_single, cfg, jnp.asarray(7), jnp.asarray(0),
                              k1, v1, effort=0.5, impl="jnp")
    kl, vl = make_kv_cache(cfg)

    def step(w_local, tok, pos, kc, vc):
        return ep_forward_token(w_local, cfg_local, tok, pos, kc, vc,
                                effort=0.5, impl="jnp", n_ep=n_ep)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(ep_specs(w_ep), P(), P(), P(), P()),
                   out_specs=(P(), P(), P()))
    logits, _, _ = jax.jit(fn)(w_ep, jnp.asarray(7), jnp.asarray(0), kl, vl)
    # identical expert slices + identical per-expert bucketization =>
    # selection matches the single-device engine at the same effort
    assert _cos(ref, logits) > 0.999, _cos(ref, logits)


def test_ep_all_to_all_tokens(setup):
    cfg, cfg_local, n_ep, mesh, w_ep, w_single = setup
    T = 16  # 4 tokens per chip
    key = jax.random.key(42)
    X = jax.random.normal(key, (T, cfg.dim), jnp.float32) * 0.05

    # reference: per-token dense-path MoE FFN on the single-device model
    l = jnp.asarray(1, jnp.int32)
    ref = jnp.stack([
        _ffn(w_single.layers, l, X[t], 1.0, cfg, "jnp")
        for t in range(T)])

    def ffn_tokens(w_local, xs):
        return ep_ffn_tokens(w_local.layers, l, xs, 1.0, cfg_local,
                             n_ep, "jnp", capacity_factor=4.0)

    fn = shard_map(ffn_tokens, mesh=mesh,
                   in_specs=(ep_specs(w_ep), P("ep")),
                   out_specs=P("ep"))
    out = jax.jit(fn)(w_ep, X)
    assert out.shape == (T, cfg.dim)
    cs = _cos(ref, out)
    assert cs > 0.9999, cs


def test_ep_all_to_all_capacity_drop(setup):
    """With capacity_factor < 1 some assignments drop; output stays finite
    and correlated (the standard capacity-bounded MoE contract)."""
    cfg, cfg_local, n_ep, mesh, w_ep, w_single = setup
    T = 16
    X = jax.random.normal(jax.random.key(1), (T, cfg.dim)) * 0.05
    l = jnp.asarray(0, jnp.int32)
    ref = jnp.stack([
        _ffn(w_single.layers, l, X[t], 1.0, cfg, "jnp")
        for t in range(T)])

    def ffn_tokens(w_local, xs):
        return ep_ffn_tokens(w_local.layers, l, xs, 1.0, cfg_local,
                             n_ep, "jnp", capacity_factor=0.75)

    fn = shard_map(ffn_tokens, mesh=mesh,
                   in_specs=(ep_specs(w_ep), P("ep")),
                   out_specs=P("ep"))
    out = jax.jit(fn)(w_ep, X)
    assert bool(jnp.isfinite(out).all())
    assert _cos(ref, out) > 0.8


def test_ep_imbalance_drop_accounting(setup):
    """Realistic failure mode for a2a routing: heavy expert imbalance.

    Zeroed gate weights make every token pick experts [0, 1] (top_k tie
    order), the maximal hot-expert skew. With capacity_factor=1.0 each
    (chip, expert) buffer holds C = ceil(Tl*k/E) slots, so exactly
    Tl - C assignments per hot expert per chip overflow. Asserts the
    EXACT dropped count and the EXACT capacity-bounded output (kept
    assignments in token order; dropped ones contribute zero)."""
    import dataclasses
    cfg, cfg_local, n_ep, mesh, w_ep, w_single = setup
    zero_gate = jnp.zeros_like(w_ep.layers.ffn_gate)
    w_ep2 = dataclasses.replace(
        w_ep, layers=dataclasses.replace(w_ep.layers, ffn_gate=zero_gate))
    w_s2 = dataclasses.replace(
        w_single, layers=dataclasses.replace(
            w_single.layers,
            ffn_gate=jnp.zeros_like(w_single.layers.ffn_gate)))

    T, k = 16, cfg.n_experts_per_tok
    Tl = T // n_ep
    E = cfg.n_experts
    C = -(-Tl * k // E)                    # capacity_factor = 1.0
    X = jax.random.normal(jax.random.key(3), (T, cfg.dim)) * 0.05
    l = jnp.asarray(0, jnp.int32)

    def ffn_tokens(w_local, xs):
        return ep_ffn_tokens(w_local.layers, l, xs, 1.0, cfg_local,
                             n_ep, "jnp", capacity_factor=1.0,
                             return_stats=True)

    fn = shard_map(ffn_tokens, mesh=mesh,
                   in_specs=(ep_specs(w_ep2), P("ep")),
                   out_specs=(P("ep"), P("ep")))
    out, dropped = jax.jit(fn)(w_ep2, X)

    # every token routes to experts 0 and 1: per chip each hot expert
    # gets Tl assignments into C slots -> (Tl - C) drops, 2 hot experts
    expected_drop = n_ep * 2 * (Tl - C)
    assert int(dropped.sum()) == expected_drop, (
        int(dropped.sum()), expected_drop)

    # exact reference: first C tokens (local order) keep each hot-expert
    # assignment, later ones lose it; gates are softmax([0,0]) = 0.5
    from effort_tpu.ops.bucketmul import bucket_matvec

    def expert_eval(e, x):
        inst = int(l) * E + e
        x1 = bucket_matvec(w_s2.layers.w1, x, 1.0, expert=inst, impl="jnp")
        x3 = bucket_matvec(w_s2.layers.w3, x, 1.0, expert=inst, impl="jnp")
        return bucket_matvec(w_s2.layers.w2, jax.nn.silu(x1) * x3, 1.0,
                             expert=inst, impl="jnp")

    ref_rows = []
    for t in range(T):
        tl = t % Tl                        # local token index on its chip
        if tl < C:
            ref_rows.append(0.5 * (expert_eval(0, X[t])
                                   + expert_eval(1, X[t])))
        else:
            ref_rows.append(jnp.zeros((cfg.dim,), jnp.float32))
    ref = jnp.stack(ref_rows)
    cs = _cos(ref, out)
    assert cs > 0.9999, cs
