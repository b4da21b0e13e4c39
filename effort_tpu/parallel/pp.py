"""Pipeline parallelism (PP): contiguous layer stages sharded over a "pp"
mesh axis, with round-robin microbatching for decode.

Green-field relative to the reference (all 32 layers run sequentially on
one device, runNetwork.swift:124; SURVEY §2.3). Design:

  - each chip (stage) holds n_layers/n_pp contiguous layers' weights and
    the KV cache FOR THOSE LAYERS of every microbatch:
    [L_loc, M, S, KV, D] — the layer axis is the sharded one, so PP is
    the axis that scales model DEPTH beyond one chip's HBM;
  - M = n_pp independent sequences (microbatches) decode concurrently:
    at tick k, stage s processes microbatch (s - k) mod M, then activations
    rotate one hop along the ring (lax.ppermute over ICI). After
    2*n_pp - 1 ticks every microbatch has advanced one token with every
    stage busy during the steady phase — the classic GPipe round-robin
    schedule expressed as a jitted fori loop;
  - embeddings happen on stage 0, final norm + LM head on the last stage;
    logits are psum-combined (only the last stage contributes).

Effort/bucketMul is untouched: each stage's dispatch is local to its own
layer weights.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from effort_tpu.config import BucketConfig, ModelConfig
from effort_tpu.models.transformer import (LayerWeights, ModelWeights,
                                           forward_layers, rms_norm)
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec


def make_pp_mesh(n_pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_pp, (len(devices), n_pp)
    return Mesh(np.asarray(devices[:n_pp]), ("pp",))


def local_config(cfg: ModelConfig, n_pp: int) -> ModelConfig:
    assert cfg.n_layers % n_pp == 0, (cfg.n_layers, n_pp)
    return dataclasses.replace(cfg, n_layers=cfg.n_layers // n_pp)


def _split_layers_and_bucketize(wt_full: jax.Array, n_layers: int,
                                n_pp: int, n_expert_inst: int,
                                bcfg: BucketConfig):
    """wt_full: [L*E_inst, in, out] (instance = l*E_inst + e). Split the
    LAYER axis into n_pp stages, bucketize each stage's slice, concat
    containers along axis 0 for shard_map."""
    LE, in_dim, out_dim = wt_full.shape
    L_loc = n_layers // n_pp
    w4 = wt_full.reshape(n_layers, n_expert_inst, in_dim, out_dim)
    bms = []
    for p in range(n_pp):
        part = w4[p * L_loc:(p + 1) * L_loc].reshape(
            L_loc * n_expert_inst, in_dim, out_dim)
        bms.append(bucketize(part, bcfg))
    return dataclasses.replace(
        bms[0],
        vals=jnp.concatenate([b.vals for b in bms]),
        pos=jnp.concatenate([b.pos for b in bms]),
        stats=jnp.concatenate([b.stats for b in bms]),
        probes=jnp.concatenate([b.probes for b in bms]),
        scales=(jnp.concatenate([b.scales for b in bms])
                if bms[0].scales is not None else None),
        outlier_vals=(jnp.concatenate([b.outlier_vals for b in bms])
                      if bms[0].outlier_vals is not None else None),
        outlier_idx=(jnp.concatenate([b.outlier_idx for b in bms])
                     if bms[0].outlier_idx is not None else None),
    )


def make_pp_weights(cfg: ModelConfig, bcfg: BucketConfig, n_pp: int,
                    seed: int = 0, scale: float = 0.02
                    ) -> Tuple[ModelWeights, ModelConfig]:
    """Random-weight PP model with the SAME key-draw order as
    init_random_weights (comparable logits at the same seed). Layer-axis
    arrays (norms + all weight containers) are stage-sharded; embeddings,
    final norm and LM head are replicated."""
    key = jax.random.key(seed)
    keys = iter(jax.random.split(key, 16))
    L, E, dim, hid = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.hidden_dim

    def draw(n_inst, in_d, out_d):
        return jax.random.normal(next(keys), (n_inst, in_d, out_d),
                                 jnp.float32) * scale

    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim
    wq_f, wk_f, wv_f = (draw(L, dim, q_out), draw(L, dim, kv_out),
                        draw(L, dim, kv_out))
    wo_f = draw(L, q_out, dim)
    w1_f, w2_f, w3_f = (draw(L * E, dim, hid), draw(L * E, hid, dim),
                        draw(L * E, dim, hid))
    attn_split = partial(_split_layers_and_bucketize, n_layers=L,
                         n_pp=n_pp, n_expert_inst=1, bcfg=bcfg)
    ffn_split = partial(_split_layers_and_bucketize, n_layers=L,
                        n_pp=n_pp, n_expert_inst=E, bcfg=bcfg)
    ffn_gate = None
    if E > 1:
        ffn_gate = (jax.random.normal(next(keys), (L, dim, E)) * scale
                    ).astype(jnp.bfloat16)
    layers = LayerWeights(
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        wq=attn_split(wq_f), wk=attn_split(wk_f), wv=attn_split(wv_f),
        wo=attn_split(wo_f),
        w1=ffn_split(w1_f), w2=ffn_split(w2_f), w3=ffn_split(w3_f),
        ffn_gate=ffn_gate,
    )
    w = ModelWeights(
        tok_embeddings=(jax.random.normal(
            next(keys), (cfg.vocab_size, dim)) * scale).astype(jnp.bfloat16),
        norm=jnp.ones((dim,), jnp.float32),
        output=(jax.random.normal(
            next(keys), (dim, cfg.vocab_size)) * scale).astype(jnp.bfloat16),
        layers=layers,
    )
    return w, local_config(cfg, n_pp)


_REPLICATED = {"tok_embeddings", "norm", "output", "probe_dims"}


def pp_specs(w: ModelWeights):
    """Stage-sharded layer containers + norms; replicated embed/head."""
    def spec(path, leaf):
        names = [e.name for e in path if hasattr(e, "name")]
        if names and (names[0] in _REPLICATED or
                      names[-1] == "probe_dims"):
            return P()
        return P("pp")
    return jax.tree_util.tree_map_with_path(spec, w)


def pp_cache_specs() -> Tuple[P, P]:
    """(k, v) caches [L, M, S, KV, D]: layer axis stage-sharded."""
    return (P("pp", None, None, None, None),
            P("pp", None, None, None, None))


def make_pp_caches(cfg: ModelConfig, n_microbatches: int,
                   dtype=jnp.bfloat16):
    shape = (cfg.n_layers, n_microbatches, cfg.max_seq_len,
             cfg.n_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def pp_decode_step(w_local: ModelWeights, cfg_local: ModelConfig,
                   token_ids, pos, k_cache, v_cache, effort: float,
                   impl: str, n_pp: int, axis: str = "pp"):
    """One decode step for M = n_pp microbatches inside shard_map.

    token_ids: [M] current token of each microbatch; pos: [M] its cache
    slot. k_cache/v_cache: LOCAL stage caches [L_loc, M, S, KV, D].
    Returns (logits [M, vocab] replicated, k_cache, v_cache)."""
    M = n_pp
    my = jax.lax.axis_index(axis)
    dim = w_local.tok_embeddings.shape[1]
    vocab = w_local.output.shape[1]
    perm = [(i, (i + 1) % n_pp) for i in range(n_pp)]

    def run_block(h, m, kc, vc):
        kc_m = kc[:, m]
        vc_m = vc[:, m]
        h2, kc_m, vc_m, _ = forward_layers(
            w_local, cfg_local, h, pos[m], kc_m, vc_m,
            effort=effort, impl=impl)
        kc = jax.lax.dynamic_update_slice(
            kc, kc_m[:, None], (0, m, 0, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, vc_m[:, None], (0, m, 0, 0, 0))
        return h2, kc, vc

    def tick(k, carry):
        h, kc, vc, out = carry
        m = (my - k) % M
        # stage 0 picks up microbatch m's embedding at the start of its
        # window (tick k = (M - m) % M)
        fresh = w_local.tok_embeddings[token_ids[m]].astype(jnp.float32)
        h = jnp.where((my == 0) & (k < M), fresh, h)
        active = (k >= my) & (k < my + M)
        h2, kc, vc = jax.lax.cond(
            active, run_block, lambda h, m, kc, vc: (h, kc, vc),
            h, m, kc, vc)
        # last stage finishes microbatch m: final norm + LM head
        is_last = my == n_pp - 1
        hn = rms_norm(h2, w_local.norm, cfg_local.norm_eps)
        logits = dense_matvec(hn, w_local.output)
        out = jnp.where((is_last & active),
                        jax.lax.dynamic_update_slice(
                            out, logits[None], (m, 0)),
                        out)
        h = jax.lax.ppermute(h2, axis, perm)
        return (h, kc, vc, out)

    h0 = jnp.zeros((dim,), jnp.float32)
    out0 = jnp.zeros((M, vocab), jnp.float32)
    _, k_cache, v_cache, out = jax.lax.fori_loop(
        0, 2 * M - 1, tick, (h0, k_cache, v_cache, out0))
    # only the last stage wrote logits; broadcast them to every stage
    out = jax.lax.psum(jnp.where(my == n_pp - 1, out, 0.0), axis)
    return out, k_cache, v_cache
