"""Tensor parallelism for the bucketized model (shard_map over a Mesh).

Green-field relative to the reference (single MTLDevice, SURVEY §2.3).
Design (Megatron-style, adapted to bucketMul):

  - wq/wk/wv and w1/w3 are OUTPUT-sharded (attention heads / hidden units);
    wo and w2 are INPUT-sharded — so attention and the FFN elementwise ops
    run fully locally and each transformer block needs exactly ONE psum
    (after wo and after w2), riding ICI.
  - each shard's slice is bucketized INDEPENDENTLY: its own buckets, stats
    and probes over the local slice. The effort knob then applies per
    shard (cutoff = quantile of the local probe sample) — selection
    quality matches single-device bucketMul of the slice, and no
    cross-chip communication is needed on the dispatch path (cf.
    SURVEY §5: probes are tiny, so cutoffs stay local).
  - the LM head is vocab-sharded; logits are all-gathered (128 KB).
  - KV cache is head-sharded (n_kv_heads % tp == 0).

Weights are stored as GLOBAL arrays whose leading axis concatenates the
per-shard containers; shard_map splits them with PartitionSpec("tp").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from effort_tpu.config import BucketConfig, ModelConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.layouts import BucketedMatrix
from effort_tpu.models.transformer import (LayerWeights, ModelWeights,
                                           forward_token)


def make_mesh(n_dp: int = 1, n_tp: int = 1, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp, (len(devices), n_dp, n_tp)
    arr = np.asarray(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def local_config(cfg: ModelConfig, n_tp: int) -> ModelConfig:
    assert cfg.n_heads % n_tp == 0 and cfg.n_kv_heads % n_tp == 0, \
        (cfg.n_heads, cfg.n_kv_heads, n_tp)
    assert cfg.hidden_dim % n_tp == 0
    return dataclasses.replace(
        cfg,
        n_heads=cfg.n_heads // n_tp,
        n_kv_heads=cfg.n_kv_heads // n_tp,
        hidden_dim=cfg.hidden_dim // n_tp,
        vocab_size=cfg.vocab_size // n_tp,
    )


def _shard_and_bucketize(wt_full: jax.Array, n_tp: int, axis: int,
                         bcfg: BucketConfig) -> BucketedMatrix:
    """wt_full: [n_inst, in, out]. axis=2 -> output-shard, axis=1 ->
    input-shard. Returns per-shard containers stacked along a new leading
    device axis folded into every array's axis 0."""
    parts = jnp.split(wt_full, n_tp, axis=axis)
    bms = [bucketize(p, bcfg) for p in parts]
    # metadata comes from a single shard's container
    return dataclasses.replace(
        bms[0],
        vals=jnp.concatenate([b.vals for b in bms]),
        pos=jnp.concatenate([b.pos for b in bms]),
        stats=jnp.concatenate([b.stats for b in bms]),
        probes=jnp.concatenate([b.probes for b in bms]),
        scales=(jnp.concatenate([b.scales for b in bms])
                if bms[0].scales is not None else None),
    )


def make_tp_weights(cfg: ModelConfig, bcfg: BucketConfig, n_tp: int,
                    seed: int = 0, scale: float = 0.02
                    ) -> Tuple[ModelWeights, ModelConfig]:
    """Random-weight TP model: same generative seed as
    init_random_weights, sliced per shard and bucketized locally.

    Returns (weights_with_global_arrays, local_config). Every bucketized
    container's leading block axis is [n_tp * (NB_local+1)]; shard_map
    splits it evenly so each device sees a normal single-shard container.
    """
    key = jax.random.key(seed)
    keys = iter(jax.random.split(key, 16))
    L, E, dim, hid = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.hidden_dim
    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim

    def full(n_inst, in_d, out_d):
        return jax.random.normal(next(keys), (n_inst, in_d, out_d),
                                 jnp.float32) * scale

    wq_f, wk_f, wv_f = (full(L, dim, q_out), full(L, dim, kv_out),
                        full(L, dim, kv_out))
    wo_f = full(L, q_out, dim)
    w1_f, w2_f, w3_f = (full(L * E, dim, hid), full(L * E, hid, dim),
                        full(L * E, dim, hid))

    def col(w):  # output-shard
        return _shard_and_bucketize(w, n_tp, 2, bcfg)

    def row(w):  # input-shard
        return _shard_and_bucketize(w, n_tp, 1, bcfg)

    # NOTE: wo rows are attention-head-major, so row-sharding wo by equal
    # parts == sharding by head groups, matching the local attention
    # outputs. Same for w2 rows == local hidden units.
    layers = LayerWeights(
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        wq=col(wq_f), wk=col(wk_f), wv=col(wv_f),
        wo=row(wo_f),
        w1=col(w1_f), w2=row(w2_f), w3=col(w3_f),
        ffn_gate=((jax.random.normal(next(keys), (L, dim, E)) * scale
                   ).astype(jnp.bfloat16) if E > 1 else None),
    )
    # same key-draw order as init_random_weights: embeddings, then lm head
    tok_embeddings = (jax.random.normal(
        next(keys), (cfg.vocab_size, dim)) * scale).astype(jnp.bfloat16)
    output_full = (jax.random.normal(next(keys), (dim, cfg.vocab_size))
                   * scale).astype(jnp.bfloat16)
    # vocab-shard the lm head: concat [dim, vocab/n_tp] slices on axis 0
    output_sharded = jnp.concatenate(jnp.split(output_full, n_tp, axis=1))
    w = ModelWeights(
        tok_embeddings=tok_embeddings,
        norm=jnp.ones((dim,), jnp.float32),
        output=output_sharded,
        layers=layers,
    )
    return w, local_config(cfg, n_tp)


_REPLICATED_LEAVES = {"attn_norm", "ffn_norm", "tok_embeddings", "norm",
                      "ffn_gate", "probe_dims"}  # seg_order shards with tp


def tp_specs(w_tp: ModelWeights):
    """PartitionSpec pytree with the same treedef (incl. static metadata)
    as the weights from make_tp_weights: bucketized containers and the lm
    head are split along their leading axis; norms/embeddings/probe_dims
    are replicated."""
    def spec(path, leaf):
        name = None
        for entry in reversed(path):
            if hasattr(entry, "name"):
                name = entry.name
                break
        return P() if name in _REPLICATED_LEAVES else P("tp")
    return jax.tree_util.tree_map_with_path(spec, w_tp)


def tp_forward_token(w_local: ModelWeights, cfg_local: ModelConfig,
                     token_id, pos, k_cache, v_cache, effort: float,
                     impl: str, tp_axis: str = "tp"):
    """Runs inside shard_map: local forward + psums + logit all-gather."""
    logits_local, k_cache, v_cache = forward_token(
        w_local, cfg_local, token_id, pos, k_cache, v_cache,
        effort=effort, impl=impl, tp_axis=tp_axis)
    logits = jax.lax.all_gather(logits_local, tp_axis, tiled=True)
    return logits, k_cache, v_cache
