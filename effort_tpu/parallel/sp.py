"""Sequence parallelism (SP): KV cache sharded over the sequence axis.

Green-field relative to the reference, which preallocates the full
[32, 2048, 32, 128] KV cache on one device and names un-tiled attention
as its long-context bottleneck (runNetwork.swift:28-29, 166-168,
docs/pesky.html "Attention and longer contexts"; SURVEY §2.3/§5).

Design: the slot axis of the KV cache is block-sharded over an "sp" mesh
axis — chip i owns slots [i*S_loc, (i+1)*S_loc). Per decode step:

  - the new K/V row is written only by the owning chip (masked update,
    no communication);
  - attention runs as a distributed online softmax: each chip computes
    its local (max, exp-sum, weighted-value) triple over its KV slice,
    and one pmax + two psums over ICI merge them exactly — the same
    log-sum-exp merge flash/ring attention uses blockwise, applied
    across chips. Communication per step is O(heads*head_dim), not O(S).

Weights are fully replicated; SP composes with effort (the bucketMul
dispatch stays local) and targets contexts larger than one chip's HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, active_window,
                                           forward_token)


def make_sp_mesh(n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_sp, (len(devices), n_sp)
    return Mesh(np.asarray(devices[:n_sp]), ("sp",))


def sp_cache_specs() -> Tuple[P, P]:
    """PartitionSpecs for (k_cache, v_cache) [L, S, KV, D]: slot-sharded."""
    return P(None, "sp", None, None), P(None, "sp", None, None)


def sp_weight_specs(w: ModelWeights):
    """All weights replicated."""
    return jax.tree_util.tree_map(lambda _: P(), w)


def _sp_kv_update(k_cache, v_cache, l, pos, k, v, s_loc: int,
                  axis: str = "sp"):
    """Masked write: only the chip owning slot `pos` stores the new row.
    Caches here are the LOCAL shards [L, S_loc, KV, D]."""
    my = jax.lax.axis_index(axis)
    local = pos - my * s_loc
    owns = (local >= 0) & (local < s_loc)
    slot = jnp.clip(local, 0, s_loc - 1)
    kc2 = jax.lax.dynamic_update_slice(
        k_cache, k.astype(k_cache.dtype)[None, None], (l, slot, 0, 0))
    vc2 = jax.lax.dynamic_update_slice(
        v_cache, v.astype(v_cache.dtype)[None, None], (l, slot, 0, 0))
    return (jnp.where(owns, kc2, k_cache), jnp.where(owns, vc2, v_cache))


def _sp_attention(q, k_local, v_local, pos, cfg_local: ModelConfig,
                  s_loc: int, axis: str = "sp", mask_from=0):
    """Distributed online-softmax attention over the sharded slot axis.

    q: [H*D]; k_local/v_local: [S_loc, KV, D] (this chip's slice).
    Exact: merges per-chip (m, s, o) with the log-sum-exp identity."""
    H, KV, D = cfg_local.n_heads, cfg_local.n_kv_heads, cfg_local.head_dim
    rep = cfg_local.kv_repeats
    my = jax.lax.axis_index(axis)
    qh = q.reshape(KV, rep, D).astype(jnp.float32)
    kf = k_local.astype(jnp.float32)
    vf = v_local.astype(jnp.float32)
    scores = jnp.einsum("krd,tkd->krt", qh, kf) / jnp.sqrt(float(D))
    slots = my * s_loc + jnp.arange(s_loc)
    mask = ((slots[None, None, :] <= pos) &
            (slots[None, None, :] >= mask_from))
    if active_window(cfg_local):
        mask &= slots[None, None, :] > pos - cfg_local.sliding_window
    scores = jnp.where(mask, scores, -jnp.inf)

    m_loc = jnp.max(scores, axis=-1)                     # [KV, rep]
    m_glob = jax.lax.pmax(m_loc, axis)
    # fully-masked local slices: exp(-inf - finite) = 0 handles them
    p = jnp.exp(scores - m_glob[..., None])
    p = jnp.where(mask, p, 0.0)
    s_loc_sum = jnp.sum(p, axis=-1)                      # [KV, rep]
    o_loc = jnp.einsum("krt,tkd->krd", p, vf)            # [KV, rep, D]
    s_glob = jax.lax.psum(s_loc_sum, axis)
    o_glob = jax.lax.psum(o_loc, axis)
    out = o_glob / jnp.maximum(s_glob[..., None], 1e-30)
    return out.reshape(H * D)


def sp_forward_token(w: ModelWeights, cfg: ModelConfig, token_id, pos,
                     k_cache, v_cache, effort: float, impl: str,
                     n_sp: int, axis: str = "sp", rope_offset=0,
                     mask_from=0):
    """One decode step inside shard_map with a sequence-sharded KV cache.

    k_cache/v_cache: LOCAL shards [L, S/n_sp, KV, D]. Weights replicated.
    Returns (logits, k_cache, v_cache) — logits replicated."""
    s_loc = cfg.max_seq_len // n_sp
    kv_up = partial(_sp_kv_update, s_loc=s_loc, axis=axis)
    attn = lambda q, kc, vc, l, p: _sp_attention(
        q, kc[l], vc[l], p, cfg, s_loc, axis, mask_from)
    return forward_token(w, cfg, token_id, pos, k_cache, v_cache,
                         effort=effort, impl=impl, rope_offset=rope_offset,
                         mask_from=mask_from, kv_update_fn=kv_up,
                         attn_fn=attn)
