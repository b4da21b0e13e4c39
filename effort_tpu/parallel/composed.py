"""Composed 2D parallelism: tp x ep (production MoE serving) and
tp x sp (long-context decode).

Green-field vs the reference (single MTLDevice, SURVEY §2.3); the 1D
building blocks are parallel/tp.py, ep.py, sp.py — this module wires
them together on one 2D mesh, the way production Mixtral serving runs
tensor-parallel attention with expert-parallel FFNs, and long-context
serving runs tensor-parallel heads over a sequence-sharded KV cache
(VERDICT r4 next #5).

tp x ep ("tp", "ep" mesh axes):
  - attention: Megatron-sharded over tp exactly as parallel/tp.py
    (wq/wk/wv/w1-style col shards, wo row shard, ONE psum after wo);
    replicated over ep.
  - FFN experts: the expert set is split over ep (each ep group owns
    E/n_ep experts); within an owner group every expert's w1/w3 are
    col-sharded and w2 row-sharded over tp. Container leading axis is
    ep-major x tp-minor -> PartitionSpec(("ep", "tp")).
  - decode FFN: gate computed replicated, top-k experts run only on
    their owner ep group (lax.cond), each as tp-local matvecs; ONE
    psum over BOTH axes merges w2 row-partials and non-owner zeros.
  - logits: vocab-sharded over tp, all-gathered (as tp.py).

tp x sp ("tp", "sp" mesh axes):
  - weights: parallel/tp.py sharding, replicated over sp.
  - KV cache [L, S, KV, D]: slots sharded over sp AND heads over tp
    (P(None, "sp", "tp", None)); the new row is written only by the
    owning sp chip (sp._sp_kv_update on the tp-local head slice).
  - attention: sp's distributed online-softmax (pmax + 2 psums over
    "sp") on tp-local heads — communication per step stays
    O(local_heads * head_dim), riding ICI on both axes.
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
                                           forward_token)
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec
from effort_tpu.ops.layouts import BucketedMatrix
from effort_tpu.parallel import tp as _tp
from effort_tpu.parallel.sp import _sp_attention, _sp_kv_update


# --------------------------------------------------------------------------
# meshes / local configs
# --------------------------------------------------------------------------

def make_tp_ep_mesh(n_tp: int, n_ep: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_tp * n_ep, (len(devices), n_tp, n_ep)
    arr = np.asarray(devices[:n_tp * n_ep]).reshape(n_tp, n_ep)
    return Mesh(arr, ("tp", "ep"))


def make_tp_sp_mesh(n_tp: int, n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_tp * n_sp, (len(devices), n_tp, n_sp)
    arr = np.asarray(devices[:n_tp * n_sp]).reshape(n_tp, n_sp)
    return Mesh(arr, ("tp", "sp"))


def tp_ep_local_config(cfg: ModelConfig, n_tp: int, n_ep: int
                       ) -> ModelConfig:
    """Per-chip view: tp divides heads/hidden/vocab, ep divides experts."""
    assert cfg.n_experts % n_ep == 0, (cfg.n_experts, n_ep)
    return dataclasses.replace(_tp.local_config(cfg, n_tp),
                               n_experts=cfg.n_experts // n_ep)


# --------------------------------------------------------------------------
# weights: ep-major x tp-minor expert containers + tp attention shards
# --------------------------------------------------------------------------

def _shard2_experts(wt_full: jax.Array, n_layers: int, n_ep: int,
                    n_tp: int, axis: int, bcfg: BucketConfig
                    ) -> BucketedMatrix:
    """wt_full [L*E, in, out] -> per-(ep, tp) containers concatenated
    ep-major/tp-minor along axis 0 (matches P(("ep", "tp")) on a
    ("tp", "ep") mesh). axis=2: col/output shard (w1/w3); axis=1:
    row/input shard (w2)."""
    LE, in_dim, out_dim = wt_full.shape
    E = LE // n_layers
    E_loc = E // n_ep
    w4 = wt_full.reshape(n_layers, E, in_dim, out_dim)
    bms = []
    for p_ep in range(n_ep):
        part = w4[:, p_ep * E_loc:(p_ep + 1) * E_loc].reshape(
            n_layers * E_loc, in_dim, out_dim)
        for p_tp in range(n_tp):
            sl = np.array_split(range(part.shape[axis]), n_tp)[p_tp]
            piece = jax.lax.slice_in_dim(part, int(sl[0]),
                                         int(sl[-1]) + 1, axis=axis)
            bms.append(bucketize(piece, bcfg))
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


def make_tp_ep_weights(cfg: ModelConfig, bcfg: BucketConfig, n_tp: int,
                       n_ep: int, seed: int = 0, scale: float = 0.02
                       ) -> Tuple[ModelWeights, ModelConfig]:
    """Random-weight tp x ep MoE model, SAME key-draw order as
    init_random_weights (logits comparable at equal seed)."""
    assert cfg.is_moe, "tp x ep requires an MoE config"
    key = jax.random.key(seed)
    keys = iter(jax.random.split(key, 16))
    L, E, dim, hid = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.hidden_dim
    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim

    def draw(n_inst, in_d, out_d):
        return jax.random.normal(next(keys), (n_inst, in_d, out_d),
                                 jnp.float32) * scale

    wq_f, wk_f, wv_f = (draw(L, dim, q_out), draw(L, dim, kv_out),
                        draw(L, dim, kv_out))
    wo_f = draw(L, q_out, dim)
    w1_f, w2_f, w3_f = (draw(L * E, dim, hid), draw(L * E, hid, dim),
                        draw(L * E, dim, hid))

    def col(wf):  # attention output-shard over tp
        return _tp._shard_and_bucketize(wf, n_tp, 2, bcfg)

    def row(wf):  # attention input-shard over tp
        return _tp._shard_and_bucketize(wf, n_tp, 1, bcfg)

    ep_tp = partial(_shard2_experts, n_layers=L, n_ep=n_ep, n_tp=n_tp,
                    bcfg=bcfg)
    layers = LayerWeights(
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        wq=col(wq_f), wk=col(wk_f), wv=col(wv_f), wo=row(wo_f),
        w1=ep_tp(w1_f, axis=2), w2=ep_tp(w2_f, axis=1),
        w3=ep_tp(w3_f, axis=2),
        ffn_gate=(jax.random.normal(next(keys), (L, dim, E)) * scale
                  ).astype(jnp.bfloat16),
    )
    tok_embeddings = (jax.random.normal(
        next(keys), (cfg.vocab_size, dim)) * scale).astype(jnp.bfloat16)
    output_full = (jax.random.normal(next(keys), (dim, cfg.vocab_size))
                   * scale).astype(jnp.bfloat16)
    output_sharded = jnp.concatenate(jnp.split(output_full, n_tp, axis=1))
    w = ModelWeights(
        tok_embeddings=tok_embeddings,
        norm=jnp.ones((dim,), jnp.float32),
        output=output_sharded,
        layers=layers,
    )
    return w, tp_ep_local_config(cfg, n_tp, n_ep)


_REPLICATED = {"attn_norm", "ffn_norm", "tok_embeddings", "norm",
               "ffn_gate", "probe_dims"}
_EP_TP = {"w1", "w2", "w3"}


def tp_ep_specs(w: ModelWeights):
    """PartitionSpec pytree: expert containers split ep-major/tp-minor
    on axis 0; attention containers + lm head split over tp; norms /
    embeddings / gate / probe_dims replicated."""
    def spec(path, leaf):
        names = [e.name for e in path if hasattr(e, "name")]
        if names and names[-1] in _REPLICATED:
            return P()
        if any(n in _EP_TP for n in names):
            return P(("ep", "tp"))
        return P("tp")
    return jax.tree_util.tree_map_with_path(spec, w)


# --------------------------------------------------------------------------
# tp x ep decode
# --------------------------------------------------------------------------

def tp_ep_ffn(layer: LayerWeights, l, x, effort, cfg_local: ModelConfig,
              impl: str, tp_axis: str = "tp", ep_axis: str = "ep"):
    """Inside shard_map: x replicated [dim]. Top-k experts run on their
    owner ep group as tp-local matvecs; one psum over (tp, ep) merges
    the w2 row-partials and the non-owners' zeros."""
    E_loc = cfg_local.n_experts
    k = cfg_local.n_experts_per_tok
    my = jax.lax.axis_index(ep_axis)
    gate_logits = jnp.dot(x.astype(jnp.bfloat16), layer.ffn_gate[l],
                          preferred_element_type=jnp.float32)
    top_vals, top_idx = jax.lax.top_k(gate_logits, k)
    gates = jax.nn.softmax(top_vals)
    mv = partial(bucket_matvec, effort=effort, impl=impl)
    out = jnp.zeros((cfg_local.dim,), jnp.float32)
    for i in range(k):
        owner = top_idx[i] // E_loc
        inst = l * E_loc + (top_idx[i] % E_loc)

        def run(xv):
            x1 = mv(layer.w1, xv, expert=inst)
            x3 = mv(layer.w3, xv, expert=inst)
            return gates[i] * mv(layer.w2, jax.nn.silu(x1) * x3,
                                 expert=inst)

        out = out + jax.lax.cond(owner == my, run,
                                 lambda _: jnp.zeros_like(out), x)
    return jax.lax.psum(out, (tp_axis, ep_axis))


def tp_ep_forward_token(w_local: ModelWeights, cfg_local: ModelConfig,
                        token_id, pos, k_cache, v_cache, effort: float,
                        impl: str, tp_axis: str = "tp",
                        ep_axis: str = "ep"):
    """One decode step inside shard_map on a ("tp", "ep") mesh.

    KV caches are the tp-local head shards (replicated over ep);
    returns replicated full-vocab logits."""
    ffn = lambda layer, l, x: tp_ep_ffn(layer, l, x, effort, cfg_local,
                                        impl, tp_axis, ep_axis)
    logits_local, k_cache, v_cache = forward_token(
        w_local, cfg_local, token_id, pos, k_cache, v_cache,
        effort=effort, impl=impl, tp_axis=tp_axis, ffn_fn=ffn)
    logits = jax.lax.all_gather(logits_local, tp_axis, tiled=True)
    return logits, k_cache, v_cache


# --------------------------------------------------------------------------
# tp x sp decode
# --------------------------------------------------------------------------

def tp_sp_cache_specs() -> Tuple[P, P]:
    """(k_cache, v_cache) [L, S, KV, D]: slots over sp, heads over tp."""
    return (P(None, "sp", "tp", None), P(None, "sp", "tp", None))


def tp_sp_forward_token(w_local: ModelWeights, cfg_local: ModelConfig,
                        token_id, pos, k_cache, v_cache, effort: float,
                        impl: str, n_sp: int, tp_axis: str = "tp",
                        sp_axis: str = "sp", rope_offset=0, mask_from=0):
    """One decode step inside shard_map on a ("tp", "sp") mesh.

    Weights: parallel/tp.py sharding (tp_specs), replicated over sp.
    k_cache/v_cache: LOCAL [L, S/n_sp, KV/n_tp, D] shards. The sp
    online-softmax attention runs on the tp-local heads; psums after
    wo/w2 ride tp; logits return replicated."""
    s_loc = cfg_local.max_seq_len // n_sp
    kv_up = partial(_sp_kv_update, s_loc=s_loc, axis=sp_axis)
    attn = lambda q, kc, vc, l, p: _sp_attention(
        q, kc[l], vc[l], p, cfg_local, s_loc, sp_axis, mask_from)
    logits_local, k_cache, v_cache = forward_token(
        w_local, cfg_local, token_id, pos, k_cache, v_cache,
        effort=effort, impl=impl, tp_axis=tp_axis,
        rope_offset=rope_offset, mask_from=mask_from,
        kv_update_fn=kv_up, attn_fn=attn)
    logits = jax.lax.all_gather(logits_local, tp_axis, tiled=True)
    return logits, k_cache, v_cache
