"""Expert parallelism (EP) for MoE models: experts sharded over an "ep"
mesh axis.

Green-field relative to the reference: Mixtral's top-2 experts run
SEQUENTIALLY on one device there (runNetwork.swift:184-201, SURVEY §2.3).
Here the packed expert axis of w1/w2/w3 (loader.swift:124 layout) is split
across chips; attention weights, norms and the gate are replicated.

Two routing strategies, both preserving per-expert effort semantics:

  - ep_ffn (decode, batch-1): the token's activation is replicated on every
    ep chip; each chip checks which of the top-k selected experts it owns
    and runs ONLY those (lax.cond skips the rest at runtime), then one psum
    over ICI combines expert outputs. k tiny (2) => at most k chips do FFN
    work per token; no all-to-all needed.
  - ep_ffn_tokens (batched prefill / batched decode): tokens are sharded
    over the same ep axis; classic capacity-bounded all-to-all dispatch:
    each chip scatters its tokens into per-expert capacity buffers,
    `lax.all_to_all` routes them to the owning chips over ICI, each chip
    runs its local experts (bucketMul per slot, so the effort knob applies
    per routed token), a second all-to-all returns results, and gates
    combine them.
"""

from __future__ import annotations

import dataclasses
import math
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


def make_ep_mesh(n_ep: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_ep, (len(devices), n_ep)
    return Mesh(np.asarray(devices[:n_ep]), ("ep",))


def local_config(cfg: ModelConfig, n_ep: int) -> ModelConfig:
    assert cfg.n_experts % n_ep == 0, (cfg.n_experts, n_ep)
    return dataclasses.replace(cfg, n_experts=cfg.n_experts // n_ep)


def _split_experts_and_bucketize(wt_full: jax.Array, n_layers: int,
                                 n_ep: int, bcfg: BucketConfig
                                 ) -> BucketedMatrix:
    """wt_full: [L*E, in, out], instance index = l*E + e. Splits the expert
    axis into n_ep parts of [L*E_loc] instances, bucketizes each part
    independently (bucketization is per-instance, so per-part containers
    are bit-identical to slices of the full conversion), and concatenates
    the per-chip containers along axis 0 for shard_map to split."""
    LE, in_dim, out_dim = wt_full.shape
    E = LE // n_layers
    E_loc = E // n_ep
    w4 = wt_full.reshape(n_layers, E, in_dim, out_dim)
    bms = []
    for p in range(n_ep):
        part = w4[:, p * E_loc:(p + 1) * E_loc].reshape(
            n_layers * E_loc, in_dim, out_dim)
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


def make_ep_weights(cfg: ModelConfig, bcfg: BucketConfig, n_ep: int,
                    seed: int = 0, scale: float = 0.02
                    ) -> Tuple[ModelWeights, ModelConfig]:
    """Random-weight EP model with the SAME key-draw order as
    init_random_weights, so logits are comparable to the single-device
    model of the same seed. Attention weights / norms / gate / embeddings
    are replicated; w1/w2/w3 containers carry n_ep chips' experts stacked
    along axis 0 (split by ep_specs)."""
    assert cfg.is_moe, "EP requires an MoE config"
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
    ep_split = partial(_split_experts_and_bucketize, n_layers=L, n_ep=n_ep,
                       bcfg=bcfg)
    layers = LayerWeights(
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        wq=bucketize(wq_f, bcfg), wk=bucketize(wk_f, bcfg),
        wv=bucketize(wv_f, bcfg), wo=bucketize(wo_f, bcfg),
        w1=ep_split(w1_f), w2=ep_split(w2_f), w3=ep_split(w3_f),
        ffn_gate=(jax.random.normal(next(keys), (L, dim, E)) * scale
                  ).astype(jnp.bfloat16),
    )
    w = ModelWeights(
        tok_embeddings=(jax.random.normal(
            next(keys), (cfg.vocab_size, dim)) * scale).astype(jnp.bfloat16),
        norm=jnp.ones((dim,), jnp.float32),
        output=(jax.random.normal(
            next(keys), (dim, cfg.vocab_size)) * scale).astype(jnp.bfloat16),
        layers=layers,
    )
    return w, local_config(cfg, n_ep)


_EP_SHARDED = {"w1", "w2", "w3"}


def ep_specs(w: ModelWeights):
    """PartitionSpec pytree: FFN expert containers split on axis 0 over
    "ep" (probe_dims stays replicated metadata); all else replicated."""
    def spec(path, leaf):
        names = [e.name for e in path if hasattr(e, "name")]
        if any(n in _EP_SHARDED for n in names) and \
                names[-1] != "probe_dims":
            return P("ep")
        return P()
    return jax.tree_util.tree_map_with_path(spec, w)


def ep_ffn(layer: LayerWeights, l, x, effort, cfg_local: ModelConfig,
           n_ep: int, impl: str, ep_axis: str = "ep"):
    """Decode-path EP FFN (runs inside shard_map; x replicated [dim])."""
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
    return jax.lax.psum(out, ep_axis)


def ep_forward_token(w_local: ModelWeights, cfg_local: ModelConfig,
                     token_id, pos, k_cache, v_cache, effort: float,
                     impl: str, n_ep: int, ep_axis: str = "ep"):
    """One decode step inside shard_map: attention replicated, FFN
    expert-sharded. Returns replicated logits."""
    ffn = lambda layer, l, x: ep_ffn(layer, l, x, effort, cfg_local,
                                     n_ep, impl, ep_axis)
    return forward_token(w_local, cfg_local, token_id, pos, k_cache,
                         v_cache, effort=effort, impl=impl, ffn_fn=ffn)


def expert_capacity(n_tokens_local: int, n_ep: int, k: int, n_experts: int,
                    capacity_factor: float = 1.25) -> int:
    """Per-(source chip, expert) slot count for the all-to-all buffers."""
    total = n_tokens_local * k
    return max(1, int(math.ceil(total / n_experts * capacity_factor)))


def ep_ffn_tokens(layer: LayerWeights, l, X, effort, cfg_local: ModelConfig,
                  n_ep: int, impl: str, ep_axis: str = "ep",
                  capacity_factor: float = 1.25,
                  return_stats: bool = False):
    """Batched EP FFN with all-to-all token routing (inside shard_map).

    X: [T_local, dim] — this chip's slice of the token batch. Tokens over
    capacity for an expert are dropped (their gate contribution is zero),
    the standard capacity-bounded MoE contract.

    return_stats=True additionally returns this chip's dropped-assignment
    count as a [1] int32 (out of T_local * n_experts_per_tok assignments)
    — capacity-overflow accounting for serving metrics and tests.
    """
    Tl, dim = X.shape
    E_loc = cfg_local.n_experts
    E = E_loc * n_ep
    k = cfg_local.n_experts_per_tok
    C = expert_capacity(Tl, n_ep, k, E, capacity_factor)

    gate_logits = jnp.dot(X.astype(jnp.bfloat16), layer.ffn_gate[l],
                          preferred_element_type=jnp.float32)   # [Tl, E]
    top_vals, top_idx = jax.lax.top_k(gate_logits, k)
    gates = jax.nn.softmax(top_vals, axis=-1)                   # [Tl, k]

    ids = top_idx.reshape(-1)                                   # [Tl*k]
    onehot = (ids[:, None] == jnp.arange(E)[None, :]).astype(jnp.int32)
    pos_in_e = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=1)
    valid = pos_in_e < C                                        # [Tl*k]
    tok_of = jnp.arange(Tl * k, dtype=jnp.int32) // k
    pos_c = jnp.where(valid, pos_in_e, 0)

    # scatter local tokens into [E, C, dim] send buffers (masked .add:
    # each valid (expert, slot) pair is unique, overflow rows add 0)
    send = jnp.zeros((E, C, dim), X.dtype)
    send = send.at[ids, pos_c].add(
        X[tok_of] * valid[:, None].astype(X.dtype))

    # route over ICI: [n_ep, E_loc, C, dim] —> per-source-chip buffers
    recv = jax.lax.all_to_all(send.reshape(n_ep, E_loc, C, dim), ep_axis,
                              split_axis=0, concat_axis=0)
    xs = recv.transpose(1, 0, 2, 3).reshape(E_loc, n_ep * C, dim)

    mv = partial(bucket_matvec, effort=effort, impl=impl)

    def slot_step(_, ex):
        e_loc, xv = ex
        inst = l * E_loc + e_loc

        def run(xv):
            x1 = mv(layer.w1, xv, expert=inst)
            x3 = mv(layer.w3, xv, expert=inst)
            return mv(layer.w2, jax.nn.silu(x1) * x3, expert=inst)

        nonzero = jnp.any(xv != 0)
        y = jax.lax.cond(nonzero, run,
                         lambda _: jnp.zeros((dim,), jnp.float32), xv)
        return None, y

    e_ids = jnp.repeat(jnp.arange(E_loc, dtype=jnp.int32), n_ep * C)
    _, ys = jax.lax.scan(slot_step, None,
                         (e_ids, xs.reshape(E_loc * n_ep * C, dim)))

    back = ys.reshape(E_loc, n_ep, C, dim).transpose(1, 0, 2, 3)
    y_home = jax.lax.all_to_all(back, ep_axis, split_axis=0, concat_axis=0
                                ).reshape(E, C, dim)            # [E, C, dim]

    contrib = y_home[ids, pos_c] * (gates.reshape(-1) *
                                    valid.astype(jnp.float32))[:, None]
    y = jnp.sum(contrib.reshape(Tl, k, dim), axis=1)            # [Tl, dim]
    if return_stats:
        dropped = jnp.sum((~valid).astype(jnp.int32)).reshape(1)
        return y, dropped
    return y
