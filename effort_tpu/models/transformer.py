"""Transformer forward pass (Mistral / Mixtral family) with effort knob.

TPU-native re-design of the reference inference loop (runNetwork.swift):
  - the whole decode step is ONE jitted function; layers run under lax.scan
    (vs ~1,500 individually-encoded kernel launches per token with a blocking
    eval, runNetwork.swift:90-109 — the documented 15 ms/token overhead).
  - bucketized projection weights of all layers are PACKED into single
    BucketedMatrix containers (instance axis = layer*n_experts + expert,
    generalizing the reference's packed expert buffers, loader.swift:124);
    the gather kernel indexes blocks by instance offset, so lax.scan never
    slices (= copies) weight arrays.
  - GQA is an einsum reshape, not a materialized repeat (cf. repeat4x32,
    aux.metal:251-260 + xk_temp2 buffers, runNetwork.swift:136-137).
  - KV cache: [n_layers, max_seq, n_kv_heads, head_dim] bf16, updated with
    dynamic_update_slice inside the scan carry.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from effort_tpu.config import ModelConfig, BucketConfig
from effort_tpu.ops.layouts import BucketedMatrix
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec, dense_matvec


@partial(jax.tree_util.register_dataclass,
         data_fields=["attn_norm", "ffn_norm", "wq", "wk", "wv", "wo",
                      "w1", "w2", "w3", "ffn_gate", "wqkv", "w13"],
         meta_fields=[])
@dataclasses.dataclass
class LayerWeights:
    """All layers' weights, layer axis packed inside each container.

    attn_norm/ffn_norm: [L, dim] f32.
    wq/wk/wv/wo: BucketedMatrix with n_experts == L.
    w1/w2/w3:    BucketedMatrix with n_experts == L * n_experts(model).
    ffn_gate:    [L, dim, E] bf16 or None (dense models) —
                 reference layer.ffnGate (loader.swift:178-227).
    wqkv/w13:    optional FUSED projections (output columns concatenated:
                 q|k|v and w1|w3). One effort kernel launch + ONE shared
                 selection replaces three/two (the reference dispatches
                 per matrix, expertMul.swift:24; on TPU the ~9us
                 fixed cost per launch makes fusion a ~20% decode win).
                 When set, the corresponding unfused fields are None.
    """
    attn_norm: jax.Array
    ffn_norm: jax.Array
    wq: Optional[BucketedMatrix]
    wk: Optional[BucketedMatrix]
    wv: Optional[BucketedMatrix]
    wo: BucketedMatrix
    w1: Optional[BucketedMatrix]
    w2: BucketedMatrix
    w3: Optional[BucketedMatrix]
    ffn_gate: Optional[jax.Array]
    wqkv: Optional[BucketedMatrix] = None
    w13: Optional[BucketedMatrix] = None

    @property
    def any_w1(self) -> BucketedMatrix:
        """The FFN up-projection container (fused or not) — for callers
        that only need layout metadata (bucket_size, dtype)."""
        return self.w13 if self.w13 is not None else self.w1


@partial(jax.tree_util.register_dataclass,
         data_fields=["tok_embeddings", "norm", "output", "layers",
                      "output_q", "output_qscale"],
         meta_fields=[])
@dataclasses.dataclass
class ModelWeights:
    tok_embeddings: jax.Array   # [vocab, dim] bf16
    norm: jax.Array             # [dim] f32
    output: jax.Array           # [dim, vocab] bf16 (lm head, dense:
                                #  reference basicMul, runNetwork.swift:209)
    layers: LayerWeights
    # optional int8 LM head for DECODE (quantize_head): per-column scales,
    # int8xint8 MXU dot. The dense bf16 head reads 262 MB/token
    # (dim*vocab*2) — ~330us, the single largest fixed decode cost; int8
    # halves it. Greedy argmax is protected by an exact bf16 rescore of
    # the int8 top-16 (the reference's own sampling reads only mpsTopK
    # k=16, mps.swift:49-80).
    output_q: Optional[jax.Array] = None        # [dim, vocab] int8
    output_qscale: Optional[jax.Array] = None   # [vocab] f32


def quantize_head(w: ModelWeights, keep_exact: bool = True) -> ModelWeights:
    """Add an int8 copy of the LM head (per-output-column absmax scales).

    keep_exact keeps the bf16 head for the top-16 exact rescore (and for
    prefill, which stays bf16 — the head there is amortized over T rows).
    """
    W = w.output.astype(jnp.float32)
    sc = jnp.max(jnp.abs(W), axis=0) / 127.0 + 1e-30
    Wi = jnp.round(W / sc).astype(jnp.int8)
    return dataclasses.replace(
        w, output_q=Wi, output_qscale=sc,
        output=w.output if keep_exact else None)


_HEAD_RESCORE_K = 16


def head_logits(w: ModelWeights, h: jax.Array) -> jax.Array:
    """Decode LM head: h [dim] -> logits [vocab] f32.

    With an int8 head present: symmetric per-tensor int8 activation x
    per-column int8 weights on the MXU (int32 accumulate), then — when
    the bf16 head is retained — the top-16 logits are recomputed exactly
    in bf16, making greedy argmax and k<=16 top-k reads (answer_limited,
    the reference's limitLogits) match the dense head for any realistic
    logit margin."""
    if w.output_q is None:
        return dense_matvec(h, w.output)
    vm = jnp.max(jnp.abs(h)) / 127.0 + 1e-30
    hi = jnp.round(h / vm).astype(jnp.int8)
    y = jax.lax.dot_general(hi, w.output_q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (w.output_qscale * vm)
    if w.output is not None:
        _, top_i = jax.lax.top_k(y, _HEAD_RESCORE_K)
        cols = jnp.take(w.output, top_i, axis=1)            # [dim, K]
        exact = jnp.dot(h.astype(jnp.bfloat16), cols,
                        preferred_element_type=jnp.float32)
        y = y.at[top_i].set(exact)
    return y


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMS norm over the last axis (supports [dim] and batched [T, dim])."""
    x = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return x * inv * weight


def rope_rotate(x: jax.Array, pos, head_dim: int, theta: float) -> jax.Array:
    """Rotate-half RoPE (HF weight convention; the reference's rope_mx uses
    the interleaved-pairs convention with theta=1e6 via its logspace table,
    model.swift:693-717 — equivalent up to the fixed weight permutation HF
    applies, which our converter keeps)."""
    x = x.astype(jnp.float32)
    h = head_dim // 2
    freqs = theta ** (-jnp.arange(0, h, dtype=jnp.float32) / h)
    angle = pos.astype(jnp.float32) * freqs              # [h]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    x1, x2 = x[..., :h], x[..., h:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1)


def make_kv_cache(cfg: ModelConfig, dtype=jnp.bfloat16):
    shape = (cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def make_ring_kv_cache(cfg: ModelConfig, dtype=jnp.bfloat16):
    """O(sliding_window) KV cache for the ring hooks below: slots hold
    the last `sliding_window` positions only, so decode length is
    unbounded (max_seq_len only sizes prompt buffers)."""
    assert cfg.sliding_window, "ring KV cache requires cfg.sliding_window"
    shape = (cfg.n_layers, cfg.sliding_window, cfg.n_kv_heads,
             cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def ring_kv_hooks(cfg: ModelConfig):
    """(kv_update_fn, attn_fn) implementing a rolling KV cache for
    sliding-window decode: the new row lands at slot pos % window,
    overwriting the row that just left the window. Softmax is
    permutation-invariant over cache slots, so the ring never needs
    unrotating — once pos >= window every slot is live; before that,
    slots > pos are masked. Memory is O(window) instead of O(seq);
    with the full-cache path a 32k-token chat at window 4096 would
    hold 8x more KV than it can ever attend to."""
    W = cfg.sliding_window
    assert W, "ring KV hooks require cfg.sliding_window"

    def upd(k_cache, v_cache, l, pos, k, v):
        slot = pos % W
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype)[None, None],
            (l, slot, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype)[None, None],
            (l, slot, 0, 0))
        return k_cache, v_cache

    def attn(q, k_cache, v_cache, l, pos):
        # decode-only (no left-padded prefill, so no mask_from): before
        # warm-up only slots <= pos are live, after it every slot is
        live = (jnp.arange(W) <= pos) | (pos >= W)
        return _attn_core(q, k_cache[l].astype(jnp.float32),
                          v_cache[l].astype(jnp.float32), live, cfg)

    return upd, attn


def _attn_core(q, kf, vf, live, cfg: ModelConfig):
    """Shared masked-softmax attention read for one query token.
    q [H*D]; kf/vf [S, KV, D] float32 (already dequantized); live [S]
    bool. The single home of the score/softmax/output math so mask or
    scale fixes never need applying in multiple hooks."""
    KV, rep, D = cfg.n_kv_heads, cfg.kv_repeats, cfg.head_dim
    qh = q.reshape(KV, rep, D).astype(jnp.float32)
    scores = jnp.einsum("krd,tkd->krt", qh, kf) / jnp.sqrt(float(D))
    scores = jnp.where(live[None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("krt,tkd->krd", probs, vf)
    return out.reshape(cfg.n_heads * D)


def make_quant_kv_cache(cfg: ModelConfig):
    """int8 KV cache: (data [L,S,KV,D] int8, scale [L,S,KV] f32) per
    side. Halves KV memory/bandwidth vs bf16 — attention at long context
    is bandwidth-bound, so this is the serving long-context lever."""
    L, S = cfg.n_layers, cfg.max_seq_len
    KV, D = cfg.n_kv_heads, cfg.head_dim
    z8 = jnp.zeros((L, S, KV, D), jnp.int8)
    zs = jnp.zeros((L, S, KV), jnp.float32)
    return (z8, zs), (jnp.zeros_like(z8), jnp.zeros_like(zs))


def quant_kv_hooks(cfg: ModelConfig):
    """(kv_update_fn, attn_fn) for the int8 KV cache: each new row is
    quantized per (slot, kv-head) with a symmetric absmax scale; the
    attention read dequantizes on the fly (XLA fuses the int8->f32
    convert + scale into the score/value contractions, so HBM traffic
    stays at the int8 byte count)."""
    def upd(k_cache, v_cache, l, pos, k, v):
        (kd, ks), (vd, vs) = k_cache, v_cache
        kq, ksc = quantize_kv_rows(k.astype(jnp.float32))
        vq, vsc = quantize_kv_rows(v.astype(jnp.float32))
        kd = jax.lax.dynamic_update_slice(kd, kq[None, None],
                                          (l, pos, 0, 0))
        ks = jax.lax.dynamic_update_slice(ks, ksc[None, None], (l, pos, 0))
        vd = jax.lax.dynamic_update_slice(vd, vq[None, None],
                                          (l, pos, 0, 0))
        vs = jax.lax.dynamic_update_slice(vs, vsc[None, None], (l, pos, 0))
        return (kd, ks), (vd, vs)

    def attn(q, k_cache, v_cache, l, pos):
        (kd, ks), (vd, vs) = k_cache, v_cache
        # decode-only hook: no left-padded prefill, so mask_from=0
        return _attention_q8(q, kd[l], ks[l], vd[l], vs[l], pos, cfg, 0)

    return upd, attn


def active_window(cfg: ModelConfig) -> int:
    """Sliding-window width if it can bind within max_seq_len, else 0
    (a window wider than the cache never masks anything)."""
    w = cfg.sliding_window or 0
    return w if 0 < w < cfg.max_seq_len else 0


def _attention(q, k_cache, v_cache, pos, cfg: ModelConfig, mask_from=0):
    """q: [n_heads*head_dim]; caches: [T, n_kv, hd]. Returns [n_heads*hd]."""
    t_ids = jnp.arange(cfg.max_seq_len)
    live = (t_ids <= pos) & (t_ids >= mask_from)
    if active_window(cfg):
        live &= t_ids > pos - cfg.sliding_window
    return _attn_core(q, k_cache.astype(jnp.float32),
                      v_cache.astype(jnp.float32), live, cfg)


def _attention_seq(Q, k_cache, v_cache, slots, mask_from, cfg: ModelConfig):
    """Batched causal attention for prefill.

    Q: [T, n_heads*head_dim] (already RoPE'd); caches: [S, n_kv, hd]
    (already updated with this block's K/V); slots: [T] absolute cache
    slots of the queries. Query t attends to cache slots in
    [mask_from, slots[t]]. Returns [T, n_heads*hd]."""
    T = Q.shape[0]
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = cfg.kv_repeats
    qh = Q.reshape(T, KV, rep, D).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("tkrd,skd->tkrs", qh, kf) / jnp.sqrt(float(D))
    s_ids = jnp.arange(cfg.max_seq_len)
    mask2 = (s_ids[None, :] <= slots[:, None]) & (s_ids[None, :] >= mask_from)
    if active_window(cfg):
        mask2 &= s_ids[None, :] > slots[:, None] - cfg.sliding_window
    mask = mask2[:, None, None, :]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked rows (pad queries) produce NaN probs; zero them
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("tkrs,skd->tkrd", probs, vf)
    return out.reshape(T, H * D)


def _psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def proj_efforts(effort, cfg: ModelConfig):
    """Per-projection effective efforts under cfg.effort_floors
    (effective = max(effort, floor); fused projections take the max
    floor of their parts). Static python efforts stay python floats so
    the effort>=1 dense fast path keeps working."""
    fl = getattr(cfg, "effort_floors", None) or {}

    def mk(*names):
        f = max((fl.get(n, 0.0) for n in names), default=0.0)
        if not f:
            return effort
        if isinstance(effort, (int, float)):
            return max(float(effort), f)
        return jnp.maximum(jnp.asarray(effort, jnp.float32),
                           jnp.float32(f))

    return {"wq": mk("wq"), "wk": mk("wk"), "wv": mk("wv"),
            "wo": mk("wo"), "w1": mk("w1"), "w3": mk("w3"),
            "w2": mk("w2"), "wqkv": mk("wq", "wk", "wv"),
            "w13": mk("w1", "w3")}


def _ffn(layer: LayerWeights, l, x, effort, cfg: ModelConfig, impl,
         tp_axis=None):
    E = cfg.n_experts
    hid = cfg.hidden_dim
    pe = proj_efforts(effort, cfg)

    def mv(bm, x, expert, name):
        return bucket_matvec(bm, x, pe[name], expert=expert, impl=impl)

    def up(inst):
        if layer.w13 is not None:
            x13 = mv(layer.w13, x, inst, "w13")
            return x13[:hid], x13[hid:]
        return mv(layer.w1, x, inst, "w1"), mv(layer.w3, x, inst, "w3")

    if E == 1:
        x1, x3 = up(l)
        x2 = jax.nn.silu(x1) * x3           # silu kernel, aux.metal silu32b
        return _psum(mv(layer.w2, x2, l, "w2"), tp_axis)
    # MoE: top-2 gating (runNetwork.swift:184-201)
    gate_logits = jnp.dot(x.astype(jnp.bfloat16), layer.ffn_gate[l],
                          preferred_element_type=jnp.float32)
    top_vals, top_idx = jax.lax.top_k(gate_logits, cfg.n_experts_per_tok)
    gates = jax.nn.softmax(top_vals)
    out = jnp.zeros((cfg.dim,), jnp.float32)
    for i in range(cfg.n_experts_per_tok):
        inst = l * E + top_idx[i]
        x1, x3 = up(inst)
        x2 = jax.nn.silu(x1) * x3
        out = out + gates[i] * mv(layer.w2, x2, inst, "w2")
    return _psum(out, tp_axis)


def forward_token(w: ModelWeights, cfg: ModelConfig, token_id, pos,
                  k_cache, v_cache, effort: float = 1.0,
                  impl: str = "auto", tp_axis: Optional[str] = None,
                  collect_h: bool = False, ffn_fn=None,
                  rope_offset=0, mask_from=0,
                  kv_update_fn=None, attn_fn=None):
    """One autoregressive step: embeds token_id at position pos, runs all
    layers, returns (logits [vocab], k_cache, v_cache).

    The per-layer body mirrors runNetwork.swift:124-201 (rmsnorm -> qkv ->
    rope -> attention -> wo -> residual -> rmsnorm -> [gated] FFN).

    tp_axis: when running inside shard_map with Megatron-style sharding
    (parallel/tp.py), cfg must be the LOCAL config and psums are inserted
    after wo and after the FFN down-projection; logits come back
    vocab-sharded.

    ffn_fn: optional override (layer, l, x) -> [dim] replacing the local
    FFN — used by parallel/ep.py to run expert-sharded MoE FFNs.

    rope_offset/mask_from support left-padded prompts (batched prefill):
    pos is the absolute cache slot, pos - rope_offset the rotary position,
    and attention ignores cache slots < mask_from (the pad region).

    kv_update_fn(k_cache, v_cache, l, pos, k [KV,D], v [KV,D]) and
    attn_fn(q, k_cache, v_cache, l, pos) override the KV-cache write and
    the attention read — used by parallel/sp.py (sequence-sharded
    caches), ring_kv_hooks (rolling window cache), and quant_kv_hooks
    (int8 cache as (data, scale) tuples). Hook-provided caches may be
    arbitrary pytrees; the core never indexes them itself.
    """
    h = w.tok_embeddings[token_id].astype(jnp.float32)
    h, k_cache, v_cache, h_layers = forward_layers(
        w, cfg, h, pos, k_cache, v_cache, effort=effort, impl=impl,
        tp_axis=tp_axis, ffn_fn=ffn_fn, rope_offset=rope_offset,
        mask_from=mask_from, kv_update_fn=kv_update_fn, attn_fn=attn_fn)
    h = rms_norm(h, w.norm, cfg.norm_eps)
    logits = head_logits(w, h)
    if collect_h:
        return logits, k_cache, v_cache, h_layers
    return logits, k_cache, v_cache


def forward_layers(w: ModelWeights, cfg: ModelConfig, h, pos, k_cache,
                   v_cache, effort: float = 1.0, impl: str = "auto",
                   tp_axis: Optional[str] = None, ffn_fn=None,
                   rope_offset=0, mask_from=0, kv_update_fn=None,
                   attn_fn=None):
    """The layer stack only (no embedding, no head): h [dim] through
    cfg.n_layers transformer blocks, updating caches [n_layers, S, KV, D].
    Factored out so pipeline parallelism (parallel/pp.py) can run a
    STAGE's layer slice on its resident microbatch."""
    KV, D = cfg.n_kv_heads, cfg.head_dim
    pe = proj_efforts(effort, cfg)

    def mv(bm, x, expert, name):
        return bucket_matvec(bm, x, pe[name], expert=expert, impl=impl)

    q_out = cfg.n_heads * D
    kv_out = KV * D

    def layer_step(carry, l):
        h, k_cache, v_cache = carry
        layer = w.layers
        h_norm = rms_norm(h, layer.attn_norm[l], cfg.norm_eps)
        if layer.wqkv is not None:
            qkv = mv(layer.wqkv, h_norm, l, "wqkv")
            q = qkv[:q_out]
            k = qkv[q_out:q_out + kv_out]
            v = qkv[q_out + kv_out:]
        else:
            q = mv(layer.wq, h_norm, l, "wq")
            k = mv(layer.wk, h_norm, l, "wk")
            v = mv(layer.wv, h_norm, l, "wv")
        rpos = pos - rope_offset
        q = rope_rotate(q.reshape(cfg.n_heads, D), rpos, D,
                        cfg.rope_theta).reshape(-1)
        k = rope_rotate(k.reshape(KV, D), rpos, D, cfg.rope_theta)
        if kv_update_fn is not None:
            k_cache, v_cache = kv_update_fn(k_cache, v_cache, l, pos, k,
                                            v.reshape(KV, D))
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype)[None, None],
                (l, pos, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.reshape(KV, D).astype(v_cache.dtype)[None, None],
                (l, pos, 0, 0))
        if attn_fn is not None:
            # full caches + layer index: hook-owned layouts (ring slots,
            # quantized data+scale tuples, sharded slices) index themselves
            attn = attn_fn(q, k_cache, v_cache, l, pos)
        else:
            attn = _attention(q, k_cache[l], v_cache[l], pos, cfg,
                              mask_from)
        h = h + _psum(mv(layer.wo, attn, l, "wo"), tp_axis)
        f_norm = rms_norm(h, layer.ffn_norm[l], cfg.norm_eps)
        if ffn_fn is not None:
            h = h + ffn_fn(layer, l, f_norm)
        else:
            h = h + _ffn(layer, l, f_norm, effort, cfg, impl, tp_axis)
        return (h, k_cache, v_cache), h

    (h, k_cache, v_cache), h_layers = jax.lax.scan(
        layer_step, (h, k_cache, v_cache),
        jnp.arange(cfg.n_layers, dtype=jnp.int32))
    return h, k_cache, v_cache, h_layers


def _mv_batch(bm, X, efforts, expert, impl):
    """Batched effort matvec: X [B, in] with per-slot traced efforts.

    On TPU with the row-prefix (bucket_size=1) layout this is ONE batched
    MXU kernel launch (kernels/fused_stream.mxu_matvec_batch — slots ride
    the MXU sublane rows); otherwise a vmap of the jnp semantics path.
    """
    B = X.shape[0]
    if impl in ("auto", "pallas") and bm.bucket_size == 1 \
            and jax.default_backend() == "tpu":
        from effort_tpu.kernels.fused_stream import (mxu_matvec_batch,
                                                     supports_fused)
        if supports_fused(bm):
            pad = (-B) % 8
            Xp = jnp.pad(X, ((0, pad), (0, 0)))
            ep = jnp.pad(jnp.asarray(efforts, jnp.float32), (0, pad))
            return mxu_matvec_batch(bm, Xp, ep, expert)[:B]
    impl_tok = "jnp" if impl in ("auto", "pallas", "stream") else impl
    return jax.vmap(lambda x, e: bucket_matvec_jnp_traced(
        bm, x, e, expert, impl_tok))(X, jnp.asarray(efforts, jnp.float32))


def bucket_matvec_jnp_traced(bm, v, effort, expert, impl):
    from effort_tpu.ops.bucketmul import bucket_matvec_jnp
    if impl == "dense":
        e = jnp.asarray(expert, jnp.int32)
        return jnp.dot(bm.permute_v(v, e).astype(jnp.bfloat16),
                       bm.dense[e], preferred_element_type=jnp.float32)
    return bucket_matvec_jnp(bm, v, effort, expert, exact_cutoff=False)


def quantize_kv_rows(x):
    """x [..., D] -> (int8 [..., D], scale [...]) with symmetric absmax
    scales over the last axis (shared with the batch int8 cache)."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _attention_q8(q, kd, ks, vd, vs, pos, cfg: ModelConfig, mask_from):
    """int8 attention read for one slot: kd/vd [S, KV, D] int8,
    ks/vs [S, KV] scales."""
    kf = kd.astype(jnp.float32) * ks[..., None]
    vf = vd.astype(jnp.float32) * vs[..., None]
    t_ids = jnp.arange(cfg.max_seq_len)
    live = (t_ids <= pos) & (t_ids >= mask_from)
    if active_window(cfg):
        live &= t_ids > pos - cfg.sliding_window
    return _attn_core(q, kf, vf, live, cfg)


def forward_token_batch(w: ModelWeights, cfg: ModelConfig, toks, pos,
                        k_cache, v_cache, efforts, offs=None,
                        impl: str = "auto", kv_quant: bool = False):
    """Batched decode step: B slots advance together.

    toks/pos/efforts: [B]; caches [L, B, S, KV, D]; offs [B] left-pad
    offsets. Per-slot effort is TRACED (one compiled step serves any
    effort mix; a slot with effort 0 contributes nothing to the weight
    reads). Returns (logits [B, vocab], k_cache, v_cache).

    kv_quant=True: caches are int8 (data, scale) tuples per side —
    (kd [L,B,S,KV,D] int8, ks [L,B,S,KV] f32) — halving the serving KV
    HBM (the batch cache is B times the single-stream one).
    """
    B = toks.shape[0]
    KV, D = cfg.n_kv_heads, cfg.head_dim
    offs = jnp.zeros((B,), jnp.int32) if offs is None else offs
    efforts = jnp.asarray(efforts, jnp.float32)
    pe_b = proj_efforts(efforts, cfg)    # per-slot vectors, floored
    H = w.tok_embeddings[toks].astype(jnp.float32)          # [B, dim]
    rope = jax.vmap(rope_rotate, in_axes=(0, 0, None, None))

    q_out = cfg.n_heads * D
    kv_out = KV * D

    def _upd_data(cache_l, rows, dtype=None):
        # cache_l [B, S, ...]; rows [B, ...] written at per-slot pos
        return jax.vmap(lambda c, r, p: jax.lax.dynamic_update_slice(
            c, r.astype(c.dtype)[None], (p,) + (0,) * (c.ndim - 1)))(
            cache_l, rows, pos)

    def _upd_layer(cache, l, new_l):
        return jax.lax.dynamic_update_slice(
            cache, new_l[None], (l,) + (0,) * (cache.ndim - 1))

    def layer_step(carry, l):
        Hc, k_cache, v_cache = carry
        layer = w.layers
        Hn = rms_norm(Hc, layer.attn_norm[l], cfg.norm_eps)
        if layer.wqkv is not None:
            QKV = _mv_batch(layer.wqkv, Hn, pe_b["wqkv"], l, impl)
            Q = QKV[:, :q_out]
            K = QKV[:, q_out:q_out + kv_out]
            V = QKV[:, q_out + kv_out:]
        else:
            Q = _mv_batch(layer.wq, Hn, pe_b["wq"], l, impl)
            K = _mv_batch(layer.wk, Hn, pe_b["wk"], l, impl)
            V = _mv_batch(layer.wv, Hn, pe_b["wv"], l, impl)
        rpos = pos - offs
        Q = rope(Q.reshape(B, cfg.n_heads, D), rpos, D,
                 cfg.rope_theta).reshape(B, -1)
        K = rope(K.reshape(B, KV, D), rpos, D, cfg.rope_theta)
        V = V.reshape(B, KV, D)
        if kv_quant:
            (kd, ks), (vd, vs) = k_cache, v_cache
            kq, ksc = quantize_kv_rows(K.astype(jnp.float32))
            vq, vsc = quantize_kv_rows(V.astype(jnp.float32))
            kd_l = _upd_data(kd[l], kq)
            ks_l = _upd_data(ks[l], ksc)
            vd_l = _upd_data(vd[l], vq)
            vs_l = _upd_data(vs[l], vsc)
            k_cache = (_upd_layer(kd, l, kd_l), _upd_layer(ks, l, ks_l))
            v_cache = (_upd_layer(vd, l, vd_l), _upd_layer(vs, l, vs_l))
            attn = jax.vmap(_attention_q8,
                            in_axes=(0, 0, 0, 0, 0, 0, None, 0))(
                Q, kd_l, ks_l, vd_l, vs_l, pos, cfg, offs)
        else:
            kc_l = _upd_data(k_cache[l], K)
            vc_l = _upd_data(v_cache[l], V)
            k_cache = _upd_layer(k_cache, l, kc_l)
            v_cache = _upd_layer(v_cache, l, vc_l)
            attn = jax.vmap(_attention, in_axes=(0, 0, 0, 0, None, 0))(
                Q, kc_l, vc_l, pos, cfg, offs)
        Hc = Hc + _mv_batch(layer.wo, attn, pe_b["wo"], l, impl)
        Fn = rms_norm(Hc, layer.ffn_norm[l], cfg.norm_eps)
        if cfg.n_experts == 1:
            if layer.w13 is not None:
                X13 = _mv_batch(layer.w13, Fn, pe_b["w13"], l, impl)
                x1 = X13[:, :cfg.hidden_dim]
                x3 = X13[:, cfg.hidden_dim:]
            else:
                x1 = _mv_batch(layer.w1, Fn, pe_b["w1"], l, impl)
                x3 = _mv_batch(layer.w3, Fn, pe_b["w3"], l, impl)
            x2 = jax.nn.silu(x1) * x3
            Hc = Hc + _mv_batch(layer.w2, x2, pe_b["w2"], l, impl)
        else:
            impl_tok = "jnp" if impl in ("auto", "pallas") else impl
            Hc = Hc + jax.vmap(
                lambda x, e: _ffn(w.layers, l, x, e, cfg, impl_tok))(
                    Fn, efforts)
        return (Hc, k_cache, v_cache), None

    (H, k_cache, v_cache), _ = jax.lax.scan(
        layer_step, (H, k_cache, v_cache),
        jnp.arange(cfg.n_layers, dtype=jnp.int32))
    H = rms_norm(H, w.norm, cfg.norm_eps)
    logits = head_logits_batch(w, H)
    return logits, k_cache, v_cache


def head_logits_batch(w: ModelWeights, H: jax.Array) -> jax.Array:
    """Batched decode LM head: H [B, dim] -> [B, vocab] f32 (per-row
    activation scale; see head_logits)."""
    if w.output_q is None:
        return jnp.dot(H.astype(jnp.bfloat16), w.output,
                       preferred_element_type=jnp.float32)
    B = H.shape[0]
    vm = jnp.max(jnp.abs(H), axis=1, keepdims=True) / 127.0 + 1e-30
    Hi = jnp.round(H / vm).astype(jnp.int8)
    Y = jax.lax.dot_general(Hi, w.output_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    Y = Y.astype(jnp.float32) * (w.output_qscale[None, :] * vm)
    if w.output is not None:
        _, top_i = jax.lax.top_k(Y, _HEAD_RESCORE_K)        # [B, K]
        cols = jnp.take(w.output, top_i.reshape(-1), axis=1).reshape(
            -1, B, _HEAD_RESCORE_K)                         # [dim, B, K]
        exact = jnp.einsum("bd,dbk->bk", H.astype(jnp.bfloat16),
                           cols.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        Y = jax.vmap(lambda y, i, e: y.at[i].set(e))(Y, top_i, exact)
    return Y


def _ffn_seq(layer: LayerWeights, l, X, effort, cfg: ModelConfig, impl,
             tp_axis=None):
    """Batched FFN for prefill. Dense models use batched matmuls; MoE
    vmaps the per-token top-2 path (each token keeps its own routing and
    effort selection)."""
    from effort_tpu.ops.bucketmul import bucket_matmul
    if cfg.n_experts == 1:
        pe = proj_efforts(effort, cfg)

        def mm(bm, X, expert, name):
            return bucket_matmul(bm, X, pe[name], expert=expert, impl=impl)

        if layer.w13 is not None:
            X13 = mm(layer.w13, X, l, "w13")
            x1, x3 = X13[:, :cfg.hidden_dim], X13[:, cfg.hidden_dim:]
        else:
            x1 = mm(layer.w1, X, l, "w1")
            x3 = mm(layer.w3, X, l, "w3")
        x2 = jax.nn.silu(x1) * x3
        return _psum(mm(layer.w2, x2, l, "w2"), tp_axis)
    impl_tok = "jnp" if impl in ("auto", "pallas", "stream") else impl
    return jax.vmap(
        lambda x: _ffn(layer, l, x, effort, cfg, impl_tok, tp_axis))(X)


def forward_seq(w: ModelWeights, cfg: ModelConfig, token_ids, k_cache,
                v_cache, start_slot=0, rope_offset=0, mask_from=0,
                effort: float = 1.0, impl: str = "auto",
                tp_axis: Optional[str] = None, attn_impl: str = "auto"):
    """Batched prefill: runs T tokens through all layers in one pass.

    The reference has no prefill path at all — prompt tokens go through the
    same one-token-at-a-time loop as decode (runNetwork.swift:113). On TPU
    prefill is compute-bound, so this processes the whole prompt with MXU
    matmuls ([T, in] @ [in, out]) and batched causal attention.

    token_ids: [T] int32 occupying cache slots start_slot..start_slot+T-1.
    rope_offset/mask_from: see forward_token (left-padded prompts).
    attn_impl: "flash" = Pallas blockwise kernel (kernels/flash_attention),
    "xla" = materialized-scores einsum, "auto" = flash on TPU when shapes
    tile. Returns (logits [T, vocab], k_cache, v_cache).
    """
    from effort_tpu.ops.bucketmul import bucket_matmul
    T = token_ids.shape[0]
    if attn_impl == "auto":
        tiles = (cfg.head_dim % 128 == 0 and cfg.max_seq_len % 128 == 0
                 and (T <= 128 or T % 128 == 0))
        attn_impl = ("flash" if jax.default_backend() == "tpu" and tiles
                     else "xla")
    KV, D = cfg.n_kv_heads, cfg.head_dim
    X = w.tok_embeddings[token_ids].astype(jnp.float32)      # [T, dim]
    slots = start_slot + jnp.arange(T, dtype=jnp.int32)
    rpos = slots - rope_offset
    pe = proj_efforts(effort, cfg)

    def mm(bm, X, expert, name):
        return bucket_matmul(bm, X, pe[name], expert=expert, impl=impl)

    rope = jax.vmap(rope_rotate, in_axes=(0, 0, None, None))

    q_out = cfg.n_heads * D
    kv_out = KV * D

    def layer_step(carry, l):
        X, k_cache, v_cache = carry
        layer = w.layers
        Xn = rms_norm(X, layer.attn_norm[l], cfg.norm_eps)
        if layer.wqkv is not None:
            QKV = mm(layer.wqkv, Xn, l, "wqkv")              # [T, q+2kv]
            Q = QKV[:, :q_out]
            K = QKV[:, q_out:q_out + kv_out]
            V = QKV[:, q_out + kv_out:]
        else:
            Q = mm(layer.wq, Xn, l, "wq")                    # [T, H*D]
            K = mm(layer.wk, Xn, l, "wk")
            V = mm(layer.wv, Xn, l, "wv")
        Q = rope(Q.reshape(T, cfg.n_heads, D), rpos, D,
                 cfg.rope_theta).reshape(T, -1)
        K = rope(K.reshape(T, KV, D), rpos, D, cfg.rope_theta)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, K.astype(k_cache.dtype)[None], (l, start_slot, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, V.reshape(T, KV, D).astype(v_cache.dtype)[None],
            (l, start_slot, 0, 0))
        if attn_impl == "flash":
            from effort_tpu.kernels.flash_attention import \
                flash_attention_seq
            attn = flash_attention_seq(Q, k_cache[l], v_cache[l],
                                       start_slot, mask_from,
                                       cfg.n_heads, D,
                                       window=active_window(cfg))
        else:
            attn = _attention_seq(Q, k_cache[l], v_cache[l], slots,
                                  mask_from, cfg)
        X = X + _psum(mm(layer.wo, attn, l, "wo"), tp_axis)
        Fn = rms_norm(X, layer.ffn_norm[l], cfg.norm_eps)
        X = X + _ffn_seq(layer, l, Fn, effort, cfg, impl, tp_axis)
        return (X, k_cache, v_cache), None

    (X, k_cache, v_cache), _ = jax.lax.scan(
        layer_step, (X, k_cache, v_cache),
        jnp.arange(cfg.n_layers, dtype=jnp.int32))

    X = rms_norm(X, w.norm, cfg.norm_eps)
    logits = jnp.dot(X.astype(jnp.bfloat16), w.output,
                     preferred_element_type=jnp.float32)
    return logits, k_cache, v_cache


def synth_raw_weights(cfg: ModelConfig, seed: int = 0, scale: float = 0.02,
                      rms_m=None, rms_f=None, lazy: bool = False) -> dict:
    """Random dense weight tensors (on device — the sandbox host<->TPU
    tunnel moves ~6.5 MB/s, so host generation is not viable).

    rms_m [dim] / rms_f [hidden] optionally IMPRINT persistent-outlier
    activation structure (the empirically-universal LLM pattern, cf.
    LLM.int8 outlier dims): every producer writing into a space scales
    its output columns by that space's rms, so the model's real
    activations exhibit the per-dim magnitudes calibration assumes.

    lazy=True returns the projection entries as (maker, n_inst, in, out)
    tuples that generate instance slices on demand — a 32-layer model's
    full-precision tensors (~28 GB f32) cannot be materialized at once;
    assemble_weights bucketizes them chunk by chunk.
    """
    key = jax.random.key(seed)
    keys = iter(jax.random.split(key, 16))
    L, E, dim, hid = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.hidden_dim
    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim

    def mk(n_inst, in_d, out_d, col_scale=None):
        k = next(keys)

        def gen(ks, n):
            wt = jax.random.normal(ks, (n, in_d, out_d),
                                   jnp.float32) * scale
            if col_scale is not None:
                wt = wt * col_scale[None, None, :]
            return wt
        # lazy only when the full f32 tensor is too big to materialize;
        # the eager path draws from k directly so the key-draw recipe
        # stays identical to the parallel weight builders
        # (parallel/tp.py make_tp_weights "same key-draw order" contract)
        if lazy and n_inst * in_d * out_d * 4 > 2**29:
            return (lambda s, n: gen(jax.random.fold_in(k, s), n),
                    n_inst, in_d, out_d)
        return gen(k, n_inst)

    raw = dict(
        wq=mk(L, dim, q_out),
        wk=mk(L, dim, kv_out),
        wv=mk(L, dim, kv_out),
        wo=mk(L, q_out, dim, rms_m),
        w1=mk(L * E, dim, hid, rms_f),
        w2=mk(L * E, hid, dim, rms_m),
        w3=mk(L * E, dim, hid, rms_f),
        ffn_gate=(jax.random.normal(next(keys), (L, dim, E)) * scale
                  if E > 1 else None),
        tok_embeddings=jax.random.normal(
            next(keys), (cfg.vocab_size, dim)) * scale
        * (rms_m[None, :] if rms_m is not None else 1.0),
        output=jax.random.normal(next(keys), (dim, cfg.vocab_size)) * scale,
        attn_norm=jnp.ones((L, dim), jnp.float32),
        ffn_norm=jnp.ones((L, dim), jnp.float32),
        norm=jnp.ones((dim,), jnp.float32),
    )
    return raw


def _concat_raw(entries):
    """Concatenate raw weight entries along the output-column axis.

    Entries are [n_inst, in, out] arrays or lazy (maker, n_inst, in, out)
    tuples (synth_raw_weights); the result follows the same convention so
    chunked bucketization still bounds peak HBM."""
    def norm(e):
        if isinstance(e, tuple):
            return e
        return (partial(jax.lax.dynamic_slice_in_dim, e, axis=0),) \
            + tuple(e.shape)
    mks = [norm(e) for e in entries]
    n_inst, in_d = mks[0][1], mks[0][2]
    assert all(m[1] == n_inst and m[2] == in_d for m in mks)
    out_total = sum(m[3] for m in mks)

    def maker(s, n):
        return jnp.concatenate([m[0](s, n) for m in mks], axis=2)
    return (maker, n_inst, in_d, out_total)


def assemble_weights(raw: dict, cfg: ModelConfig, bcfg: BucketConfig,
                     keep_dense: bool = False, rms_m=None, rms_f=None,
                     bake: bool = True, fuse: bool = False,
                     percent_load: float = 1.0) -> ModelWeights:
    """Bucketize raw dense tensors into ModelWeights.

    fuse=True builds FUSED q|k|v and w1|w3 projections (one effort kernel
    launch + one shared selection each) and leaves the unfused fields
    None — the decode fast path; see LayerWeights.wqkv.

    percent_load < 1 applies truncated loading PER CHUNK during assembly
    (weights.truncate_bucketed), so the full-size model is never resident
    — required to build a truncated model whose full size exceeds HBM
    (the whole point of the reference's percentLoad, loader.swift:50).

    With rms calibration and bake=True, the WHOLE-MODEL RELAYOUT pass
    runs: the residual space is permuted once (pi_m, descending rms) and
    each FFN hidden space likewise (pi_f), absorbed entirely into weights:

      pi_m: tok_embeddings cols, wq/wk/wv/w1/w3 input rows, wo/w2 output
            cols, norm weights, lm-head rows.
      pi_f: w1/w3 output cols, w2 input rows.

    The forward pass is UNCHANGED and no runtime gather exists anywhere
    (vs ~25us per matvec for the runtime seg_order permute). wo's input
    (attention output) stays unpermuted in this pass.
    bake=False keeps the runtime-permute (seg_order) form instead — used
    for equivalence tests.
    """
    from effort_tpu.ops.bucketize import calib_row_order
    from effort_tpu.ops.layouts import concat_bucketed
    pi_m = calib_row_order(rms_m) if rms_m is not None else None
    pi_f = calib_row_order(rms_f) if rms_f is not None else None

    def bucketed(wt, in_rms=None, in_pi=None, out_pi=None):
        """wt: [n_inst, in, out] array OR (maker, n_inst, in_d, out_d)
        where maker(start, n) yields that instance slice — chunked so
        full-precision sources never exceed ~1 GB of HBM at once."""
        if isinstance(wt, tuple):
            maker, n_inst, in_d, out_d = wt
        else:
            maker = partial(jax.lax.dynamic_slice_in_dim, wt, axis=0)
            n_inst, in_d, out_d = wt.shape
        from effort_tpu.ops.bucketize import pick_chunk_rows
        b = dataclasses.replace(
            bcfg, chunk_rows=pick_chunk_rows(bcfg, in_d, out_d))
        chunk = max(1, int(2**30 // (in_d * out_d * 4)))
        parts = []
        for s in range(0, n_inst, chunk):
            wt_c = maker(s, min(chunk, n_inst - s))
            if bake:
                p = bucketize(wt_c, b, keep_dense=keep_dense,
                              in_perm=in_pi, out_perm=out_pi)
            else:
                p = bucketize(wt_c, b, keep_dense=keep_dense,
                              act_rms=in_rms, perm_segment=1)
            if percent_load < 1.0:
                from effort_tpu.models.weights import truncate_bucketed
                p = truncate_bucketed(p, percent_load)
            parts.append(p)
        return concat_bucketed(parts)

    out_head = raw["output"]
    emb = raw["tok_embeddings"]
    attn_norm, ffn_norm, norm = (raw["attn_norm"], raw["ffn_norm"],
                                 raw["norm"])
    if bake and pi_m is not None:
        emb = emb[:, pi_m]
        out_head = out_head[pi_m, :]
        attn_norm = attn_norm[:, pi_m]
        ffn_norm = ffn_norm[:, pi_m]
        norm = norm[pi_m]

    if fuse:
        # out_perm must act within each fused half: w1 cols and w3 cols
        # each carry the hidden-space permutation pi_f
        pi_13 = (None if pi_f is None else
                 jnp.concatenate([pi_f, pi_f + cfg.hidden_dim]))
        proj = dict(
            wq=None, wk=None, wv=None, w1=None, w3=None,
            wqkv=bucketed(_concat_raw([raw["wq"], raw["wk"], raw["wv"]]),
                          rms_m, pi_m),
            w13=bucketed(_concat_raw([raw["w1"], raw["w3"]]),
                         rms_m, pi_m, pi_13),
        )
    else:
        proj = dict(
            wq=bucketed(raw["wq"], rms_m, pi_m),
            wk=bucketed(raw["wk"], rms_m, pi_m),
            wv=bucketed(raw["wv"], rms_m, pi_m),
            w1=bucketed(raw["w1"], rms_m, pi_m, pi_f),
            w3=bucketed(raw["w3"], rms_m, pi_m, pi_f),
        )
    layers = LayerWeights(
        attn_norm=attn_norm,
        ffn_norm=ffn_norm,
        wo=bucketed(raw["wo"], None, None,
                    pi_m if bake else None),
        w2=bucketed(raw["w2"], rms_f, pi_f, pi_m),
        ffn_gate=(None if raw["ffn_gate"] is None else
                  (raw["ffn_gate"][:, pi_m, :] if bake and pi_m is not None
                   else raw["ffn_gate"]).astype(jnp.bfloat16)),
        **proj,
    )
    return ModelWeights(
        tok_embeddings=emb.astype(jnp.bfloat16),
        norm=norm,
        output=out_head.astype(jnp.bfloat16),
        layers=layers,
    )


def tile_layers(w: ModelWeights, cfg1: ModelConfig,
                n_layers: int) -> ModelWeights:
    """Replicate a 1-layer model's layer stack to n_layers DISTINCT HBM
    copies (device-side tile; no re-generation, no re-bucketization).

    Benchmark utility: synthetic full-depth models cost minutes of
    on-device RNG + bucketize sorting to materialize (it scales with
    depth); tiling one layer keeps the byte volume, layouts, and
    selection-count distribution of a real model at ~1/depth the init
    cost. Layer CONTENTS are identical — fine for timing (same HBM
    traffic), meaningless for quality evals."""
    assert cfg1.n_layers == 1, "tile_layers expects a 1-layer source"
    from effort_tpu.ops.layouts import concat_bucketed
    L = n_layers
    lw = w.layers
    repl = {}
    for f in ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wqkv", "w13"):
        bm = getattr(lw, f)
        if bm is not None:
            repl[f] = concat_bucketed([bm] * L)
    repl["attn_norm"] = jnp.tile(lw.attn_norm, (L, 1))
    repl["ffn_norm"] = jnp.tile(lw.ffn_norm, (L, 1))
    if lw.ffn_gate is not None:
        repl["ffn_gate"] = jnp.tile(lw.ffn_gate, (L, 1, 1))
    return dataclasses.replace(
        w, layers=dataclasses.replace(lw, **repl))


def init_random_weights(cfg: ModelConfig, bcfg: BucketConfig,
                        seed: int = 0, keep_dense: bool = False,
                        scale: float = 0.02, calibrate: bool = False,
                        rms_sigma: float = 1.2,
                        fuse: bool = False,
                        percent_load: float = 1.0) -> ModelWeights:
    """Random-weight model (no public checkpoints ship with this repo);
    used by tests and synthetic benchmarks.

    calibrate=True imprints persistent-outlier activation structure
    (lognormal per-dim rms) into the weights AND runs the whole-model
    baked-relayout pass on it (see assemble_weights).
    """
    rms_m = rms_f = None
    if calibrate:
        key = jax.random.key(seed + 777)
        k1, k2 = jax.random.split(key)
        rms_m = jnp.exp(jax.random.normal(k1, (cfg.dim,)) * rms_sigma)
        rms_f = jnp.exp(jax.random.normal(k2, (cfg.hidden_dim,))
                        * rms_sigma)
    # lazy generation kicks in per matrix above the size threshold; small
    # (test-scale) matrices keep the eager key-draw recipe the parallel
    # weight builders replicate
    raw = synth_raw_weights(cfg, seed=seed, scale=scale, rms_m=rms_m,
                            rms_f=rms_f, lazy=True)
    return assemble_weights(raw, cfg, bcfg, keep_dense=keep_dense,
                            rms_m=rms_m, rms_f=rms_f, fuse=fuse,
                            percent_load=percent_load)
