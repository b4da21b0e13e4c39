"""Minimal on-TPU trainer for Mistral-family models.

The reference ships no trainer (it is an inference engine for published
checkpoints). This sandbox ships no checkpoints, so the effort-quality
story (agreement/NLL flat down the effort scale — the reference's
ryc0.4/ryc0.5b charts, benchmarks/benchmark.swift:52-156) can only be
demonstrated on weights trained HERE. This module trains a
small-but-real byte-level Mistral (same architecture the inference
stack serves: rms_norm/RoPE/GQA/SwiGLU semantics of
models/transformer.py, verified token-for-token by
tests/test_train.py), exports HF-layout safetensors, and the normal
convert -> load -> eval pipeline takes it from there.

Design: pure-functional param pytree + jitted update; the whole corpus
lives on device (host->device rides a ~6.5 MB/s tunnel here, so batches
are CUT ON DEVICE with jax.random inside the step); lax.scan runs
chunks of steps per host round-trip.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from effort_tpu.config import ModelConfig


# --------------------------------------------------------------------------
# params
# --------------------------------------------------------------------------

def init_params(cfg: ModelConfig, seed: int = 0,
                scale: float = 0.02) -> Dict:
    """HF-layout parameter pytree: linear weights are [out_features,
    in_features] stacked over layers, so export_hf writes them verbatim
    and convert_checkpoint's transpose convention applies unchanged."""
    key = jax.random.key(seed)
    ks = iter(jax.random.split(key, 16))
    D, H, V, L = cfg.dim, cfg.hidden_dim, cfg.vocab_size, cfg.n_layers
    E = cfg.n_experts
    q_out = cfg.n_heads * cfg.head_dim
    kv_out = cfg.n_kv_heads * cfg.head_dim

    def w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    ffn_shape = (L, H, D) if E == 1 else (L, E, H, D)
    ffn_shape_dn = (L, D, H) if E == 1 else (L, E, D, H)
    params = {
        "embed": w(next(ks), (V, D)),
        "norm": jnp.ones((D,), jnp.float32),
        "lm_head": w(next(ks), (V, D)),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "ffn_norm": jnp.ones((L, D), jnp.float32),
            "wq": w(next(ks), (L, q_out, D)),
            "wk": w(next(ks), (L, kv_out, D)),
            "wv": w(next(ks), (L, kv_out, D)),
            "wo": w(next(ks), (L, D, q_out)),
            "w1": w(next(ks), ffn_shape),
            "w2": w(next(ks), ffn_shape_dn),
            "w3": w(next(ks), ffn_shape),
        },
    }
    if E > 1:
        params["layers"]["gate"] = w(next(ks), (L, D, E))
    return params


# --------------------------------------------------------------------------
# forward (training: [B, T] batched, causal) — semantics must match
# models/transformer.py exactly (tests/test_train.py asserts logits parity)
# --------------------------------------------------------------------------

def _rms_norm(x, weight, eps):
    inv = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return x * inv * weight


def _rope(x, pos, head_dim, theta):
    """x [..., T, Hn, D]; pos [T]. Rotate-half, matching
    transformer.rope_rotate (HF weight convention)."""
    h = head_dim // 2
    freqs = theta ** (-jnp.arange(0, h, dtype=jnp.float32) / h)
    angle = pos.astype(jnp.float32)[:, None] * freqs[None, :]  # [T, h]
    cos = jnp.cos(angle)[:, None, :]                          # [T, 1, h]
    sin = jnp.sin(angle)[:, None, :]
    x1, x2 = x[..., :h], x[..., h:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x1 * sin + x2 * cos], axis=-1)


def forward(params: Dict, cfg: ModelConfig, toks: jax.Array) -> jax.Array:
    """toks [B, T] int32 -> logits [B, T, vocab] f32 (causal)."""
    B, T = toks.shape
    D, KV, rep = cfg.head_dim, cfg.n_kv_heads, cfg.kv_repeats
    pos = jnp.arange(T)
    h = params["embed"][toks]                                # [B, T, dim]
    causal = pos[None, :] <= pos[:, None]                    # [T, T]
    if cfg.sliding_window:
        causal &= pos[None, :] > pos[:, None] - cfg.sliding_window
    lp = params["layers"]

    def layer(h, l):
        hn = _rms_norm(h, lp["attn_norm"][l], cfg.norm_eps)
        q = jnp.einsum("btd,od->bto", hn, lp["wq"][l])
        k = jnp.einsum("btd,od->bto", hn, lp["wk"][l])
        v = jnp.einsum("btd,od->bto", hn, lp["wv"][l])
        q = _rope(q.reshape(B, T, KV * rep, D), pos, D, cfg.rope_theta)
        k = _rope(k.reshape(B, T, KV, D), pos, D, cfg.rope_theta)
        v = v.reshape(B, T, KV, D)
        qh = q.reshape(B, T, KV, rep, D)
        scores = jnp.einsum("btkrd,bskd->bkrts", qh, k) / jnp.sqrt(
            float(D))
        scores = jnp.where(causal[None, None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bkrts,bskd->btkrd", probs, v)
        attn = attn.reshape(B, T, KV * rep * D)
        h = h + jnp.einsum("bto,do->btd", attn, lp["wo"][l])
        fn = _rms_norm(h, lp["ffn_norm"][l], cfg.norm_eps)
        if cfg.n_experts == 1:
            x1 = jnp.einsum("btd,hd->bth", fn, lp["w1"][l])
            x3 = jnp.einsum("btd,hd->bth", fn, lp["w3"][l])
            h = h + jnp.einsum("bth,dh->btd", jax.nn.silu(x1) * x3,
                               lp["w2"][l])
            return h, 0.0
        # MoE: top-k gating, ALL experts computed densely (training-time
        # only — tiny expert counts make this cheaper than a2a routing
        # machinery on one chip; serving uses the sparse top-2 path).
        # Differentiable through the kept gate probs; Switch-style
        # load-balance aux loss returned per layer.
        E, k = cfg.n_experts, cfg.n_experts_per_tok
        gl = jnp.einsum("btd,de->bte", fn, lp["gate"][l])      # [B,T,E]
        top_vals, top_idx = jax.lax.top_k(gl, k)
        gates = jax.nn.softmax(top_vals, axis=-1)              # [B,T,k]
        w_e = jnp.sum(jax.nn.one_hot(top_idx, E) * gates[..., None],
                      axis=2)                                  # [B,T,E]
        x1 = jnp.einsum("btd,ehd->bteh", fn, lp["w1"][l])
        x3 = jnp.einsum("btd,ehd->bteh", fn, lp["w3"][l])
        y = jnp.einsum("bteh,edh->bted", jax.nn.silu(x1) * x3,
                       lp["w2"][l])                            # [B,T,E,D]
        h = h + jnp.sum(y * w_e[..., None], axis=2)
        # aux: E * sum_e f_e * p_e (f = routed fraction, p = mean prob)
        probs = jax.nn.softmax(gl, axis=-1)
        f_e = jnp.mean(jnp.sum(jax.nn.one_hot(top_idx, E), axis=2),
                       axis=(0, 1)) / k
        p_e = jnp.mean(probs, axis=(0, 1))
        aux = E * jnp.sum(f_e * p_e)
        return h, aux

    # remat each layer: with [B,H,T,T] score tensors, saving every
    # layer's attention activations for backward blows HBM at training
    # dims; recomputing them is the standard TPU trade (HBM is the
    # bottleneck, MXU FLOPs are cheap).
    h, aux = jax.lax.scan(jax.checkpoint(layer), h,
                          jnp.arange(cfg.n_layers))
    h = _rms_norm(h, params["norm"], cfg.norm_eps)
    logits = jnp.einsum("btd,vd->btv", h, params["lm_head"])
    return logits, jnp.mean(aux)


def next_token_loss(params, cfg, toks, aux_coef: float = 0.01):
    """Mean next-token cross-entropy over [B, T] batches (nats), plus
    aux_coef * load-balance loss for MoE configs."""
    logits, aux = forward(params, cfg, toks[:, :-1])
    targets = toks[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None],
                               axis=-1)[..., 0]
    loss = jnp.mean(logz - gold)
    if cfg.n_experts > 1:
        loss = loss + aux_coef * aux
    return loss


# --------------------------------------------------------------------------
# training loop
# --------------------------------------------------------------------------

@dataclasses.dataclass
class TrainConfig:
    batch: int = 32
    seq_len: int = 512
    steps: int = 2000
    lr: float = 3e-4
    warmup: int = 100
    weight_decay: float = 0.1
    clip_norm: float = 1.0
    scan_chunk: int = 25      # jitted steps per host round-trip
    seed: int = 0
    holdout_frac: float = 0.02
    # Adam first-moment dtype. f32 params+AdamW+grads cost 16 bytes/param,
    # capping one 16 GB chip at ~500M params; "bfloat16" drops mu to 2
    # bytes and (with the donated run_chunk buffers) lifts the ceiling to
    # ~1B — the wordlm-1b concentration rung needs this.
    mu_dtype: str = "float32"
    # Fixed sink token written at position 0 of every training crop
    # (None = raw crops). Attention-sink tokens are the documented
    # trigger for massive residual-stream activations ("Massive
    # Activations in LLMs", Sun et al. 2024) — the concentration the
    # streaming kernel's speedup feeds on; random mid-document crops
    # never show the model a sequence start, so without this the sink
    # mechanism cannot form.
    bos_id: Optional[int] = None


def _sample_batch(corpus, key, batch, seq_len, lo, hi, bos_id=None):
    """Random [batch, seq_len] crops of corpus[lo:hi], cut on device."""
    starts = jax.random.randint(key, (batch,), lo, hi - seq_len - 1)
    idx = starts[:, None] + jnp.arange(seq_len)
    toks = jnp.take(corpus, idx, axis=0).astype(jnp.int32)
    if bos_id is not None:
        toks = toks.at[:, 0].set(jnp.int32(bos_id))
    return toks


def train(cfg: ModelConfig, corpus: np.ndarray,
          tcfg: Optional[TrainConfig] = None, params: Optional[Dict] = None,
          progress=print, deadline: Optional[float] = None):
    """Train a byte/token LM on `corpus` (1-D int array of token ids).

    Returns (params, history) where history is a list of (step, train
    loss, holdout loss). The tail holdout_frac of the corpus is held out
    for eval and never sampled for training.

    `deadline`: absolute time.time() after which no further chunk starts
    — the trained params at that point are returned with however many
    steps ran (history[-1][0] is the actual count). Lets budgeted
    callers (bench.py's clean-tree regen) train as much as their phase
    watchdog allows instead of gambling on a fixed step count."""
    import time
    import optax
    tcfg = tcfg or TrainConfig()
    # honor step counts below one scan chunk (and make history[-1][0]
    # mean what it says); warmup cannot exceed the run
    tcfg = dataclasses.replace(
        tcfg, scan_chunk=max(1, min(tcfg.scan_chunk, tcfg.steps)),
        warmup=min(tcfg.warmup, max(0, tcfg.steps - 1)))
    corpus_d = jnp.asarray(np.asarray(corpus, np.int32))
    n = int(corpus_d.shape[0])
    split = int(n * (1.0 - tcfg.holdout_frac))
    params = params if params is not None else init_params(
        cfg, seed=tcfg.seed)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, tcfg.warmup, tcfg.steps, tcfg.lr * 0.1)
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.clip_norm),
        optax.adamw(sched, weight_decay=tcfg.weight_decay,
                    mu_dtype=jnp.dtype(tcfg.mu_dtype)))
    opt_state = opt.init(params)

    # donate params+opt_state: XLA reuses their buffers for the outputs,
    # halving the steady-state footprint of the train state
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, key, step0):
        def one(carry, i):
            params, opt_state = carry
            bkey = jax.random.fold_in(key, i)
            toks = _sample_batch(corpus_d, bkey, tcfg.batch,
                                 tcfg.seq_len, 0, split,
                                 bos_id=tcfg.bos_id)
            loss, grads = jax.value_and_grad(next_token_loss)(
                params, cfg, toks)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), step0 + jnp.arange(tcfg.scan_chunk))
        return params, opt_state, losses

    @jax.jit
    def eval_loss(params, key):
        toks = _sample_batch(corpus_d, key, tcfg.batch, tcfg.seq_len,
                             split, n, bos_id=tcfg.bos_id)
        return next_token_loss(params, cfg, toks)

    key = jax.random.key(tcfg.seed + 1)
    history = []
    step = 0
    while step < tcfg.steps and (step == 0 or deadline is None
                                 or time.time() < deadline):
        params, opt_state, losses = run_chunk(
            params, opt_state, jax.random.fold_in(key, step),
            jnp.int32(step))
        step += tcfg.scan_chunk
        tl = float(losses[-1])
        hl = float(eval_loss(params, jax.random.fold_in(
            key, 2**30 + step)))
        history.append((step, tl, hl))
        progress(f"step {step:5d}  train {tl:.4f}  holdout {hl:.4f}")
    return params, history


# --------------------------------------------------------------------------
# export: HF-layout safetensors that convert_checkpoint consumes
# --------------------------------------------------------------------------

def export_hf(params: Dict, cfg: ModelConfig, dst_dir: str) -> str:
    """Write the trained params as an HF-style safetensors checkpoint
    (same tensor names convert.HF_NAME_MAPS['mistral'] reads) plus an HF
    config.json so `effort-tpu convert --model auto` works on it."""
    import json
    import os
    from effort_tpu.convert.convert import HF_NAME_MAPS
    from effort_tpu.runtime.safetensors_io import SafeTensorWriter
    os.makedirs(dst_dir, exist_ok=True)
    names = HF_NAME_MAPS["mistral"]
    wtr = SafeTensorWriter(dst_dir, "model")

    def put(name, arr):
        wtr.add(name, np.asarray(arr, np.float32))

    put(names["embed"], params["embed"])
    put(names["norm"], params["norm"])
    put(names["lm_head"], params["lm_head"])
    lp = params["layers"]
    for l in range(cfg.n_layers):
        put(names["attn_norm"].format(l=l), lp["attn_norm"][l])
        put(names["ffn_norm"].format(l=l), lp["ffn_norm"][l])
        for p in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            put(names[p].format(l=l), lp[p][l])
    wtr.save()
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "mistral",
            "hidden_size": cfg.dim,
            "intermediate_size": cfg.hidden_dim,
            "num_hidden_layers": cfg.n_layers,
            "num_attention_heads": cfg.n_heads,
            "num_key_value_heads": cfg.n_kv_heads,
            "head_dim": cfg.head_dim,
            "vocab_size": cfg.vocab_size,
            "rms_norm_eps": cfg.norm_eps,
            "rope_theta": cfg.rope_theta,
            "max_position_embeddings": cfg.max_seq_len,
        }, f, indent=2)
    return dst_dir


def byte_corpus_from_files(paths, limit_bytes: int = 0) -> np.ndarray:
    """Concatenate files into a uint8 byte corpus (byte-level LM ids)."""
    chunks = []
    total = 0
    for p in paths:
        try:
            with open(p, "rb") as f:
                b = f.read()
        except OSError:
            continue
        chunks.append(np.frombuffer(b, np.uint8))
        total += len(b)
        if limit_bytes and total >= limit_bytes:
            break
    corpus = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    return corpus[:limit_bytes] if limit_bytes else corpus
