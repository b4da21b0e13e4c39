"""Generation loop: greedy decode, limit-logits QA mode, prediction capture.

TPU-native analog of runNetwork (runNetwork.swift:68-316):
  - the whole generation (prefill + decode) is a single jitted lax.scan —
    no per-token host sync (the reference blocks on gpu.eval() every token,
    runNetwork.swift:217).
  - greedy argmax replaces mpsTopK(k=16)+scalar fetch (mps.swift:49-80).
  - limit_logits: restricted argmax over the allowed answer-token ids
    (the reference scans its top-16 list for the first allowed id,
    runNetwork.swift:237-250 — same winner, computed without a host loop).
  - returnPredictions -> per-step argmax ids are always returned.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_seq,
                                           forward_token, make_kv_cache,
                                           make_quant_kv_cache,
                                           make_ring_kv_cache,
                                           quant_kv_hooks, ring_kv_hooks)


def _make_cache_and_hooks(cfg, kv_mode: str):
    """kv_mode: 'full' (bf16, max_seq_len slots), 'ring' (bf16, rolling
    sliding_window slots), 'int8' (quantized, max_seq_len slots)."""
    if kv_mode == "ring":
        return make_ring_kv_cache(cfg) + ring_kv_hooks(cfg)
    if kv_mode == "int8":
        return make_quant_kv_cache(cfg) + quant_kv_hooks(cfg)
    return make_kv_cache(cfg) + (None, None)


@dataclasses.dataclass
class Reply:
    """Mirror of the reference Reply struct (runNetwork.swift:17-20)."""
    token_ids: list
    predictions: list          # argmax id after every consumed position
    text: str = ""
    tokens_per_s: float = 0.0
    prep_ms: float = 0.0       # compile (the analog of "prep" time)
    eval_ms_per_token: float = 0.0
    spec_tokens_per_iter: float = 0.0  # speculative decode: mean accepted
                                       # tokens per draft/verify round
    logprobs: list = None              # per emitted token (when requested):
                                       # {token_id: logprob} of the top-N


def _pick_token(logits, key, sampled: bool, top_k: int, temperature,
                top_p, counts=None, presence=0.0, frequency=0.0):
    """Next-token choice: greedy when sampled=False, otherwise softmax
    sampling with optional top-k and/or nucleus (top-p) truncation.
    (The reference is greedy-only: mpsTopK argmax, runNetwork.swift:235.)

    sampled and top_k are compile-time (they change the program);
    temperature/top_p/presence/frequency are TRACED scalars —
    client-supplied floats must not mint new executables (the compile
    cache would grow without bound under a parameter sweep).

    counts [vocab] (when given): occurrence counts of every token in the
    text so far; OpenAI-style presence/frequency penalties subtract
    presence*(counts>0) + frequency*counts from the logits before the
    choice (greedy included)."""
    if counts is not None:
        logits = logits - (presence * (counts > 0)
                           + frequency * counts.astype(jnp.float32))
    if not sampled:
        return jnp.argmax(logits).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / jnp.maximum(
        jnp.asarray(temperature, jnp.float32), 1e-6)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(lg, top_k)[0][-1]
        lg = jnp.where(lg >= kth, lg, -jnp.inf)
    # nucleus: smallest prefix of the sorted distribution with mass
    # >= top_p; a traced no-op when top_p >= 1
    srt = jnp.sort(lg)[::-1]
    probs = jax.nn.softmax(srt)
    keep = jnp.cumsum(probs) - probs < top_p        # always keeps argmax
    cutoff = jnp.min(jnp.where(keep, srt, jnp.inf))
    cutoff = jnp.where(jnp.asarray(top_p) >= 1.0, -jnp.inf, cutoff)
    lg = jnp.where(lg >= cutoff, lg, -jnp.inf)
    return jax.random.categorical(key, lg).astype(jnp.int32)


def _decode_scan(w: ModelWeights, cfg: ModelConfig, prompt_ids, prompt_len,
                 n_new, effort: float, impl: str, eos_id: int,
                 kv_mode: str = "full", sampled: bool = False,
                 top_k: int = 0, penalized: bool = False,
                 logprobs_k: int = 0,
                 temperature=0.0, top_p=1.0, presence=0.0, frequency=0.0,
                 rng_key=None):
    """prompt_ids: [P] int32 padded; returns (all_ids [P+n_new], preds).
    kv_mode='ring' decodes over an O(sliding_window) rolling KV cache
    (sequence length unbounded by max_seq_len); 'int8' over the
    quantized cache (half the KV bytes). penalized=True tracks per-token
    occurrence counts for presence/frequency penalties."""
    P = prompt_ids.shape[0]
    k_cache, v_cache, kv_up, attn = _make_cache_and_hooks(cfg, kv_mode)
    total = P + n_new
    if rng_key is None:
        rng_key = jax.random.key(0)

    ids0 = jnp.concatenate(
        [prompt_ids, jnp.zeros((n_new,), jnp.int32)])
    counts0 = None
    if penalized:
        counts0 = jnp.zeros((cfg.vocab_size,), jnp.int32).at[
            prompt_ids].add((jnp.arange(P) < prompt_len).astype(jnp.int32))

    def step(carry, pos):
        ids, k_cache, v_cache, done, key, counts = carry
        tok = ids[pos]
        logits, k_cache, v_cache = forward_token(
            w, cfg, tok, pos, k_cache, v_cache, effort=effort, impl=impl,
            kv_update_fn=kv_up, attn_fn=attn)
        key, sub = jax.random.split(key)
        pred = _pick_token(logits, sub, sampled, top_k, temperature,
                           top_p, counts=counts, presence=presence,
                           frequency=frequency)
        is_gen = pos >= prompt_len - 1          # generating from here on
        next_pos = pos + 1
        write = is_gen & (next_pos < total) & (~done)
        ids = jax.lax.cond(
            write,
            lambda: jax.lax.dynamic_update_index_in_dim(
                ids, pred, jnp.minimum(next_pos, total - 1), 0),
            lambda: ids)
        if counts is not None:
            counts = counts.at[pred].add(write.astype(jnp.int32))
        done = done | (is_gen & (pred == eos_id))
        out = pred
        if logprobs_k:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            topv, topi = jax.lax.top_k(lp, logprobs_k)
            out = (pred, topv, topi)
        return (ids, k_cache, v_cache, done, key, counts), out

    (ids, _, _, _, _, _), outs = jax.lax.scan(
        step, (ids0, k_cache, v_cache, jnp.asarray(False), rng_key,
               counts0),
        jnp.arange(total - 1, dtype=jnp.int32))
    if logprobs_k:
        preds, top_lp, top_ids = outs
        return ids, preds, top_lp, top_ids
    return ids, outs


def _prompt_logits_scan(w: ModelWeights, cfg: ModelConfig, prompt_ids,
                        prompt_len, effort: float, impl: str):
    """Run the (padded) prompt; return logits at the last real position and
    the per-position argmax ids (for agreement benchmarks)."""
    P = prompt_ids.shape[0]
    k_cache, v_cache = make_kv_cache(cfg)

    def step(carry, pos):
        k_cache, v_cache, last_logits = carry
        logits, k_cache, v_cache = forward_token(
            w, cfg, prompt_ids[pos], pos, k_cache, v_cache,
            effort=effort, impl=impl)
        last_logits = jnp.where(pos == prompt_len - 1, logits, last_logits)
        return (k_cache, v_cache, last_logits), jnp.argmax(logits)

    init = (k_cache, v_cache, jnp.zeros((cfg.vocab_size,), jnp.float32))
    (_, _, last_logits), preds = jax.lax.scan(
        step, init, jnp.arange(P, dtype=jnp.int32))
    return last_logits, preds.astype(jnp.int32)


def _prefill_decode_scan(w: ModelWeights, cfg: ModelConfig, prompt_ids,
                         prompt_len, n_new, effort: float, impl: str,
                         eos_id: int, prefill_impl: str = "auto",
                         sampled: bool = False, top_k: int = 0,
                         temperature=0.0, top_p=1.0, rng_key=None):
    """Batched-prefill generation: the prompt runs through forward_seq in
    ONE pass (MXU matmuls over [P, dim]), then n_new decode steps
    (greedy, or sampled — see _pick_token).

    The prompt is LEFT-padded inside the fixed [P] buffer so the cache
    layout is contiguous for any runtime prompt_len: rotary positions are
    slot - offset and attention masks out slots < offset (offset =
    P - prompt_len).

    Returns (gen_ids [n_new], prefill_preds [P] in left-pad layout)."""
    P = prompt_ids.shape[0]
    offset = P - prompt_len
    idx = jnp.arange(P, dtype=jnp.int32) - offset
    ids_lp = jnp.where(idx >= 0,
                       prompt_ids[jnp.clip(idx, 0, P - 1)], 0)
    if rng_key is None:
        rng_key = jax.random.key(0)

    k_cache, v_cache = make_kv_cache(cfg)
    logits_all, k_cache, v_cache = forward_seq(
        w, cfg, ids_lp, k_cache, v_cache, start_slot=0, rope_offset=offset,
        mask_from=offset, effort=effort, impl=prefill_impl)
    prefill_preds = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
    rng_key, sub = jax.random.split(rng_key)
    first_gen = _pick_token(logits_all[-1], sub, sampled, top_k,
                            temperature, top_p)

    def step(carry, i):
        tok, k_cache, v_cache, done, key = carry
        slot = P + i
        logits, k_cache, v_cache = forward_token(
            w, cfg, tok, slot, k_cache, v_cache, effort=effort, impl=impl,
            rope_offset=offset, mask_from=offset)
        key, sub = jax.random.split(key)
        pred = _pick_token(logits, sub, sampled, top_k, temperature, top_p)
        done = done | (tok == eos_id)
        return (pred, k_cache, v_cache, done, key), tok

    (_, _, _, _, _), gen_ids = jax.lax.scan(
        step, (first_gen, k_cache, v_cache, jnp.asarray(False), rng_key),
        jnp.arange(n_new, dtype=jnp.int32))
    return gen_ids, prefill_preds


def _prompt_logits_prefill(w: ModelWeights, cfg: ModelConfig, prompt_ids,
                           prompt_len, effort: float, impl: str):
    """Prefill version of _prompt_logits_scan (left-pad layout preds)."""
    P = prompt_ids.shape[0]
    offset = P - prompt_len
    idx = jnp.arange(P, dtype=jnp.int32) - offset
    ids_lp = jnp.where(idx >= 0, prompt_ids[jnp.clip(idx, 0, P - 1)], 0)
    k_cache, v_cache = make_kv_cache(cfg)
    logits_all, _, _ = forward_seq(
        w, cfg, ids_lp, k_cache, v_cache, start_slot=0, rope_offset=offset,
        mask_from=offset, effort=effort, impl=impl)
    return logits_all[-1], jnp.argmax(logits_all, axis=-1).astype(jnp.int32)


def _spec_decode(w: ModelWeights, cfg: ModelConfig, prompt_ids, prompt_len,
                 n_new, draft_effort: float, k: int, impl: str, eos_id: int):
    """Self-speculative greedy decode: effort is the draft model.

    Each round drafts k tokens at draft_effort (k cheap matvec steps),
    then verifies ALL k in ONE batched forward_seq pass at effort=1.0 —
    the verifier reads every weight once per k tokens instead of once
    per token, so at high acceptance the decode approaches prefill
    arithmetic intensity while emitting EXACTLY the full-effort greedy
    continuation (every emitted token is a verifier argmax; the verify
    pass also rewrites the drafted KV rows at full effort, so the cache
    never retains approximate state). A capability the reference cannot
    express: its draft would need a second model, ours is the same
    weights at a lower effort dial.

    Returns (ids [P+n_new+k], n_gen, n_iters).
    """
    P = prompt_ids.shape[0]
    k_cache, v_cache = make_kv_cache(cfg)

    # ---- prompt pass (token scan, full effort) ----
    def pstep(carry, pos):
        kc, vc, last = carry
        lg, kc, vc = forward_token(w, cfg, prompt_ids[pos], pos, kc, vc,
                                   effort=1.0, impl=impl)
        last = jnp.where(pos == prompt_len - 1, lg, last)
        return (kc, vc, last), None

    (k_cache, v_cache, last), _ = jax.lax.scan(
        pstep, (k_cache, v_cache, jnp.zeros((cfg.vocab_size,), jnp.float32)),
        jnp.arange(P, dtype=jnp.int32))
    t0 = jnp.argmax(last).astype(jnp.int32)

    ids0 = jnp.concatenate([prompt_ids, jnp.zeros((n_new + k,), jnp.int32)])
    ids0 = jax.lax.dynamic_update_index_in_dim(ids0, t0, prompt_len, 0)

    def cond(c):
        _, _, _, _, _, n_gen, done, _ = c
        return (n_gen < n_new) & ~done

    def body(c):
        ids, kc, vc, tok, pos, n_gen, done, n_it = c
        # draft k steps at low effort (approximate KV rows land at
        # pos..pos+k-1; the verify pass rewrites them exactly)
        def dstep(dc, i):
            t, kc, vc = dc
            lg, kc, vc = forward_token(w, cfg, t, pos + i, kc, vc,
                                       effort=draft_effort, impl=impl)
            nt = jnp.argmax(lg).astype(jnp.int32)
            return (nt, kc, vc), nt

        (_, kc, vc), dtoks = jax.lax.scan(
            dstep, (tok, kc, vc), jnp.arange(k, dtype=jnp.int32))
        consumed = jnp.concatenate([tok[None], dtoks[:-1]])

        # verify all k in one batched pass at full effort
        logits_all, kc, vc = forward_seq(
            w, cfg, consumed, kc, vc, start_slot=pos, rope_offset=0,
            mask_from=0, effort=1.0, impl=impl)
        vtoks = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)   # [k]

        # longest prefix where the draft agreed with the verifier
        match = (dtoks[:-1] == vtoks[:-1])
        acc = jnp.cumprod(match.astype(jnp.int32)).sum()     # 0..k-1
        # emit vtoks[0..acc] (acc+1 tokens), truncated at the first EOS
        iota = jnp.arange(k)
        emitted = iota <= acc
        is_eos = (vtoks == eos_id) & emitted
        has_eos = is_eos.any()
        first_eos = jnp.argmax(is_eos)
        n_emit = jnp.where(has_eos, first_eos + 1, acc + 1)
        n_emit = jnp.minimum(n_emit, n_new - n_gen)          # don't overrun
        n_emit = jnp.maximum(n_emit, 1)

        old = jax.lax.dynamic_slice(ids, (pos + 1,), (k,))
        ids = jax.lax.dynamic_update_slice(
            ids, jnp.where(iota < n_emit, vtoks, old), (pos + 1,))
        tok2 = vtoks[n_emit - 1]
        return (ids, kc, vc, tok2, pos + n_emit, n_gen + n_emit,
                done | has_eos, n_it + 1)

    init = (ids0, k_cache, v_cache, t0,
            jnp.asarray(prompt_len, jnp.int32), jnp.asarray(1, jnp.int32),
            t0 == eos_id, jnp.asarray(0, jnp.int32))
    ids, _, _, _, _, n_gen, _, n_it = jax.lax.while_loop(cond, body, init)
    return ids, n_gen, n_it


def _position_logits_scan(w: ModelWeights, cfg: ModelConfig, prompt_ids,
                          prompt_len, effort, impl: str):
    """Per-position logits over the (padded) prompt — the distribution
    eval surface (KL-div methodology, reference docs/pesky.html)."""
    del prompt_len  # padding positions are sliced off host-side
    P = prompt_ids.shape[0]
    k_cache, v_cache = make_kv_cache(cfg)

    def step(carry, pos):
        k_cache, v_cache = carry
        logits, k_cache, v_cache = forward_token(
            w, cfg, prompt_ids[pos], pos, k_cache, v_cache,
            effort=effort, impl=impl)
        return (k_cache, v_cache), logits

    _, logits = jax.lax.scan(step, (k_cache, v_cache),
                             jnp.arange(P, dtype=jnp.int32))
    return logits


def _position_logits_prefill(w: ModelWeights, cfg: ModelConfig, prompt_ids,
                             prompt_len, effort: float, impl: str):
    """Prefill version of _position_logits_scan (left-pad layout)."""
    P = prompt_ids.shape[0]
    offset = P - prompt_len
    idx = jnp.arange(P, dtype=jnp.int32) - offset
    ids_lp = jnp.where(idx >= 0, prompt_ids[jnp.clip(idx, 0, P - 1)], 0)
    k_cache, v_cache = make_kv_cache(cfg)
    logits_all, _, _ = forward_seq(
        w, cfg, ids_lp, k_cache, v_cache, start_slot=0, rope_offset=offset,
        mask_from=offset, effort=effort, impl=impl)
    return logits_all


class Engine:
    """Holds weights + compiled generation functions.

    One compiled executable per (prompt_pad, n_new, effort) triple; effort is
    compile-time because the gather kernel's dispatch capacity is sized from
    it. Executables are cached (JAX persistent compilation cache).

    prefill=True runs the prompt through the batched forward_seq pass
    (MXU matmuls) instead of the token-at-a-time scan.
    """

    def __init__(self, weights: ModelWeights, cfg: ModelConfig,
                 tokenizer=None, impl: str = "auto", eos_id: int = 2,
                 pad_to: int = 32, prefill: bool = False,
                 prefill_impl: str = "auto",
                 dynamic_effort: bool = False,
                 ring_kv: bool = False, quant_kv: bool = False):
        """dynamic_effort=True traces effort as a runtime argument: ONE
        compiled executable serves every effort value (the reference's
        instant effort knob, main.swift:110-135). Requires a layout whose
        kernels take traced effort — bucket_size=1 on TPU, or the jnp
        path anywhere; not available with prefill (batched prefill
        resolves its MXU path from a static effort)."""
        self.w = weights
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.impl = impl
        self.eos_id = eos_id
        self.pad_to = pad_to
        self.prefill = prefill
        self.prefill_impl = prefill_impl
        self.dynamic_effort = dynamic_effort
        self.ring_kv = ring_kv
        assert not (dynamic_effort and prefill), \
            "dynamic_effort works with the decode-scan engine"
        assert not ((ring_kv or quant_kv) and prefill), \
            "ring_kv/quant_kv work with the decode-scan engine"
        assert not (ring_kv and quant_kv), "pick one KV-cache mode"
        assert not ring_kv or cfg.sliding_window, \
            "ring_kv requires cfg.sliding_window"
        self.kv_mode = "ring" if ring_kv else ("int8" if quant_kv
                                               else "full")
        self._fns = {}

    def _eff(self, effort: float):
        return (jnp.asarray(effort, jnp.float32) if self.dynamic_effort
                else effort)

    def _fn(self, P: int, n_new: int, effort: float,
            sampled: bool = False, top_k: int = 0,
            penalized: bool = False, logprobs_k: int = 0):
        eff_key = "dyn" if self.dynamic_effort else effort
        key = (P, n_new, eff_key, self.prefill, sampled, top_k, penalized,
               logprobs_k)
        if key not in self._fns:
            if self.prefill:
                self._fns[key] = jax.jit(partial(
                    _prefill_decode_scan, cfg=self.cfg, n_new=n_new,
                    effort=effort, impl=self.impl, eos_id=self.eos_id,
                    prefill_impl=self.prefill_impl, sampled=sampled,
                    top_k=top_k))
            elif self.dynamic_effort:
                self._fns[key] = jax.jit(partial(
                    _decode_scan, cfg=self.cfg, n_new=n_new,
                    impl=self.impl, eos_id=self.eos_id,
                    kv_mode=self.kv_mode, sampled=sampled, top_k=top_k,
                    penalized=penalized, logprobs_k=logprobs_k))
            else:
                self._fns[key] = jax.jit(partial(
                    _decode_scan, cfg=self.cfg, n_new=n_new, effort=effort,
                    impl=self.impl, eos_id=self.eos_id,
                    kv_mode=self.kv_mode, sampled=sampled, top_k=top_k,
                    penalized=penalized, logprobs_k=logprobs_k))
        return self._fns[key]

    def generate(self, prompt_ids: Sequence[int], n_new: int = 30,
                 effort: float = 1.0, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, seed: int = 0,
                 presence_penalty: float = 0.0,
                 frequency_penalty: float = 0.0,
                 logprobs: int = 0, time_it: bool = False) -> Reply:
        """temperature=0 (default) is greedy (the reference's only mode);
        temperature>0 samples, optionally truncated by top_k / top_p.
        seed only matters when sampling (same seed -> same tokens).
        presence/frequency penalties subtract presence*(seen) +
        frequency*count from the logits (OpenAI semantics; apply to
        greedy too). temperature/top_p/penalties are traced (any value,
        one executable); top_k changes the compiled program.

        time_it=False (default): ONE device execution per call — the
        serving path. Timing fields then include compile time on the
        first (cold) call for a given shape and are clean afterwards.
        time_it=True: warm-up call + a second timed call (benchmark
        semantics; 2x decode cost)."""
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        assert self.ring_kv or P + n_new <= self.cfg.max_seq_len, \
            "sequence too long (use ring_kv for unbounded decode)"
        sampled = temperature > 0.0
        penalized = presence_penalty != 0.0 or frequency_penalty != 0.0
        assert not (penalized and self.prefill), \
            "penalties are not wired into the prefill engine yet"
        assert not (logprobs and self.prefill), \
            "logprobs are not wired into the prefill engine yet"
        padded = list(prompt_ids) + [0] * (P - len(prompt_ids))
        fn = self._fn(P, n_new, effort, sampled, top_k if sampled else 0,
                      penalized, logprobs)
        kw = ({"effort": self._eff(effort)} if self.dynamic_effort else {})
        if penalized:
            kw["presence"] = jnp.asarray(presence_penalty, jnp.float32)
            kw["frequency"] = jnp.asarray(frequency_penalty, jnp.float32)
        if sampled:
            kw["rng_key"] = jax.random.key(seed)
            kw["temperature"] = jnp.asarray(temperature, jnp.float32)
            kw["top_p"] = jnp.asarray(top_p, jnp.float32)
        args = (jnp.asarray(padded, jnp.int32),
                jnp.asarray(len(prompt_ids), jnp.int32))
        t0 = time.perf_counter()
        out = fn(self.w, prompt_ids=args[0], prompt_len=args[1], **kw)
        out[0].block_until_ready()
        t_first = time.perf_counter() - t0
        if time_it:
            t0 = time.perf_counter()
            out = fn(self.w, prompt_ids=args[0], prompt_len=args[1], **kw)
            a, b = (jax.device_get(out[0]), jax.device_get(out[1]))
            dt = time.perf_counter() - t0
        else:
            a, b = (jax.device_get(out[0]), jax.device_get(out[1]))
            dt = t_first

        offset = P - len(prompt_ids)
        if self.prefill:
            gen_ids, prefill_preds = a, b
            new_ids = list(gen_ids)
            preds = list(prefill_preds[offset:]) + list(gen_ids[1:])
        else:
            ids, preds = a, b
            new_ids = list(ids[len(prompt_ids):len(prompt_ids) + n_new])
        if self.eos_id in new_ids:
            new_ids = new_ids[:new_ids.index(self.eos_id) + 1]
        lp_out = None
        if logprobs and not self.prefill:
            # step i predicts the token consumed at position i+1; the
            # emitted tokens were predicted at steps prompt_len-1 ...
            top_lp = jax.device_get(out[2])
            top_ids = jax.device_get(out[3])
            s0 = len(prompt_ids) - 1
            lp_out = [
                {int(t): float(v)
                 for t, v in zip(top_ids[s0 + i], top_lp[s0 + i])}
                for i in range(len(new_ids))
            ]
        text = (self.tokenizer.decode(new_ids)
                if self.tokenizer is not None else "")
        n_steps = len(padded) + n_new - 1
        return Reply(
            token_ids=[int(t) for t in new_ids],
            predictions=[int(p) for p in preds],
            text=text,
            tokens_per_s=n_steps / dt,
            prep_ms=(t_first * 1e3 if time_it else 0.0),
            eval_ms_per_token=dt / n_steps * 1e3,
            logprobs=lp_out,
        )

    def _logits_fn(self, P: int, effort: float):
        eff_key = "dyn" if self.dynamic_effort else effort
        key = ("logits", P, eff_key, self.prefill)
        if key not in self._fns:
            if self.prefill:
                self._fns[key] = jax.jit(partial(
                    _prompt_logits_prefill, cfg=self.cfg, effort=effort,
                    impl=self.prefill_impl))
            elif self.dynamic_effort:
                self._fns[key] = jax.jit(partial(
                    _prompt_logits_scan, cfg=self.cfg, impl=self.impl))
            else:
                self._fns[key] = jax.jit(partial(
                    _prompt_logits_scan, cfg=self.cfg, effort=effort,
                    impl=self.impl))
        return self._fns[key]

    def prompt_logits(self, prompt_ids: Sequence[int], effort: float = 1.0):
        """Logits after the prompt + per-position argmax predictions."""
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        padded = list(prompt_ids) + [0] * (P - len(prompt_ids))
        fn = self._logits_fn(P, effort)
        kw = ({"effort": self._eff(effort)} if self.dynamic_effort else {})
        logits, preds = fn(self.w,
                           prompt_ids=jnp.asarray(padded, jnp.int32),
                           prompt_len=jnp.asarray(len(prompt_ids),
                                                  jnp.int32), **kw)
        preds = jax.device_get(preds)
        if self.prefill:  # left-pad layout: real positions at the tail
            preds = preds[P - len(prompt_ids):]
        else:
            preds = preds[:len(prompt_ids)]
        return jax.device_get(logits), [int(p) for p in preds]

    def generate_speculative(self, prompt_ids: Sequence[int],
                             n_new: int = 30, draft_effort: float = 0.25,
                             k: int = 8, time_it: bool = False) -> Reply:
        """Self-speculative greedy decode: emits EXACTLY the effort=1.0
        greedy continuation, but drafts k tokens per round at
        draft_effort and verifies them in one batched full-effort pass
        (weights read once per k tokens). See _spec_decode."""
        assert self.kv_mode == "full", (
            "generate_speculative runs on the full bf16 cache: the "
            "verify pass (forward_seq) writes KV rows directly and has "
            "no ring/int8 hook path yet")
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        assert P + n_new + k <= self.cfg.max_seq_len, "sequence too long"
        key = ("spec", P, n_new, draft_effort, k)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(
                _spec_decode, cfg=self.cfg, n_new=n_new,
                draft_effort=draft_effort, k=k, impl=self.impl,
                eos_id=self.eos_id))
        padded = list(prompt_ids) + [0] * (P - len(prompt_ids))
        args = (jnp.asarray(padded, jnp.int32),
                jnp.asarray(len(prompt_ids), jnp.int32))
        t0 = time.perf_counter()
        out = self._fns[key](self.w, prompt_ids=args[0],
                             prompt_len=args[1])
        out[0].block_until_ready()
        t_first = time.perf_counter() - t0
        if time_it:
            t0 = time.perf_counter()
            out = self._fns[key](self.w, prompt_ids=args[0],
                                 prompt_len=args[1])
            ids, n_gen, n_it = (jax.device_get(out[0]), int(out[1]),
                                int(out[2]))
            dt = time.perf_counter() - t0
        else:
            ids, n_gen, n_it = (jax.device_get(out[0]), int(out[1]),
                                int(out[2]))
            dt = t_first
        n = min(n_gen, n_new)
        toks = [int(t) for t in ids[len(prompt_ids):len(prompt_ids) + n]]
        if self.eos_id in toks:
            toks = toks[:toks.index(self.eos_id) + 1]
        text = (self.tokenizer.decode(toks)
                if self.tokenizer is not None else "")
        return Reply(
            token_ids=toks, predictions=[], text=text,
            tokens_per_s=len(toks) / max(dt, 1e-9),
            prep_ms=(t_first - dt) * 1e3,
            eval_ms_per_token=dt * 1e3 / max(len(toks), 1),
            spec_tokens_per_iter=n_gen / max(n_it, 1))

    def position_logits(self, prompt_ids: Sequence[int],
                        effort: float = 1.0):
        """[len(prompt_ids), vocab] logits at every real prompt position
        (next-token distribution per position; KL-div eval surface)."""
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        eff_key = "dyn" if self.dynamic_effort else effort
        key = ("poslogits", P, eff_key, self.prefill)
        if key not in self._fns:
            if self.prefill:
                self._fns[key] = jax.jit(partial(
                    _position_logits_prefill, cfg=self.cfg, effort=effort,
                    impl=self.prefill_impl))
            elif self.dynamic_effort:
                self._fns[key] = jax.jit(partial(
                    _position_logits_scan, cfg=self.cfg, impl=self.impl))
            else:
                self._fns[key] = jax.jit(partial(
                    _position_logits_scan, cfg=self.cfg, effort=effort,
                    impl=self.impl))
        padded = list(prompt_ids) + [0] * (P - len(prompt_ids))
        kw = ({"effort": self._eff(effort)} if self.dynamic_effort else {})
        logits = self._fns[key](
            self.w, prompt_ids=jnp.asarray(padded, jnp.int32),
            prompt_len=jnp.asarray(len(prompt_ids), jnp.int32), **kw)
        logits = jax.device_get(logits)
        if self.prefill:  # left-pad layout: real positions at the tail
            return logits[P - len(prompt_ids):]
        return logits[:len(prompt_ids)]

    def score(self, token_ids: Sequence[int], effort: float = 1.0):
        """Teacher-forced per-token log-probabilities of a given text:
        returns [len(token_ids)-1] floats, entry i = log p(token_ids[i+1]
        | token_ids[:i+1]) at `effort`. Mean negative of this is the NLL
        (exp -> perplexity) — the standard scale for comparing effort
        against quantization on held-out text."""
        import numpy as np
        logits = self.position_logits(token_ids, effort=effort)
        nxt = np.asarray(token_ids[1:], np.int64)
        out = np.empty(len(nxt), np.float64)
        # chunked f32 logsumexp: a [T, 32000] f64 copy + exp would cost
        # ~GBs of host RAM per (text, effort) point of an nll sweep
        for i in range(0, len(nxt), 256):
            x = np.asarray(logits[i:i + len(nxt[i:i + 256])], np.float32)
            m = x.max(axis=-1)
            lse = m + np.log(np.exp(x - m[:, None]).sum(axis=-1))
            j = np.arange(x.shape[0])
            out[i:i + x.shape[0]] = x[j, nxt[i:i + x.shape[0]]] - lse
        return out

    def answer_limited(self, prompt_ids: Sequence[int],
                       allowed_ids: Sequence[int],
                       effort: float = 1.0) -> int:
        """limitLogits mode: 0-based index into allowed_ids of the best
        allowed next token after the prompt (QA benchmark harness)."""
        logits, _ = self.prompt_logits(prompt_ids, effort)
        import numpy as np
        return int(np.argmax(logits[np.asarray(allowed_ids)]))


def generate(weights, cfg, prompt_ids, n_new=30, effort=1.0, impl="auto",
             tokenizer=None) -> Reply:
    return Engine(weights, cfg, tokenizer=tokenizer, impl=impl).generate(
        prompt_ids, n_new=n_new, effort=effort)
