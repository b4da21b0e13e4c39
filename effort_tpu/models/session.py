"""Stateful chat sessions: KV cache persists across turns and across
process restarts.

The reference has no session concept — every query re-runs the whole
prompt (its KV cache is a global buffer reset per runNetwork call) and
its checkpoint story is weights-only (SURVEY §5 "No KV-cache/session
persistence"). Here a ChatSession keeps the cache between turns (no
re-prefill of the conversation so far) and can be saved to / loaded from
a safetensors file, so long conversations survive restarts.

Variable-length turns under jit: prompts are right-padded to a bucket
size, and each scan step advances the cache position ONLY for valid
tokens — a pad token runs at the same slot as the next real token, whose
cache write then overwrites the pad's; pad outputs are discarded. This
keeps one compiled executable per (bucket, n_new, effort) instead of one
per prompt length.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_token,
                                           make_kv_cache,
                                           make_ring_kv_cache,
                                           ring_kv_hooks)


def _consume_scan(w: ModelWeights, cfg: ModelConfig, ids, valid, pos0,
                  k_cache, v_cache, effort: float, impl: str,
                  ring: bool = False):
    """Feed ids[i] where valid[i], starting at cache slot pos0.
    Returns (last_logits, new_pos, k_cache, v_cache)."""
    kv_up, attn = ring_kv_hooks(cfg) if ring else (None, None)
    offs = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)

    def step(carry, i):
        k_cache, v_cache, last = carry
        pos = pos0 + offs[i]
        logits, k_cache, v_cache = forward_token(
            w, cfg, ids[i], pos, k_cache, v_cache, effort=effort,
            impl=impl, kv_update_fn=kv_up, attn_fn=attn)
        last = jnp.where(valid[i], logits, last)
        return (k_cache, v_cache, last), None

    init = (k_cache, v_cache, jnp.zeros((cfg.vocab_size,), jnp.float32))
    (k_cache, v_cache, last), _ = jax.lax.scan(
        step, init, jnp.arange(ids.shape[0], dtype=jnp.int32))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return last, pos0 + n_valid, k_cache, v_cache


def _gen_scan(w: ModelWeights, cfg: ModelConfig, tok0, pos0, k_cache,
              v_cache, n_new: int, effort: float, impl: str, eos_id: int,
              ring: bool = False, sampled: bool = False, top_k: int = 0,
              penalized: bool = False, temperature=0.0, top_p=1.0,
              presence=0.0, frequency=0.0, rng_key=None, counts0=None):
    from effort_tpu.models.generate import _pick_token
    kv_up, attn = ring_kv_hooks(cfg) if ring else (None, None)
    if rng_key is None:
        rng_key = jax.random.key(0)

    def step(carry, i):
        tok, pos, k_cache, v_cache, done, key, counts = carry
        logits, k_cache, v_cache = forward_token(
            w, cfg, tok, pos, k_cache, v_cache, effort=effort, impl=impl,
            kv_update_fn=kv_up, attn_fn=attn)
        key, sub = jax.random.split(key)
        pred = _pick_token(logits, sub, sampled, top_k, temperature,
                           top_p, counts=counts, presence=presence,
                           frequency=frequency)
        if counts is not None:
            counts = counts.at[pred].add(1)
        done = done | (tok == eos_id)
        return (pred, pos + 1, k_cache, v_cache, done, key, counts), tok

    if penalized and counts0 is not None:
        counts0 = counts0.at[tok0].add(1)   # the turn-boundary token
    (next_tok, pos, k_cache, v_cache, _, _, _), toks = jax.lax.scan(
        step, (tok0, pos0, k_cache, v_cache, jnp.asarray(False), rng_key,
               counts0 if penalized else None),
        jnp.arange(n_new, dtype=jnp.int32))
    # next_tok: the prediction after the last consumed token — the
    # continuation point for chunked/streaming turns
    return toks, pos, k_cache, v_cache, next_tok


class ChatSession:
    """Multi-turn generation with a persistent KV cache."""

    def __init__(self, weights: ModelWeights, cfg: ModelConfig,
                 impl: str = "auto", eos_id: int = 2, pad_to: int = 32,
                 tokenizer=None, ring_kv: bool = False):
        """ring_kv=True keeps the conversation in a rolling
        O(sliding_window) cache: sessions are then unbounded by
        max_seq_len (the model attends to the last window anyway)."""
        self.w = weights
        self.cfg = cfg
        self.impl = impl
        self.eos_id = eos_id
        self.pad_to = pad_to
        self.tokenizer = tokenizer
        self.ring_kv = ring_kv
        assert not ring_kv or cfg.sliding_window, \
            "ring_kv requires cfg.sliding_window"
        self.k_cache, self.v_cache = (make_ring_kv_cache(cfg) if ring_kv
                                      else make_kv_cache(cfg))
        self.pos = 0
        self.history: List[int] = []
        self._fns = {}

    def _consume_fn(self, P: int, effort: float):
        key = ("c", P, effort)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(
                _consume_scan, cfg=self.cfg, effort=effort,
                impl=self.impl, ring=self.ring_kv))
        return self._fns[key]

    def _gen_fn(self, n_new: int, effort: float, sampled: bool = False,
                top_k: int = 0, penalized: bool = False):
        key = ("g", n_new, effort, sampled, top_k, penalized)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(
                _gen_scan, cfg=self.cfg, n_new=n_new, effort=effort,
                impl=self.impl, eos_id=self.eos_id, ring=self.ring_kv,
                sampled=sampled, top_k=top_k, penalized=penalized))
        return self._fns[key]

    def turn(self, prompt_ids: Sequence[int], n_new: int = 30,
             effort: float = 1.0, temperature: float = 0.0,
             top_k: int = 0, top_p: float = 1.0, seed: int = 0,
             presence_penalty: float = 0.0,
             frequency_penalty: float = 0.0) -> List[int]:
        """Feed one user turn, generate up to n_new tokens. Only the NEW
        tokens are processed — the conversation so far lives in the
        cache. Sampling/penalty knobs match Engine.generate; penalty
        counts cover the WHOLE conversation history."""
        ids = list(prompt_ids)
        P = max(self.pad_to, -(-len(ids) // self.pad_to) * self.pad_to)
        assert self.ring_kv or \
            self.pos + P + n_new <= self.cfg.max_seq_len, \
            "session exceeds max_seq_len (use ring_kv=True for unbounded)"
        padded = ids + [0] * (P - len(ids))
        valid = [1] * len(ids) + [0] * (P - len(ids))
        last, pos, self.k_cache, self.v_cache = self._consume_fn(
            P, effort)(self.w, ids=jnp.asarray(padded, jnp.int32),
                       valid=jnp.asarray(valid, jnp.bool_),
                       pos0=jnp.asarray(self.pos, jnp.int32),
                       k_cache=self.k_cache, v_cache=self.v_cache)
        sampled = temperature > 0.0
        penalized = presence_penalty != 0.0 or frequency_penalty != 0.0
        kw = {}
        if sampled:
            kw.update(rng_key=jax.random.key(seed),
                      temperature=jnp.asarray(temperature, jnp.float32),
                      top_p=jnp.asarray(top_p, jnp.float32))
        if penalized:
            kw.update(
                presence=jnp.asarray(presence_penalty, jnp.float32),
                frequency=jnp.asarray(frequency_penalty, jnp.float32),
                counts0=jnp.asarray(np.bincount(
                    self.history + ids, minlength=self.cfg.vocab_size
                ), jnp.int32))
        # first generated token: greedy from the consume pass (sampling
        # it too would need the consume fn to thread the PRNG; the turn
        # boundary token being greedy is a deliberate simplification)
        first = jnp.argmax(last).astype(jnp.int32)
        toks, pos, self.k_cache, self.v_cache, nxt = self._gen_fn(
            n_new, effort, sampled, top_k if sampled else 0, penalized)(
            self.w, tok0=first, pos0=pos,
            k_cache=self.k_cache, v_cache=self.v_cache, **kw)
        self.pos = int(pos)
        self._next_tok = int(nxt)
        out = [int(t) for t in jax.device_get(toks)]
        if self.eos_id in out:
            out = out[:out.index(self.eos_id) + 1]
        self.history.extend(ids + out)
        return out

    def continue_turn(self, n_new: int = 30, effort: float = 1.0,
                      temperature: float = 0.0, top_k: int = 0,
                      top_p: float = 1.0, seed: int = 0,
                      presence_penalty: float = 0.0,
                      frequency_penalty: float = 0.0) -> List[int]:
        """Generate n_new MORE tokens continuing the last turn (no new
        prompt consumed) — the chunked building block of turn_stream."""
        assert getattr(self, "_next_tok", None) is not None, \
            "continue_turn needs a prior turn"
        assert self.ring_kv or \
            self.pos + n_new <= self.cfg.max_seq_len, \
            "session exceeds max_seq_len (use ring_kv=True for unbounded)"
        sampled = temperature > 0.0
        penalized = presence_penalty != 0.0 or frequency_penalty != 0.0
        kw = {}
        if sampled:
            kw.update(rng_key=jax.random.key(seed),
                      temperature=jnp.asarray(temperature, jnp.float32),
                      top_p=jnp.asarray(top_p, jnp.float32))
        if penalized:
            kw.update(
                presence=jnp.asarray(presence_penalty, jnp.float32),
                frequency=jnp.asarray(frequency_penalty, jnp.float32),
                counts0=jnp.asarray(np.bincount(
                    self.history, minlength=self.cfg.vocab_size
                ), jnp.int32))
        toks, pos, self.k_cache, self.v_cache, nxt = self._gen_fn(
            n_new, effort, sampled, top_k if sampled else 0, penalized)(
            self.w, tok0=jnp.asarray(self._next_tok, jnp.int32),
            pos0=jnp.asarray(self.pos, jnp.int32),
            k_cache=self.k_cache, v_cache=self.v_cache, **kw)
        self.pos = int(pos)
        self._next_tok = int(nxt)
        out = [int(t) for t in jax.device_get(toks)]
        if self.eos_id in out:
            out = out[:out.index(self.eos_id) + 1]
        self.history.extend(out)
        return out

    def turn_stream(self, prompt_ids: Sequence[int], n_new: int = 30,
                    chunk: int = 8, **kw):
        """Generator: yields lists of token ids as they decode (chunked
        turn + continue_turn under one cached executable per chunk size
        — the streaming REPL/serving surface)."""
        done = 0
        n = min(chunk, n_new)
        toks = self.turn(prompt_ids, n_new=n, **kw)
        yield toks
        done += len(toks)
        while done < n_new and self.eos_id not in toks:
            n = min(chunk, n_new - done)
            toks = self.continue_turn(n_new=n, **kw)
            yield toks
            done += len(toks)

    def reset(self) -> None:
        """Forget the conversation (cache rows are overwritten lazily)."""
        self.pos = 0
        self.history = []
        self._next_tok = None

    # ---------------- persistence ----------------

    def save(self, path: str) -> None:
        """Persist the session (KV cache + position + history) so a long
        conversation resumes without re-prefill."""
        from effort_tpu.runtime.safetensors_io import SafeTensorWriter
        os.makedirs(path, exist_ok=True)
        wmeta = {"pos": self.pos, "history": self.history,
                 "model": self.cfg.name, "ring_kv": self.ring_kv}
        with open(os.path.join(path, "session.json"), "w") as f:
            json.dump(wmeta, f)
        wr = SafeTensorWriter(path, "session")
        if self.ring_kv:
            # the ring wraps: every slot may be live, save it whole
            kc, vc = np.asarray(self.k_cache), np.asarray(self.v_cache)
        else:
            kc = np.asarray(self.k_cache[:, :self.pos + 1]
                            if self.pos else self.k_cache[:, :1])
            vc = np.asarray(self.v_cache[:, :self.pos + 1]
                            if self.pos else self.v_cache[:, :1])
        wr.add("k_cache", kc.view(np.uint16), bf16_bits=True)
        wr.add("v_cache", vc.view(np.uint16), bf16_bits=True)
        wr.save()

    @classmethod
    def load(cls, path: str, weights: ModelWeights, cfg: ModelConfig,
             **kw) -> "ChatSession":
        from effort_tpu.runtime.safetensors_io import MultiShardReader
        with open(os.path.join(path, "session.json")) as f:
            meta = json.load(f)
        kw.setdefault("ring_kv", bool(meta.get("ring_kv", False)))
        self = cls(weights, cfg, **kw)
        rd = MultiShardReader(path, "session")
        kc = np.array(rd["k_cache"], copy=True).view(np.uint16)
        vc = np.array(rd["v_cache"], copy=True).view(np.uint16)
        rd.close()
        T = kc.shape[1]
        kcj = jnp.asarray(kc).view(jnp.bfloat16)
        vcj = jnp.asarray(vc).view(jnp.bfloat16)
        self.k_cache = self.k_cache.at[:, :T].set(kcj)
        self.v_cache = self.v_cache.at[:, :T].set(vcj)
        self.pos = int(meta["pos"])
        self.history = list(meta["history"])
        return self
