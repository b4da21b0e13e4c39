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
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_token,
                                           make_kv_cache)


@dataclasses.dataclass
class Reply:
    """Mirror of the reference Reply struct (runNetwork.swift:17-20)."""
    token_ids: list
    predictions: list          # argmax id after every consumed position
    text: str = ""
    tokens_per_s: float = 0.0
    prep_ms: float = 0.0       # compile (the analog of "prep" time)
    eval_ms_per_token: float = 0.0


def _decode_scan(w: ModelWeights, cfg: ModelConfig, prompt_ids, prompt_len,
                 n_new, effort: float, impl: str, eos_id: int):
    """prompt_ids: [P] int32 padded; returns (all_ids [P+n_new], preds)."""
    P = prompt_ids.shape[0]
    k_cache, v_cache = make_kv_cache(cfg)
    total = P + n_new

    ids0 = jnp.concatenate(
        [prompt_ids, jnp.zeros((n_new,), jnp.int32)])

    def step(carry, pos):
        ids, k_cache, v_cache, done = carry
        tok = ids[pos]
        logits, k_cache, v_cache = forward_token(
            w, cfg, tok, pos, k_cache, v_cache, effort=effort, impl=impl)
        pred = jnp.argmax(logits).astype(jnp.int32)
        is_gen = pos >= prompt_len - 1          # generating from here on
        next_pos = pos + 1
        write = is_gen & (next_pos < total) & (~done)
        ids = jax.lax.cond(
            write,
            lambda: jax.lax.dynamic_update_index_in_dim(
                ids, pred, jnp.minimum(next_pos, total - 1), 0),
            lambda: ids)
        done = done | (is_gen & (pred == eos_id))
        return (ids, k_cache, v_cache, done), pred

    (ids, _, _, _), preds = jax.lax.scan(
        step, (ids0, k_cache, v_cache, jnp.asarray(False)),
        jnp.arange(total - 1, dtype=jnp.int32))
    return ids, preds


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


class Engine:
    """Holds weights + compiled generation functions.

    One compiled executable per (prompt_pad, n_new, effort) triple; effort is
    compile-time because the gather kernel's dispatch capacity is sized from
    it. Executables are cached (JAX persistent compilation cache).
    """

    def __init__(self, weights: ModelWeights, cfg: ModelConfig,
                 tokenizer=None, impl: str = "auto", eos_id: int = 2,
                 pad_to: int = 32):
        self.w = weights
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.impl = impl
        self.eos_id = eos_id
        self.pad_to = pad_to
        self._fns = {}

    def _fn(self, P: int, n_new: int, effort: float):
        key = (P, n_new, effort)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(
                _decode_scan, cfg=self.cfg, n_new=n_new, effort=effort,
                impl=self.impl, eos_id=self.eos_id))
        return self._fns[key]

    def generate(self, prompt_ids: Sequence[int], n_new: int = 30,
                 effort: float = 1.0) -> Reply:
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        assert P + n_new <= self.cfg.max_seq_len, "sequence too long"
        padded = list(prompt_ids) + [0] * (P - len(prompt_ids))
        fn = self._fn(P, n_new, effort)
        t0 = time.perf_counter()
        ids, preds = fn(self.w,
                        prompt_ids=jnp.asarray(padded, jnp.int32),
                        prompt_len=jnp.asarray(len(prompt_ids), jnp.int32))
        ids.block_until_ready()
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ids, preds = fn(self.w,
                        prompt_ids=jnp.asarray(padded, jnp.int32),
                        prompt_len=jnp.asarray(len(prompt_ids), jnp.int32))
        ids = jax.device_get(ids)
        preds = jax.device_get(preds)
        dt = time.perf_counter() - t0

        new_ids = list(ids[len(prompt_ids):len(prompt_ids) + n_new])
        if self.eos_id in new_ids:
            new_ids = new_ids[:new_ids.index(self.eos_id) + 1]
        text = (self.tokenizer.decode(new_ids)
                if self.tokenizer is not None else "")
        n_steps = len(padded) + n_new - 1
        return Reply(
            token_ids=[int(t) for t in new_ids],
            predictions=[int(p) for p in preds],
            text=text,
            tokens_per_s=n_steps / dt,
            prep_ms=t_first * 1e3,
            eval_ms_per_token=dt / n_steps * 1e3,
        )

    def _logits_fn(self, P: int, effort: float):
        key = ("logits", P, effort)
        if key not in self._fns:
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
        logits, preds = fn(self.w,
                           prompt_ids=jnp.asarray(padded, jnp.int32),
                           prompt_len=jnp.asarray(len(prompt_ids),
                                                  jnp.int32))
        return (jax.device_get(logits),
                [int(p) for p in jax.device_get(preds)[:len(prompt_ids)]])

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
