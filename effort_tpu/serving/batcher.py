"""Continuous batching: slot-based batched decode with per-request effort.

The reference's serving story is a parked single-flight HTTP server
(garbage/server.swift busy-flag, SURVEY §2.2); batch size is structurally 1
(runNetwork.swift:28-50 global activation buffers). This module is the
green-field BatchEngine the SURVEY §7 plan calls for:

  - B decode slots share one [L, B, S, KV, D] KV cache; each slot has its
    own position, left-pad offset, effort and EOS state;
  - a new request is admitted into a free slot between decode steps: its
    prompt runs through the batched prefill (forward_seq) writing only its
    slot's cache, then the slot joins the next batched decode step —
    continuous batching, requests do not wait for each other to finish;
  - one jitted decode step advances ALL active slots: vmap of
    forward_token over the slot axis, with a traced per-slot effort vector
    (the XLA bucketMul path accepts traced effort, so mixed-effort batches
    work; pallas matvec kernels stay the single-stream fast path).

ContinuousBatcher is the scheduler loop the HTTP server drives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_seq,
                                           forward_token,
                                           forward_token_batch)


@dataclasses.dataclass
class SlotState:
    request_id: int = -1
    prompt_len: int = 0
    offset: int = 0          # left-pad offset inside the padded prompt
    generated: List[int] = dataclasses.field(default_factory=list)
    n_new: int = 0
    done: bool = True


class BatchEngine:
    """Batched decode over B slots of one shared KV cache."""

    def __init__(self, weights: ModelWeights, cfg: ModelConfig,
                 batch_size: int = 4, pad_to: int = 32, eos_id: int = 2,
                 impl: str = "jnp", prefill_impl: str = "auto",
                 kv_dtype: str = "bf16", spec_k: int = 0,
                 spec_draft_effort: float = 0.25):
        """kv_dtype='int8' stores the batch KV cache quantized (data +
        per-(slot, head) scale): half the serving KV HBM — the batch
        cache is batch_size times the single-stream one, so this is
        where the bytes live.

        spec_k > 0 enables SPECULATIVE continuous batching: every step,
        all active slots draft spec_k tokens at spec_draft_effort, then
        one vmapped batched verify pass at each slot's own effort scores
        all drafts — slots emit 1..spec_k tokens per step, each exactly
        what their configured effort would have produced (same
        draft/verify contract as Engine.generate_speculative)."""
        self.w = weights
        self.cfg = cfg
        self.B = batch_size
        self.pad_to = pad_to
        self.eos_id = eos_id
        self.impl = impl
        self.prefill_impl = prefill_impl
        assert kv_dtype in ("bf16", "int8"), kv_dtype
        self.kv_quant = kv_dtype == "int8"
        self.spec_k = spec_k
        self.spec_draft_effort = spec_draft_effort
        assert not (spec_k and self.kv_quant), (
            "speculative batching verifies through forward_seq, which "
            "writes bf16 KV rows; no int8 hook path yet")
        L, S = cfg.n_layers, cfg.max_seq_len
        KV, D = cfg.n_kv_heads, cfg.head_dim
        if self.kv_quant:
            z8 = jnp.zeros((L, batch_size, S, KV, D), jnp.int8)
            zs = jnp.zeros((L, batch_size, S, KV), jnp.float32)
            self.k_cache = (z8, zs)
            self.v_cache = (jnp.zeros_like(z8), jnp.zeros_like(zs))
        else:
            self.k_cache = jnp.zeros((L, batch_size, S, KV, D),
                                     jnp.bfloat16)
            self.v_cache = jnp.zeros((L, batch_size, S, KV, D),
                                     jnp.bfloat16)
        # device-side per-slot state
        self.tokens = jnp.zeros((batch_size,), jnp.int32)
        self.pos = jnp.zeros((batch_size,), jnp.int32)
        self.offs = jnp.zeros((batch_size,), jnp.int32)
        self.efforts = jnp.ones((batch_size,), jnp.float32)
        self.slots = [SlotState() for _ in range(batch_size)]
        self._fns: Dict = {}

    # ---------------- jitted kernels ----------------

    def _prefill_fn(self, P: int):
        key = ("prefill", P)
        if key not in self._fns:
            def f(w, ids_lp, b, offset, effort, k_cache, v_cache):
                if self.kv_quant:
                    # prefill into a one-slot bf16 scratch, then quantize
                    # ONLY the P written rows into the int8 cache (rows
                    # >= P are stale and masked until rewritten, exactly
                    # as the bf16 branch relies on)
                    from effort_tpu.models.transformer import (
                        make_kv_cache, quantize_kv_rows)
                    kc_s, vc_s = make_kv_cache(self.cfg)
                    logits, kc_s, vc_s = forward_seq(
                        w, self.cfg, ids_lp, kc_s, vc_s, start_slot=0,
                        rope_offset=offset, mask_from=offset,
                        effort=effort, impl=self.prefill_impl)
                    (kd, ks), (vd, vs) = k_cache, v_cache
                    kq, ksc = quantize_kv_rows(
                        kc_s[:, :P].astype(jnp.float32))
                    vq, vsc = quantize_kv_rows(
                        vc_s[:, :P].astype(jnp.float32))
                    k_cache = (
                        jax.lax.dynamic_update_slice(
                            kd, kq[:, None], (0, b, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            ks, ksc[:, None], (0, b, 0, 0)))
                    v_cache = (
                        jax.lax.dynamic_update_slice(
                            vd, vq[:, None], (0, b, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            vs, vsc[:, None], (0, b, 0, 0)))
                    return jnp.argmax(logits[-1]).astype(jnp.int32), \
                        k_cache, v_cache
                kc_b, vc_b = k_cache[:, b], v_cache[:, b]
                logits, kc_b, vc_b = forward_seq(
                    w, self.cfg, ids_lp, kc_b, vc_b, start_slot=0,
                    rope_offset=offset, mask_from=offset, effort=effort,
                    impl=self.prefill_impl)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, kc_b[:, None], (0, b, 0, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, vc_b[:, None], (0, b, 0, 0, 0))
                return jnp.argmax(logits[-1]).astype(jnp.int32), \
                    k_cache, v_cache
            self._fns[key] = jax.jit(f)
        return self._fns[key]

    def _spec_step_fn(self):
        """Draft spec_k tokens per slot (batched steps at the draft
        effort), verify all of them in one vmapped forward_seq per slot
        at the slot's own effort, accept the agreeing prefix + bonus."""
        key = "spec_step"
        if key not in self._fns:
            k = self.spec_k
            d_eff = self.spec_draft_effort

            def step(w, toks, pos, offs, efforts, remaining,
                     k_cache, v_cache):
                draft_eff = jnp.where(efforts > 0, d_eff, 0.0)

                def dstep(c, i):
                    t, kc, vc = c
                    lg, kc, vc = forward_token_batch(
                        w, self.cfg, t, pos + i, kc, vc, draft_eff,
                        offs=offs, impl=self.impl)
                    return (jnp.argmax(lg, axis=-1).astype(jnp.int32),
                            kc, vc), t

                (_, k_cache, v_cache), consumed = jax.lax.scan(
                    dstep, (toks, k_cache, v_cache),
                    jnp.arange(k, dtype=jnp.int32))
                # consumed [k, B]: tokens fed at positions pos..pos+k-1

                def verify_one(seq, kc_b, vc_b, p, off, eff):
                    return forward_seq(
                        w, self.cfg, seq, kc_b, vc_b, start_slot=p,
                        rope_offset=off, mask_from=off, effort=eff,
                        impl=self.prefill_impl)

                logits, k_cache, v_cache = jax.vmap(
                    verify_one, in_axes=(1, 1, 1, 0, 0, 0),
                    out_axes=(0, 1, 1))(consumed, k_cache, v_cache,
                                        pos, offs, efforts)
                vtoks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                dt = consumed.T                              # [B, k]
                # accept while the NEXT consumed token matched the
                # verifier's prediction (consumed[i+1] == vtoks[:, i])
                match = dt[:, 1:] == vtoks[:, :-1]
                acc = jnp.cumprod(match.astype(jnp.int32), axis=1
                                  ).sum(axis=1)              # 0..k-1
                n_emit = jnp.clip(acc + 1, 1, jnp.maximum(remaining, 1))
                toks2 = vtoks[jnp.arange(vtoks.shape[0]), n_emit - 1]
                pos2 = jnp.minimum(pos + n_emit,
                                   self.cfg.max_seq_len - 1)
                return vtoks, n_emit, toks2, pos2, k_cache, v_cache

            self._fns[key] = jax.jit(step)
        return self._fns[key]

    def _step_fn(self):
        key = "step"
        if key not in self._fns:

            def step(w, toks, pos, offs, efforts, k_cache, v_cache):
                # forward_token_batch routes each projection to ONE
                # batched MXU kernel launch on TPU (row-prefix layout,
                # slots on the MXU sublane rows, per-slot traced effort);
                # elsewhere it vmaps the jnp semantics path.
                logits, k_cache, v_cache = forward_token_batch(
                    w, self.cfg, toks, pos, k_cache, v_cache, efforts,
                    offs=offs, impl=self.impl, kv_quant=self.kv_quant)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        k_cache, v_cache)
            self._fns[key] = jax.jit(step)
        return self._fns[key]

    # ---------------- slot management ----------------

    def free_slots(self) -> List[int]:
        return [b for b, s in enumerate(self.slots) if s.done]

    def active(self) -> List[int]:
        return [b for b, s in enumerate(self.slots) if not s.done]

    def admit(self, b: int, request_id: int, prompt_ids: Sequence[int],
              n_new: int, effort: float = 1.0) -> None:
        """Prefill prompt into slot b; slot joins the next decode step."""
        P = max(self.pad_to,
                -(-len(prompt_ids) // self.pad_to) * self.pad_to)
        assert P + n_new + self.spec_k <= self.cfg.max_seq_len, \
            "sequence too long"
        offset = P - len(prompt_ids)
        ids_lp = [0] * offset + list(prompt_ids)
        first, self.k_cache, self.v_cache = self._prefill_fn(P)(
            self.w, jnp.asarray(ids_lp, jnp.int32),
            jnp.asarray(b, jnp.int32), jnp.asarray(offset, jnp.int32),
            jnp.asarray(effort, jnp.float32), self.k_cache, self.v_cache)
        first = int(first)
        st = self.slots[b]
        st.request_id = request_id
        st.prompt_len = len(prompt_ids)
        st.offset = offset
        st.n_new = n_new
        st.generated = [first]
        st.done = (n_new <= 1) or (first == self.eos_id)
        self.tokens = self.tokens.at[b].set(first)
        self.pos = self.pos.at[b].set(P)
        self.offs = self.offs.at[b].set(offset)
        self.efforts = self.efforts.at[b].set(effort)

    def step(self) -> List[int]:
        """One batched decode step; returns slots that finished."""
        act = self.active()
        if not act:
            return []
        if self.spec_k:
            return self._step_spec(act)
        # inactive slots decode at effort 0: near-zero weight reads
        act_mask = jnp.asarray([0.0 if s.done else 1.0
                                for s in self.slots], jnp.float32)
        preds, self.k_cache, self.v_cache = self._step_fn()(
            self.w, self.tokens, self.pos, self.offs,
            self.efforts * act_mask, self.k_cache, self.v_cache)
        preds_host = np.asarray(jax.device_get(preds))
        finished = []
        new_tokens = self.tokens
        for b in act:
            st = self.slots[b]
            tok = int(preds_host[b])
            st.generated.append(tok)
            new_tokens = new_tokens.at[b].set(tok)
            if (tok == self.eos_id or len(st.generated) >= st.n_new or
                    int(self.pos[b]) + 1 >= self.cfg.max_seq_len - 1):
                st.done = True
                finished.append(b)
        self.tokens = new_tokens
        self.pos = self.pos + 1  # inactive slots advance harmlessly (their
        # stale writes land in cells any future occupant re-writes)
        self.pos = jnp.minimum(self.pos, self.cfg.max_seq_len - 1)
        return finished

    def _step_spec(self, act: List[int]) -> List[int]:
        """Speculative batched step: slots emit 1..spec_k tokens each."""
        act_mask = jnp.asarray([0.0 if s.done else 1.0
                                for s in self.slots], jnp.float32)
        remaining = jnp.asarray(
            [max(1, s.n_new - len(s.generated)) if not s.done else 1
             for s in self.slots], jnp.int32)
        (vtoks, n_emit, self.tokens, self.pos, self.k_cache,
         self.v_cache) = self._spec_step_fn()(
            self.w, self.tokens, self.pos, self.offs,
            self.efforts * act_mask, remaining,
            self.k_cache, self.v_cache)
        vt = np.asarray(jax.device_get(vtoks))
        ne = np.asarray(jax.device_get(n_emit))
        finished = []
        for b in act:
            st = self.slots[b]
            for tok in vt[b, :ne[b]]:
                st.generated.append(int(tok))
                if int(tok) == self.eos_id:
                    break
            if (self.eos_id in st.generated or
                    len(st.generated) >= st.n_new or
                    int(self.pos[b]) + self.spec_k
                    >= self.cfg.max_seq_len - 1):
                st.done = True
                finished.append(b)
        return finished

    def result(self, b: int) -> List[int]:
        gen = self.slots[b].generated
        if self.eos_id in gen:
            gen = gen[:gen.index(self.eos_id) + 1]
        return gen


class ContinuousBatcher:
    """Synchronous scheduler over a BatchEngine: admit-when-free,
    step-while-active. The HTTP server drives it from a worker thread."""

    def __init__(self, engine: BatchEngine):
        self.eng = engine
        self.pending: List[tuple] = []      # (request_id, ids, n_new,
                                            #  effort, callback, on_token)
        self._next_id = 0
        self._callbacks: Dict[int, object] = {}
        self._on_token: Dict[int, object] = {}

    def submit(self, prompt_ids: Sequence[int], n_new: int,
               effort: float, callback, on_token=None) -> int:
        """on_token(token_id): called as each token lands (streaming);
        callback(token_ids) still fires once with the full result."""
        rid = self._next_id
        self._next_id += 1
        self.pending.append((rid, list(prompt_ids), n_new, effort,
                             callback, on_token))
        return rid

    def has_work(self) -> bool:
        return bool(self.pending) or bool(self.eng.active())

    def tick(self) -> None:
        """Admit pending requests into free slots, then one decode step."""
        free = self.eng.free_slots()
        while self.pending and free:
            rid, ids, n_new, effort, cb, on_tok = self.pending.pop(0)
            b = free.pop(0)
            self._callbacks[rid] = cb
            if on_tok is not None:
                self._on_token[rid] = on_tok
            self.eng.admit(b, rid, ids, n_new, effort)
            self._emit_from(b, 0)          # prefill produced a first token
            if self.eng.slots[b].done:     # finished at prefill (n_new<=1)
                self._finish(b)
        act = self.eng.active()
        pre = {b: len(self.eng.slots[b].generated) for b in act}
        finished = self.eng.step()
        for b in act:   # emit every token the step landed (spec steps
            self._emit_from(b, pre[b])     # can land several per slot)
        for b in finished:
            self._finish(b)

    def _emit_from(self, b: int, start: int) -> None:
        st = self.eng.slots[b]
        on_tok = self._on_token.get(st.request_id)
        if on_tok is not None:
            for tok in st.generated[start:]:
                on_tok(tok)

    def _finish(self, b: int) -> None:
        st = self.eng.slots[b]
        self._on_token.pop(st.request_id, None)
        cb = self._callbacks.pop(st.request_id, None)
        if cb is not None:
            cb(self.eng.result(b))

    def run_until_drained(self) -> None:
        while self.has_work():
            self.tick()
