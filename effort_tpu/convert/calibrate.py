"""Activation calibration: measure per-dim activation magnitudes on a
loaded model, for the baked relayout pass (convert_checkpoint(calib=...)).

The reference has no calibration at all — its probes are a weight-only
diagonal sample (getProbes, convert.metal:14-22). Here we additionally
measure the ACTIVATION side: LLM residual streams have persistent
outlier dims (the LLM.int8 observation), and ordering weight rows by
them is what makes prefix streaming read only what the selection needs.

collect_act_rms runs the model on sample token sequences and returns

  rms_m [dim]    mean |rms_norm(h) * norm_w| over both per-layer norms —
                 the input magnitude profile of wq/wk/wv/w1/w3,
  rms_f [hidden] mean |silu(w1 x) * (w3 x)| — the input profile of w2,

averaged over tokens and layers (one global permutation per space; the
per-layer profiles of real LLMs are strongly correlated because outlier
dims persist across layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_token,
                                           make_kv_cache, rms_norm)
from effort_tpu.ops.bucketmul import bucket_matvec


def collect_act_rms(w: ModelWeights, cfg: ModelConfig, token_seqs,
                    impl: str = "jnp") -> dict:
    """token_seqs: list of int token-id lists. Returns {"rms_m", "rms_f"}.

    Works on an UNBAKED checkpoint (any bucket config; run at effort=1).
    """
    L = cfg.n_layers

    def token_stats(w, tok, pos, kc, vc):
        """One token's contribution: (acc_m, acc_f, new kc, new vc)."""
        _, kc, vc, h_layers = forward_token(w, cfg, tok, pos, kc, vc,
                                            effort=1.0, impl=impl,
                                            collect_h=True)
        # h_layers[l] = residual AFTER layer l; layer l's input is the
        # h_layers[l-1] (l>=1) or this token's embedding (l=0).
        # (The ffn-norm profile uses the post-layer residual — a
        # close proxy for the post-attention point.)
        emb = w.tok_embeddings[tok].astype(jnp.float32)
        inputs = jnp.concatenate([emb[None], h_layers[:-1]],
                                 axis=0)                       # [L, dim]
        acc_m = jnp.zeros((cfg.dim,))
        acc_f = jnp.zeros((cfg.hidden_dim,))
        for l in range(L):
            hn_a = rms_norm(inputs[l], w.layers.attn_norm[l],
                            cfg.norm_eps)
            hn_f = rms_norm(h_layers[l], w.layers.ffn_norm[l],
                            cfg.norm_eps)
            acc_m = acc_m + jnp.abs(hn_a) + jnp.abs(hn_f)
            # FFN hidden profile (expert 0 path; MoE experts share
            # the hidden space statistics closely enough for one
            # global permutation)
            x1 = bucket_matvec(w.layers.w1, hn_f, 1.0,
                               expert=l * cfg.n_experts, impl=impl)
            x3 = bucket_matvec(w.layers.w3, hn_f, 1.0,
                               expert=l * cfg.n_experts, impl=impl)
            acc_f = acc_f + jnp.abs(jax.nn.silu(x1) * x3)
        return acc_m, acc_f, kc, vc

    @jax.jit
    def run_seq(w, toks):
        """Whole sequence in ONE device dispatch (the per-token host
        loop was ~14 round-trips per token — minutes over a tunnel).
        `w` rides as an argument: closing over it would inline the
        weights as MLIR constants and wedge the remote compiler."""
        kc, vc = make_kv_cache(cfg)

        def one(carry, tp):
            kc, vc, am, af = carry
            tok, pos = tp
            dm, df, kc, vc = token_stats(w, tok, pos, kc, vc)
            return (kc, vc, am + dm, af + df), ()

        T = toks.shape[0]
        (kc, vc, am, af), _ = jax.lax.scan(
            one, (kc, vc, jnp.zeros((cfg.dim,)),
                  jnp.zeros((cfg.hidden_dim,))),
            (toks, jnp.arange(T, dtype=jnp.int32)))
        return am, af

    acc_m = jnp.zeros((cfg.dim,))
    acc_f = jnp.zeros((cfg.hidden_dim,))
    n_m = n_f = 0
    for seq in token_seqs:
        am, af = run_seq(w, jnp.asarray(seq, jnp.int32))
        acc_m = acc_m + am
        acc_f = acc_f + af
        n_m += 2 * L * len(seq)
        n_f += L * len(seq)
    return {"rms_m": acc_m / max(n_m, 1), "rms_f": acc_f / max(n_f, 1)}
