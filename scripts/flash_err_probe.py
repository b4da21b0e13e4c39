"""Localize the flash-attention max-rel-error tail at large shapes
(VERDICT r4 weak #5): max-rel doubles from 0.065 (1024x2048) to 0.111
(4096x8192) while mean-rel stays ~0.002 — which elements, and why?

Hypothesis: the worst relative errors sit on near-zero outputs
(cancellation in the weighted V sum makes |out| tiny, so a fixed
absolute bf16/accumulation error divides by ~0), i.e. the tail is a
property of the METRIC, not error growth in the kernel. This probe
measures, per shape:
  - the max-rel element's |out| percentile vs the output-magnitude
    distribution;
  - max ABSOLUTE error normalized by the per-row output rms (the
    scale-aware bound flash implementations quote);
  - rel-err conditioned on |out| >= rms/10 (errors on outputs that
    matter).

Writes artifacts/flash_error.json; docs/kernels.md cites it.
Run on TPU: python scripts/flash_err_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def probe(T, S, seed=0):
    import jax
    import jax.numpy as jnp
    from effort_tpu.config import mistral_7b
    from effort_tpu.kernels.flash_attention import flash_attention_seq
    from effort_tpu.models.transformer import _attention_seq

    cfg = mistral_7b(max_seq_len=S)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    # same generators/shapes as scripts/bench_flash.py (whose numbers
    # this explains)
    kc = jax.random.normal(jax.random.key(1), (S, KV, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.key(2), (S, KV, D), jnp.bfloat16)
    slots = jnp.arange(T)
    Q2 = jax.random.normal(jax.random.key(3), (T, H * D), jnp.float32)

    out_f = jax.jit(lambda q, k, v: flash_attention_seq(
        q, k, v, 0, 0, H, D))(Q2, kc, vc)
    out_x = jax.jit(lambda q, k, v: _attention_seq(
        q, k, v, slots, 0, cfg))(Q2, kc, vc)

    f = np.asarray(out_f, np.float64)
    x = np.asarray(out_x, np.float64)
    err = np.abs(f - x)
    rel = err / (np.abs(x) + 1e-30)
    flat = rel.ravel()
    i = int(np.argmax(flat))
    r, c = np.unravel_index(i, rel.shape)
    xa = np.abs(x)
    row_rms = np.sqrt((x ** 2).mean(axis=1, keepdims=True))
    # |out| percentile of the worst-rel element within its row
    pct = float((xa[r] <= xa[r, c]).mean())
    sig = xa >= row_rms / 10.0        # outputs that matter
    return {
        "shape": f"{T}x{S}",
        "max_rel": round(float(flat[i]), 5),
        "worst_elem_abs_out": round(float(xa[r, c]), 6),
        "worst_elem_out_percentile_in_row": round(pct, 4),
        "row_rms_at_worst": round(float(row_rms[r, 0]), 4),
        "max_abs_err_over_row_rms": round(
            float((err / (row_rms + 1e-30)).max()), 6),
        "max_rel_on_significant": round(float(rel[sig].max()), 6),
        "mean_rel": round(float(rel.mean()), 6),
        "frac_out_below_rms_over_10": round(float(1 - sig.mean()), 4),
    }


def main():
    out = {}
    for T, S in ((1024, 2048), (4096, 8192)):
        out[f"{T}x{S}"] = probe(T, S)
        print(json.dumps(out[f"{T}x{S}"]), flush=True)
    os.makedirs(f"{ROOT}/artifacts", exist_ok=True)
    json.dump(out, open(f"{ROOT}/artifacts/flash_error.json", "w"),
              indent=1)
    print("wrote artifacts/flash_error.json")


if __name__ == "__main__":
    main()
