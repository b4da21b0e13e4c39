"""Measured speed/quality operating points on a TRAINED checkpoint.

The flagship coupling (VERDICT r3 missing #2/#3) on real trained
weights: the wordlm-500m's residual-stream profile is flat-ish
(top25 ~0.31) so the tau=0.97 coverage bound streams ~97% of w1/attn
chunks and bf16 effort alone is ~1.1x dense — the knobs that buy real
decode speed on such a checkpoint are exactly the reference's own
stack, each measured here WITH its agreement cost on the same weights:

  tau          — selected-mass coverage (the kernel's speed/quality
                 knob; lower tau streams the highest-mass chunk prefix)
  percent_load — truncated loading (the reference's "drop the last
                 20-30% of bucket rows ~unnoticed", loader.swift:316)
  dtype        — int8 buckets (halve the bytes; the reference parked
                 its Q8, docs/q8.html)

Output: runs/trained_quality_wordlm/operating_points.json +
artifacts/quality/operating_points_wordlm500m.json. Each row:
{config, toks_per_s per effort, speedup vs FULL bf16 dense,
agreement@{0.5,0.25} teacher-forced over 500 real holdout tokens}.

Usage: python scripts/trained_operating_points.py [--ckpt DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

D = f"{ROOT}/runs/trained_quality_wordlm"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=f"{D}/ckpt_bf16")
    ap.add_argument("--ckpt-int8", default=f"{D}/ckpt_int8")
    ap.add_argument("--out", default=f"{D}/operating_points.json")
    args = ap.parse_args()

    import jax
    import effort_tpu.kernels.fused_stream as fs
    from effort_tpu.eval.harness import (decode_speed_sweep,
                                         tf_agreement_sweep)
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.weights import (attach_dense, load_bucketized,
                                           truncate_model)

    corpus = np.load(f"{D}/corpus.npy")
    split = int(len(corpus) * 0.98)
    hold500 = corpus[split:split + 500].astype(int).tolist()
    efforts = (1.0, 0.5, 0.35, 0.25)

    out = {"rows": []}

    def measure(w, cfg, name, t_dense_ref, include_dense=False):
        t0 = time.time()
        r = {"config": name}
        sp = decode_speed_sweep(w, cfg, efforts=efforts,
                                include_dense=include_dense)
        r.update(sp)
        if t_dense_ref:
            for e in efforts:
                tag = int(e * 100)
                r[f"speedup_vs_full_dense_{tag}"] = round(
                    r[f"toks_per_s_{tag}"] / t_dense_ref, 3)
        eng = Engine(w, cfg, impl="auto", dynamic_effort=True, eos_id=-1)
        agr = tf_agreement_sweep(eng, hold500, efforts=(0.5, 0.25))
        r["agreement_50"] = round(agr[0.5], 3)
        r["agreement_25"] = round(agr[0.25], 3)
        r["seconds"] = round(time.time() - t0, 1)
        print(f"[{name}] {r}", flush=True)
        out["rows"].append(r)
        json.dump(out, open(args.out, "w"), indent=1)
        return r

    # ---- full bf16, default tau: the baseline row (dense included) ----
    w, cfg, _ = load_bucketized(args.ckpt, load_dense=False)
    w = attach_dense(w)
    jax.block_until_ready(jax.tree_util.tree_leaves(w)[0])
    print(f"loaded {args.ckpt} ({cfg.name})", flush=True)
    r0 = measure(w, cfg, f"bf16 tau={fs._TAU}", None, include_dense=True)
    dense_ref = r0["dense_toks_per_s"]
    out["dense_toks_per_s"] = dense_ref

    # ---- tau sweep (module-global patch; new jitted closures per tau
    # re-trace with the new static tau) ----
    tau0 = fs._TAU
    for tau in (0.85, 0.7):
        fs._TAU = tau
        measure(w, cfg, f"bf16 tau={tau}", dense_ref)
    fs._TAU = tau0

    # ---- truncated loading (reference loader.swift:316-339; dense
    # copies no longer match, so speedups are vs the FULL dense) ----
    for pl in (0.75, 11 / 16):
        wt = truncate_model(w, pl)
        jax.block_until_ready(jax.tree_util.tree_leaves(wt)[0])
        measure(wt, cfg, f"bf16 tau={tau0} percent_load={pl:.3f}",
                dense_ref)
        del wt

    del w

    # ---- int8 buckets (if converted) ----
    if os.path.exists(f"{args.ckpt_int8}/config.json"):
        w8, cfg8, _ = load_bucketized(args.ckpt_int8, load_dense=False)
        jax.block_until_ready(jax.tree_util.tree_leaves(w8)[0])
        measure(w8, cfg8, f"int8 tau={tau0}", dense_ref)
        fs._TAU = 0.85
        measure(w8, cfg8, "int8 tau=0.85", dense_ref)
        fs._TAU = tau0

    os.makedirs(f"{ROOT}/artifacts/quality", exist_ok=True)
    json.dump(out, open(
        f"{ROOT}/artifacts/quality/operating_points_wordlm500m.json",
        "w"), indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
