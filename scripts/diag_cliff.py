"""Diagnose the model-level quality cliff below 50% effort (VERDICT r2 #1).

Round 2 measured, on the trained byte-LM checkpoint, argmax agreement
1.0->0.99 down to effort 0.5 and then a cliff (0.35 @0.4, 0.05 @0.25)
while the reference retains ~80% @25% (docs/ryc/ryc0.4.png). Candidate
causes and the stage that isolates each:

  bisect   -> run the SAME agreement sweep with impl="jnp" (exact
              bucketMul semantics, reads all weights) vs impl="pallas"
              (production kernel with the alpha-bounded streamed row
              prefix, kernels/fused_stream.py). jnp clean + pallas
              cliffing == the kernel's prefix truncation is the bug.
  coverage -> measure, on real activations, how much of the SELECTED
              (stat_i*|v_i| > cutoff) row mass falls inside the streamed
              prefix ceil(count*alpha) for every projection/effort; also
              the prefix length that would cover 99% of selected mass.
  tau      -> agreement at effort .5/.4/.25 for coverage targets
              tau in {0.9, 0.97, 1.0} via the EFFORT_TPU_TAU override
              (replaced the round-2 alpha sweep after the coverage-
              bound kernel redesign).
  floors   -> per-projection effort-floor configs vs agreement and
              extra-FLOPs cost.

Artifacts: runs/diag/{bisect,coverage,alpha}.json.
Usage: python scripts/diag_cliff.py --stage bisect|bisect_jnp|coverage|floors|tau [--cpu]
       [--ckpt runs/trained_quality/ckpt_bf16]
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

EFFORTS = [1.0, 0.6, 0.5, 0.45, 0.4, 0.35, 0.3, 0.25, 0.2]


def _engine(ckpt, impl):
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.weights import load_bucketized
    w, cfg, _ = load_bucketized(ckpt)
    return Engine(w, cfg, impl=impl, dynamic_effort=True, eos_id=-1), w, cfg


def _holdout(n0, n1):
    corpus = np.load(f"{ROOT}/runs/trained_quality/corpus.npy")
    split = int(len(corpus) * 0.98)
    return corpus[split + n0:split + n1].astype(int).tolist()


def stage_bisect(d, ckpt, impls=("pallas", "jnp")):
    from effort_tpu.eval import harness
    out = {}
    for impl in impls:
        eng, _, _ = _engine(ckpt, impl)
        t0 = time.time()
        out[impl] = harness.agreement_sweep(eng, _holdout(0, 96),
                                            n_tokens=96, efforts=EFFORTS)
        print(f"[{impl}] {time.time()-t0:.0f}s: " + "  ".join(
            f"{e:.2f}:{v:.3f}" for e, v in out[impl].items()), flush=True)
    path = f"{d}/bisect.json"
    if os.path.exists(path):
        prev = json.load(open(path))
        prev.update(out)
        out = prev
    json.dump(out, open(path, "w"), indent=1, default=float)


def stage_coverage(d, ckpt, alpha=1.4):
    """Selected-mass coverage of the streamed prefix, on real activations."""
    import jax
    import jax.numpy as jnp
    from effort_tpu.models.transformer import (forward_token, make_kv_cache,
                                               rms_norm)
    from effort_tpu.ops.effort import compute_cutoff
    from effort_tpu.ops.layouts import strided_sample
    from effort_tpu.models.weights import load_bucketized

    w, cfg, _ = load_bucketized(ckpt)
    toks = jnp.asarray(_holdout(0, 96), jnp.int32)

    @jax.jit
    def collect(w, toks):
        kc, vc = make_kv_cache(cfg)

        def one(carry, tp):
            kc, vc = carry
            tok, pos = tp
            _, kc, vc, h_layers = forward_token(
                w, cfg, tok, pos, kc, vc, effort=1.0, impl="jnp",
                collect_h=True)
            return (kc, vc), h_layers

        T = toks.shape[0]
        (_, _), H = jax.lax.scan(one, (kc, vc),
                                 (toks, jnp.arange(T, dtype=jnp.int32)))
        return H  # [T, L, dim] residual AFTER each layer

    H = np.asarray(collect(w, toks))            # [T, L, dim]
    layers = [0, cfg.n_layers // 2, cfg.n_layers - 1]
    tok_ids = list(range(len(H) - 8, len(H)))

    def cover_one(bm, v, e, inst):
        # layers are packed on the expert axis (expert = layer instance)
        vp = np.asarray(bm.permute_v(jnp.asarray(v), inst))
        cutoff = float(compute_cutoff(
            strided_sample(jnp.asarray(vp), bm.in_dim, bm.probes.shape[1]),
            bm.probes[inst], e))
        stat = np.asarray(bm.stats[inst][:, 0])
        score = stat * np.abs(vp)
        sel = score > cutoff
        cnt = int(sel.sum())
        prefix = min(int(np.ceil(cnt * alpha)), bm.in_dim)
        mass = np.where(sel, score, 0.0)
        tot = mass.sum() + 1e-30
        cum = np.cumsum(mass)
        r99 = int(np.searchsorted(cum, 0.99 * tot) + 1)
        return {"cnt": cnt, "prefix": prefix,
                "row_cov": float(sel[:prefix].sum() / max(cnt, 1)),
                "mass_cov": float(cum[prefix - 1] / tot) if prefix else 0.0,
                "rows_for_99pct_mass": r99,
                "frac_in": cnt / bm.in_dim}

    out = {}
    for l in layers:
        for name in ("wq", "wk", "wv", "w1", "w3", "w2"):
            bm = getattr(w.layers, name, None)
            if bm is None:
                continue
            rows = {}
            for e in (0.5, 0.4, 0.3, 0.25):
                accs = []
                for t in tok_ids:
                    h_in = H[t][l - 1] if l > 0 else np.asarray(
                        w.tok_embeddings[int(toks[t])], np.float32)
                    nw = (w.layers.attn_norm[l] if name in ("wq", "wk", "wv")
                          else w.layers.ffn_norm[l])
                    hn = np.asarray(rms_norm(jnp.asarray(h_in, jnp.float32),
                                             nw, cfg.norm_eps))
                    if name == "w2":
                        # w2's input: silu(w1 x) * w3 x at full effort
                        import jax.nn
                        from effort_tpu.ops.bucketmul import bucket_matvec
                        x1 = bucket_matvec(w.layers.w1, jnp.asarray(hn), 1.0,
                                           expert=l, impl="jnp")
                        x3 = bucket_matvec(w.layers.w3, jnp.asarray(hn), 1.0,
                                           expert=l, impl="jnp")
                        hn = np.asarray(jax.nn.silu(x1) * x3)
                    accs.append(cover_one(bm, hn, e, l))
                rows[e] = {k: float(np.mean([a[k] for a in accs]))
                           for k in accs[0]}
            out[f"L{l}.{name}"] = rows
            print(f"L{l}.{name}: " + "  ".join(
                f"{e}: mass_cov={r['mass_cov']:.3f} "
                f"r99={r['rows_for_99pct_mass']}/{bm.in_dim}"
                for e, r in rows.items()), flush=True)
    json.dump(out, open(f"{d}/coverage.json", "w"), indent=1, default=float)


FLOOR_CONFIGS = {
    "none": None,
    "kv40": {"wk": 0.4, "wv": 0.4},
    "kv50": {"wk": 0.5, "wv": 0.5},
    "kv50_wo35": {"wk": 0.5, "wv": 0.5, "wo": 0.35},
    "kv50_w2_35": {"wk": 0.5, "wv": 0.5, "w2": 0.35},
}


def stage_floors(d, ckpt):
    """Per-projection effort floors (the mitigation for small-model
    low-effort quality): model-level agreement at low efforts per floor
    config, plus the analytic extra-FLOPs fraction each floor costs."""
    import dataclasses
    from effort_tpu.eval import harness
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.weights import load_bucketized
    w, cfg, _ = load_bucketized(ckpt)
    # per-projection FLOPs share (dense-equivalent)
    dims = {"wq": cfg.dim * cfg.n_heads * cfg.head_dim,
            "wk": cfg.dim * cfg.n_kv_heads * cfg.head_dim,
            "wv": cfg.dim * cfg.n_kv_heads * cfg.head_dim,
            "wo": cfg.n_heads * cfg.head_dim * cfg.dim,
            "w1": cfg.dim * cfg.hidden_dim,
            "w3": cfg.dim * cfg.hidden_dim,
            "w2": cfg.hidden_dim * cfg.dim}
    tot = sum(dims.values())
    out = {}
    efforts = [0.35, 0.3, 0.25, 0.2]
    for name, fl in FLOOR_CONFIGS.items():
        cfg_f = dataclasses.replace(cfg, effort_floors=fl)
        eng = Engine(w, cfg_f, impl="auto", dynamic_effort=True, eos_id=-1)
        t0 = time.time()
        agr = harness.agreement_sweep(eng, _holdout(0, 96), n_tokens=96,
                                      efforts=efforts)
        extra = {e: sum(dims[p] * (max(e, (fl or {}).get(p, 0.0)) - e)
                        for p in dims) / (tot * e) for e in efforts}
        out[name] = {"agreement": agr,
                     "extra_work_frac": {e: round(x, 4)
                                         for e, x in extra.items()}}
        print(f"[{name}] {time.time()-t0:.0f}s: " + "  ".join(
            f"{e}:{v:.3f}(+{out[name]['extra_work_frac'][e]:.0%})"
            for e, v in agr.items()), flush=True)
    json.dump(out, open(f"{d}/floors.json", "w"), indent=1, default=float)


def stage_tau(d, ckpt):
    """Model-level agreement vs the coverage target tau (env override;
    subprocess per value — _TAU is read at import). Historical note:
    this stage replaced the round-2 'alpha' sweep after the kernels
    switched from the alpha prefix heuristic to the tau selected-mass
    coverage bound (alpha args are ignored now)."""
    import subprocess
    out = {}
    for a in (0.9, 0.97, 1.0):
        code = f"""
import sys, json
sys.path.insert(0, {ROOT!r})
from effort_tpu.eval import harness
from scripts.diag_cliff import _engine, _holdout
eng, _, _ = _engine({ckpt!r}, "pallas")
r = harness.agreement_sweep(eng, _holdout(0, 96), n_tokens=96,
                            efforts=[0.5, 0.4, 0.25])
print("RESULT" + json.dumps(r, default=float))
"""
        env = dict(os.environ, EFFORT_TPU_TAU=str(a))
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=1200)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT")]
        if not line:
            print(f"tau={a}: FAILED\n{p.stdout[-500:]}\n{p.stderr[-800:]}")
            continue
        out[str(a)] = json.loads(line[0][6:])
        print(f"tau={a} ({time.time()-t0:.0f}s): " + "  ".join(
            f"{e}:{v:.3f}" for e, v in out[str(a)].items()), flush=True)
    json.dump(out, open(f"{d}/tau.json", "w"), indent=1, default=float)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="bisect")
    ap.add_argument("--ckpt",
                    default=f"{ROOT}/runs/trained_quality/ckpt_bf16")
    ap.add_argument("--dir", default=f"{ROOT}/runs/diag")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (with EFFORT_TPU_INTERPRET=1 the "
                    "production kernels run under the pallas interpreter)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.dir, exist_ok=True)
    stages = (["bisect", "coverage", "tau"] if args.stage == "all"
              else [args.stage])
    for s in stages:
        print(f"=== {s} ===", flush=True)
        {"bisect": lambda: stage_bisect(args.dir, args.ckpt),
         "bisect_jnp": lambda: stage_bisect(args.dir, args.ckpt,
                                            impls=("jnp",)),
         "floors": lambda: stage_floors(args.dir, args.ckpt),
         "tau": lambda: stage_tau(args.dir, args.ckpt),
         "coverage": lambda: stage_coverage(args.dir, args.ckpt),
         }[s]()


if __name__ == "__main__":
    main()
