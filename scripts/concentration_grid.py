"""Recipe grid for residual-stream activation concentration
(VERDICT r4 next #2).

The streaming kernel's pure-effort speedup needs the RESIDUAL stream's
per-dim rms mass to concentrate (top-25% mass >= ~0.45); the levers
tried so far — tokenization (byte->word: FFN-hidden 0.28->0.53) and
scale+vocab (wordlm-1b, 32k vocab, 3L: residual STILL 0.30) — moved
only the FFN space. This grid measures the remaining known levers from
the outlier literature on a fast 1-layer Mistral-width model:

  base    — the wordlm recipe as-is (control)
  bos     — fixed sink token at position 0 of every crop (attention
            sinks are the documented massive-activation trigger,
            Sun et al. 2024)
  nowd    — weight_decay 0 (decay suppresses the large weights outlier
            dims ride on)
  hilr    — lr 1e-3 (optimizer-driven outlier emergence)
  all     — bos + nowd + hilr combined

Readout per variant: calib profile stats of rms_m (residual) and rms_f
(FFN hidden) + the streamed-chunk fraction the kernel would see.
Writes artifacts/quality/concentration_grid.json. Run on TPU:
  python scripts/concentration_grid.py [--steps 1500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import Counter

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    "base": {},
    "bos":  {"bos_id": 1},
    "nowd": {"weight_decay": 0.0},
    "hilr": {"lr": 1e-3},
    "all":  {"bos_id": 1, "weight_decay": 0.0, "lr": 1e-3},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--dir", default=f"{ROOT}/runs/conc_grid")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    D = args.dir
    os.makedirs(D, exist_ok=True)

    import dataclasses

    import scripts.trained_wordlm as tw
    from scripts.trained_quality_ondevice import params_to_raw, \
        profile_stats
    from effort_tpu.config import BucketConfig
    from effort_tpu.convert.calibrate import collect_act_rms
    from effort_tpu.eval.harness import streamed_fraction
    from effort_tpu.models.transformer import assemble_weights
    from effort_tpu.train import TrainConfig, train

    # 1-layer Mistral widths, 8k word vocab, 20 MB corpus — the
    # bench-regen recipe (fast: the grid is 5 trainings)
    cfg = dataclasses.replace(tw.model_cfg(), n_layers=1,
                              name="conc-grid-250m")
    cpath = f"{D}/corpus.npy"
    if os.path.exists(cpath):
        corpus = np.load(cpath)
    else:
        text = tw._local_text(20.0)
        counts = Counter(tw._PIECE.findall(text))
        words = [w for w, _ in counts.most_common(tw.VOCAB - tw.N_BYTE)]
        corpus = tw.encode(text, {w: tw.N_BYTE + i
                                  for i, w in enumerate(words)})
        np.save(cpath, corpus)
        json.dump(words, open(f"{D}/vocab.json", "w"))
    print(f"corpus: {len(corpus)/1e6:.1f}M tokens", flush=True)
    split = int(len(corpus) * 0.98)
    hold = corpus[split:].astype(int).tolist()

    out_path = f"{ROOT}/artifacts/quality/concentration_grid.json"
    out = json.load(open(out_path)) if os.path.exists(out_path) else {}
    out.setdefault("steps", args.steps)
    out["model"] = cfg.name

    for name in args.variants.split(","):
        if name in out.get("variants", {}):
            print(f"[{name}] already measured, skipping", flush=True)
            continue
        knobs = VARIANTS[name]
        tcfg = TrainConfig(batch=8, seq_len=512, steps=args.steps,
                           lr=knobs.get("lr", 3e-4),
                           weight_decay=knobs.get("weight_decay", 0.1),
                           warmup=min(150, args.steps // 10),
                           scan_chunk=25, holdout_frac=0.02,
                           bos_id=knobs.get("bos_id"))
        t0 = time.time()
        params, hist = train(cfg, corpus, tcfg, progress=lambda *a: None)
        raw = params_to_raw(params, cfg)
        del params
        bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype="bf16")
        w_uncal = assemble_weights(raw, cfg, bcfg)
        rng = np.random.default_rng(3)
        seqs = [corpus[s:s + 192].astype(int).tolist()
                for s in rng.integers(0, len(corpus) - 200, 3)]
        if knobs.get("bos_id") is not None:
            seqs = [[knobs["bos_id"]] + s[:-1] for s in seqs]
        rms = collect_act_rms(w_uncal, cfg, seqs, impl="auto")
        del w_uncal
        w = assemble_weights(raw, cfg, bcfg, rms_m=rms["rms_m"],
                             rms_f=rms["rms_f"], bake=True)
        del raw
        sf = streamed_fraction(w, cfg, hold[:48], efforts=(0.35, 0.25))
        del w
        row = {
            "knobs": knobs,
            "train_s": round(time.time() - t0, 1),
            "holdout_nats": round(float(hist[-1][2]), 3),
            "rms_m": profile_stats(rms["rms_m"]),
            "rms_f": profile_stats(rms["rms_f"]),
            **{k: v for k, v in sf.items()},
        }
        out.setdefault("variants", {})[name] = row
        print(f"[{name}] rms_m top25 "
              f"{row['rms_m']['top25pct_mass']:.3f}  rms_f top25 "
              f"{row['rms_f']['top25pct_mass']:.3f}  streamed@25 "
              f"{row.get('streamed_chunk_frac_25')}  "
              f"({row['train_s']:.0f}s)", flush=True)
        json.dump(out, open(out_path, "w"), indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
