"""Word-level LM at Mistral matrix widths — the concentrated-activation
experiment (VERDICT r3 next #3, the flagship-claim closer).

Round 3's trained byte-LMs (90M/310M) have FLAT activation profiles
(top-25% dims carry ~28% of mass), so the coverage-bound kernel streams
~every chunk and effort gives no trained-checkpoint speedup — while the
2.25x headline lives on synthetic outlier-imprinted weights. The two
known levers for real activation concentration (LLM.int8-style
persistent outlier dims) are tokenization and scale: word/BPE-token LMs
develop outlier dims far earlier than byte LMs, and the streaming win
grows with matrix width. This experiment moves BOTH levers at once while
staying trainable on one chip:

  - word-level vocab (8192: 256 byte-fallback ids + top word pieces) on
    ~60 MB of local code/prose — a heavy Zipf distribution, the
    frequency skew outlier emergence feeds on;
  - Mistral's exact matrix shapes (dim 4096, hidden 14336, GQA 32/8
    heads) at 2 layers: ~500M params, the same w1/wqkv shapes as the
    synthetic speed headline, so kernel speedups transfer 1:1.

Pipeline (stages resumable, artifacts under runs/trained_quality_wordlm):
  corpus  -> vocab.json + corpus.npy (word ids)
  train   -> effort_tpu.train on TPU; hf/ safetensors export
  analyze -> on-device: uncal assemble -> activation calibration ->
             concentration profile -> calibrated bake -> agreement/NLL
             sweeps (incl. 500-token teacher-forced real-text protocol,
             benchmark.swift:128-156 scale) -> decode speed + streamed
             fraction per effort (speed and quality on ONE model)
  convert -> CPU: hf/ -> ckpt_bf16 (production bucket checkpoint, picked
             up by bench.py --phase trained)

Usage: python scripts/trained_wordlm.py [--stage all|corpus|train|analyze|convert]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from collections import Counter

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from scripts.trained_quality_ondevice import params_to_raw, profile_stats

D = os.environ.get("WORDLM_DIR", f"{ROOT}/runs/trained_quality_wordlm")
VOCAB = 8192
N_LAYERS = 2
NAME = "wordlm-500m"
TAG = "wordlm500m"          # artifacts/quality/*_{TAG}.json mirror suffix
CORPUS_MB = 60.0
BATCH = 8
EFFORTS = [1.0, 0.8, 0.6, 0.5, 0.4, 0.35, 0.3, 0.25, 0.2, 0.15]

# tokenizer scheme lives in the package (serving/CLI use it on trained
# checkpoints); these aliases keep the script's public names stable
from effort_tpu.runtime.word_tokenizer import (  # noqa: E402
    N_BYTE, PIECE_RE as _PIECE, WordTokenizer)


def model_cfg():
    from effort_tpu.config import ModelConfig
    return ModelConfig(name=NAME, dim=4096, hidden_dim=14336,
                       n_layers=N_LAYERS, n_heads=32, n_kv_heads=8,
                       head_dim=128, vocab_size=VOCAB, max_seq_len=2048,
                       rope_theta=1e6)


# --------------------------------------------------------------------------
# corpus / tokenizer
# --------------------------------------------------------------------------

def _local_text(target_mb: float = None) -> str:
    if target_mb is None:
        target_mb = CORPUS_MB
    paths = []
    for pat in (f"{ROOT}/effort_tpu/**/*.py", f"{ROOT}/tests/*.py",
                f"{ROOT}/scripts/*.py", f"{ROOT}/docs/*.md",
                f"{ROOT}/*.md"):
        paths += sorted(glob.glob(pat, recursive=True))
    import site
    import sysconfig
    stdlib = sysconfig.get_paths()["stdlib"]
    paths += sorted(glob.glob(f"{stdlib}/**/*.py", recursive=True))
    sp = site.getsitepackages()[0]
    paths += sorted(glob.glob(f"{sp}/**/*.py", recursive=True))
    chunks, total = [], 0
    for p in paths:
        try:
            b = open(p, "rb").read()
        except OSError:
            continue
        chunks.append(b.decode("utf-8", errors="ignore"))
        total += len(b)
        if total >= target_mb * 1e6:
            break
    return "".join(chunks)


def encode(text: str, word_ids: dict) -> np.ndarray:
    tk = WordTokenizer([])
    tk.word_ids = word_ids
    return np.asarray(tk.encode(text), np.int32)


def decode_ids(ids, words: list) -> str:
    return WordTokenizer(words).decode(ids)


def stage_corpus():
    os.makedirs(D, exist_ok=True)
    t0 = time.time()
    text = _local_text()
    counts = Counter(_PIECE.findall(text))
    words = [w for w, _ in counts.most_common(VOCAB - N_BYTE)]
    word_ids = {w: N_BYTE + i for i, w in enumerate(words)}
    ids = encode(text, word_ids)
    np.save(f"{D}/corpus.npy", ids)
    json.dump(words, open(f"{D}/vocab.json", "w"))
    cov = sum(c for w, c in counts.items() if w in word_ids) / max(
        1, sum(counts.values()))
    print(f"corpus: {len(text)/1e6:.1f} MB text -> {len(ids)/1e6:.1f}M "
          f"tokens, vocab {VOCAB} covers {cov:.1%} of pieces "
          f"({time.time()-t0:.0f}s)")


# --------------------------------------------------------------------------
# train
# --------------------------------------------------------------------------

def stage_train(steps: int):
    from effort_tpu.train import TrainConfig, export_hf, train
    cfg = model_cfg()
    corpus = np.load(f"{D}/corpus.npy")
    # batch 8: at dim-4096 geometry the f32 params+AdamW+grads are
    # already 8 GB; the remat'd [B, KV, rep, T, T] score tensor plus
    # [B, T, hidden] FFN temporaries OOM the 16 GB chip at B>=16
    # (measured: both 32 and 16 hit ResourceExhausted)
    tcfg = TrainConfig(batch=BATCH, seq_len=512, steps=steps, lr=3e-4,
                       warmup=min(200, steps // 10), scan_chunk=25,
                       holdout_frac=0.02,
                       mu_dtype="bfloat16" if N_LAYERS > 2 else "float32")
    t0 = time.time()
    params, hist = train(cfg, corpus, tcfg)
    train_s = time.time() - t0
    print(f"trained {steps} steps in {train_s:.0f}s; final train "
          f"{hist[-1][1]:.3f} holdout {hist[-1][2]:.3f} nats/token",
          flush=True)
    json.dump({"steps": steps, "history": hist, "seconds": train_s},
              open(f"{D}/train_history.json", "w"))
    t0 = time.time()
    export_hf(params, cfg, f"{D}/hf")
    print(f"exported hf/ in {time.time()-t0:.0f}s", flush=True)
    return params


# --------------------------------------------------------------------------
# analyze (on-device: profile + quality + speed on ONE model)
# --------------------------------------------------------------------------

def _load_params_from_hf():
    """Reload the trained params (hf/ safetensors) as the trainer pytree.
    Used when analyze runs in a fresh process; `--stage all` passes the
    in-memory params straight through instead (5 min of tunnel saved)."""
    from effort_tpu.runtime.safetensors_io import MultiShardReader
    cfg = model_cfg()
    r = MultiShardReader(f"{D}/hf")
    L = cfg.n_layers

    def stack(fmt):
        return np.stack([r[fmt.format(l=l)] for l in range(L)])

    return {
        "embed": r["model.embed_tokens.weight"],
        "norm": r["model.norm.weight"],
        "lm_head": r["lm_head.weight"],
        "layers": {
            "attn_norm": stack("model.layers.{l}.input_layernorm.weight"),
            "ffn_norm": stack(
                "model.layers.{l}.post_attention_layernorm.weight"),
            "wq": stack("model.layers.{l}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{l}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{l}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{l}.self_attn.o_proj.weight"),
            "w1": stack("model.layers.{l}.mlp.gate_proj.weight"),
            "w2": stack("model.layers.{l}.mlp.down_proj.weight"),
            "w3": stack("model.layers.{l}.mlp.up_proj.weight"),
        },
    }


def stage_analyze(params=None):
    import jax
    import jax.numpy as jnp
    from effort_tpu.config import BucketConfig
    from effort_tpu.convert.calibrate import collect_act_rms
    from effort_tpu.eval import harness
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.transformer import assemble_weights
    from effort_tpu.kernels.fused_stream import _TAU

    cfg = model_cfg()
    corpus = np.load(f"{D}/corpus.npy")
    if params is None:
        t0 = time.time()
        params = _load_params_from_hf()
        print(f"reloaded hf params ({time.time()-t0:.0f}s)", flush=True)
    raw = params_to_raw(
        {"embed": jnp.asarray(params["embed"]),
         "norm": jnp.asarray(params["norm"]),
         "lm_head": jnp.asarray(params["lm_head"]),
         "layers": {k: jnp.asarray(v)
                    for k, v in params["layers"].items()}}, cfg)
    del params

    # ---- calibration + concentration profile (the experiment's key
    # readout: does a word LM at Mistral widths concentrate?) ----
    bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype="bf16")
    w_uncal = assemble_weights(raw, cfg, bcfg)
    rng = np.random.default_rng(3)
    seqs = [corpus[s:s + 192].astype(int).tolist()
            for s in rng.integers(0, len(corpus) - 200, 4)]
    rms = collect_act_rms(w_uncal, cfg, seqs, impl="auto")
    del w_uncal
    prof = {"rms_m": profile_stats(rms["rms_m"]),
            "rms_f": profile_stats(rms["rms_f"])}
    json.dump(prof, open(f"{D}/calib_profile.json", "w"), indent=1)
    np.savez(f"{D}/calib.npz", **{k: np.asarray(v)
                                  for k, v in rms.items()})
    print(f"profile: {prof}", flush=True)

    # ---- calibrated bake, dense copies kept ON DEVICE for the speed
    # baseline (no tunnel upload) ----
    w = assemble_weights(raw, cfg, bcfg, rms_m=rms["rms_m"],
                         rms_f=rms["rms_f"], bake=True, keep_dense=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(w)[0])
    del raw

    split = int(len(corpus) * 0.98)
    hold = corpus[split:].astype(int).tolist()
    out = {}

    # ---- quality sweeps (production Engine, traced effort) ----
    eng = Engine(w, cfg, impl="auto", dynamic_effort=True, eos_id=-1)
    t0 = time.time()
    out["agreement"] = harness.agreement_sweep(eng, hold[:128],
                                               n_tokens=128,
                                               efforts=EFFORTS)
    print(f"agreement {time.time()-t0:.0f}s: " + " ".join(
        f"{e:.2f}:{v:.3f}" for e, v in out["agreement"].items()),
        flush=True)
    # 500-token real-text teacher-forced protocol (reference scale,
    # benchmark.swift:128-156; VERDICT r3 next #5)
    out["tf_agreement_500"] = harness.tf_agreement_sweep(
        eng, hold[1000:1500], efforts=EFFORTS)
    print("tf500: " + " ".join(
        f"{e:.2f}:{v:.3f}" for e, v in out["tf_agreement_500"].items()),
        flush=True)
    out["nll"] = harness.nll_sweep(eng, hold[2000:3024], efforts=EFFORTS)
    json.dump(out, open(f"{D}/eval.json", "w"), indent=1, default=float)

    # ---- decode speed per effort vs dense + streamed-chunk fraction
    # (shared harness probes: kernel-prologue replica ties the speedup
    # to the measured concentration, w1 AND w2 spaces) ----
    speed = {"tau": _TAU}
    speed.update(harness.decode_speed_sweep(
        w, cfg, efforts=(1.0, 0.5, 0.35, 0.25)))
    print(f"dense: {speed['dense_toks_per_s']} tok/s; "
          f"@25%: {speed['toks_per_s_25']} "
          f"({speed['speedup_vs_dense_25']}x)", flush=True)
    speed.update(harness.streamed_fraction(w, cfg, hold[:48],
                                           efforts=(0.5, 0.35, 0.25)))
    json.dump(speed, open(f"{D}/speed.json", "w"), indent=1)
    print(f"speed: {speed}", flush=True)

    # mirror the key artifacts where the published curves live
    os.makedirs(f"{ROOT}/artifacts/quality", exist_ok=True)
    for src, dst in (("calib_profile.json", f"calib_profile_{TAG}.json"),
                     ("eval.json", f"eval_{TAG}.json"),
                     ("speed.json", f"speed_{TAG}.json")):
        if os.path.exists(f"{D}/{src}"):
            json.dump(json.load(open(f"{D}/{src}")),
                      open(f"{ROOT}/artifacts/quality/{dst}", "w"),
                      indent=1)


# --------------------------------------------------------------------------
# convert (CPU) -> production bucket checkpoint for bench.py --phase trained
# --------------------------------------------------------------------------

def stage_convert():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from effort_tpu.config import BucketConfig
    from effort_tpu.convert.convert import convert_checkpoint
    cfg = model_cfg()
    for dtype in ("bf16", "int8", "int4"):
        bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype=dtype)
        dst = f"{D}/ckpt_{dtype}"
        if os.path.exists(f"{dst}/config.json"):
            print(f"{dst}: exists, skipping")
            continue
        t0 = time.time()
        convert_checkpoint(f"{D}/hf", dst, cfg, bcfg,
                           calib=f"{D}/calib.npz", store_core=False,
                           progress=lambda *a: None)
        print(f"converted {dst} in {time.time()-t0:.0f}s")


def main():
    global D, VOCAB, N_LAYERS, NAME, TAG, CORPUS_MB, BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    ap.add_argument("--steps", type=int, default=3500)
    # concentration-ladder rung knobs (VERDICT r4 next #2): defaults
    # reproduce the wordlm-500m recipe exactly; --preset 1b is the 32k-
    # vocab 3-layer ~0.92B rung (4L f32-Adam does not fit 16 GB HBM even
    # with bf16 mu; 3L+32k hits the ~1B target with the vocab lever on)
    ap.add_argument("--preset", default=None, choices=[None, "1b"])
    ap.add_argument("--dir", default=None)
    ap.add_argument("--vocab", type=int, default=None)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--name", default=None)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--corpus-mb", type=float, default=None)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if args.preset == "1b":
        D = f"{ROOT}/runs/trained_wordlm1b"
        VOCAB, N_LAYERS = 32768, 3
        NAME, TAG = "wordlm-1b", "wordlm1b"
        CORPUS_MB, BATCH = 120.0, 8
    if args.dir:
        D = args.dir
    if args.vocab:
        VOCAB = args.vocab
    if args.layers:
        N_LAYERS = args.layers
    if args.name:
        NAME = args.name
    if args.tag:
        TAG = args.tag
    if args.corpus_mb:
        CORPUS_MB = args.corpus_mb
    if args.batch:
        BATCH = args.batch
    if args.stage == "all":
        if not os.path.exists(f"{D}/corpus.npy"):
            stage_corpus()
        params = stage_train(args.steps)
        stage_analyze(params)
    elif args.stage == "corpus":
        stage_corpus()
    elif args.stage == "train":
        stage_train(args.steps)
    elif args.stage == "analyze":
        stage_analyze()
    elif args.stage == "convert":
        stage_convert()
    else:
        raise SystemExit(f"unknown stage {args.stage}")


if __name__ == "__main__":
    main()
