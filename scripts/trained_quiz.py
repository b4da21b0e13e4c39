"""Word-vocab 4-choice quiz on the flagship trained word-LM
(VERDICT r4 next #9): the task-level accuracy-vs-effort curve, the
reference's goQuiz/ryc0.5b protocol shape (flat to ~25%, collapse
below; benchmark.swift:52-124) reproduced on an artifact this sandbox
can actually train.

Protocol:
  1. facts: "the <prop> of <subj> is <val>." with vals drawn from the
     checkpoint's OWN word vocab (single-token answers); subjects are
     invented CVCVC names (byte-fallback pieces).
  2. fine-tune the trained checkpoint briefly on facts x repeats mixed
     with base corpus (the facts must be in-weights for recall to be
     measurable; the reference quizzes a pretrained Mistral whose facts
     came from pretraining).
  3. 4-choice quiz via raw limit-logits (harness.limited_quiz_sweep —
     the reference's limitLogits, runNetwork.swift:237-250): argmax
     among the 4 shuffled answer-word logits after "the <prop> of
     <subj> is".

Writes <dir>/quiz.json + artifacts/quality/quiz_<tag>.json.

Usage: python scripts/trained_quiz.py [--dir runs/trained_wordlm1b
       --tag wordlm1b --steps 600]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

EFFORTS = [1.0, 0.8, 0.6, 0.5, 0.4, 0.35, 0.3, 0.25, 0.2, 0.15, 0.1]
PROPS = ["color", "size", "shape", "sound", "taste", "weight",
         "speed", "age"]


def build_fact_quiz(words, n_facts=96, n_choices=4, seed=7):
    """Facts + quiz items whose answers are single in-vocab word ids."""
    from effort_tpu.runtime.word_tokenizer import N_BYTE
    rng = random.Random(seed)
    # answer pool: space-prefixed alphabetic vocab words (the form a
    # continuation after "is" takes), mid-frequency band for variety
    pool = [(i + N_BYTE, w) for i, w in enumerate(words)
            if w.startswith(" ") and w[1:].isalpha() and 4 <= len(w) <= 9]
    assert len(pool) >= n_choices * 4, len(pool)
    pool = pool[:4000]
    cons, vow = "bdfgklmnprstvz", "aeiou"
    subjects = set()
    while len(subjects) < n_facts:
        subjects.add("".join(rng.choice(cons if i % 2 == 0 else vow)
                             for i in range(5)))
    facts = []
    for s in sorted(subjects):
        tid, w = rng.choice(pool)
        facts.append({"prop": rng.choice(PROPS), "subj": s,
                      "val": w, "val_id": tid})
    return facts


def fact_text(facts, repeats):
    lines = [f"the {f['prop']} of {f['subj']} is{f['val']}.\n"
             for f in facts]
    out = []
    rng = random.Random(11)
    for _ in range(repeats):
        rng.shuffle(lines)
        out.extend(lines)
    return "".join(out)


def quiz_items(facts, tok, n_choices=4, seed=3):
    rng = random.Random(seed)
    all_ids = [f["val_id"] for f in facts]
    items = []
    for f in facts:
        distract = rng.sample([i for i in set(all_ids)
                               if i != f["val_id"]], n_choices - 1)
        allowed = distract + [f["val_id"]]
        rng.shuffle(allowed)
        items.append({
            "prompt_ids": tok.encode(
                f"the {f['prop']} of {f['subj']} is"),
            "allowed_ids": allowed,
            "correct": allowed.index(f["val_id"]),
        })
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=f"{ROOT}/runs/trained_wordlm1b")
    ap.add_argument("--tag", default="wordlm1b")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--name", default="wordlm-1b")
    args = ap.parse_args()
    D = args.dir

    import scripts.trained_wordlm as tw
    tw.D, tw.VOCAB, tw.N_LAYERS, tw.NAME = (D, args.vocab, args.layers,
                                            args.name)
    from effort_tpu.config import BucketConfig
    from effort_tpu.convert.calibrate import collect_act_rms
    from effort_tpu.eval.harness import limited_quiz_sweep
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.transformer import assemble_weights
    from effort_tpu.runtime.word_tokenizer import WordTokenizer
    from effort_tpu.train import TrainConfig, train
    from scripts.trained_quality_ondevice import params_to_raw

    words = json.load(open(f"{D}/vocab.json"))
    tok = WordTokenizer(words)
    corpus = np.load(f"{D}/corpus.npy")
    cfg = tw.model_cfg()

    facts = build_fact_quiz(words)
    json.dump(facts, open(f"{D}/facts.json", "w"))

    # fine-tune mixture: facts (~60 repeats) + base corpus slice, so the
    # model keeps its distribution while memorizing the facts
    ft_ids = np.asarray(tok.encode(fact_text(facts, 60)), np.int32)
    base = corpus[: len(ft_ids) * 2].astype(np.int32)
    mix = np.concatenate([ft_ids, base, ft_ids])
    print(f"fine-tune corpus: {len(ft_ids)} fact tokens + {len(base)} "
          f"base tokens", flush=True)

    t0 = time.time()
    params = tw._load_params_from_hf()
    import jax.numpy as jnp
    params = {"embed": jnp.asarray(params["embed"]),
              "norm": jnp.asarray(params["norm"]),
              "lm_head": jnp.asarray(params["lm_head"]),
              "layers": {k: jnp.asarray(v)
                         for k, v in params["layers"].items()}}
    print(f"loaded hf params ({time.time()-t0:.0f}s)", flush=True)
    tcfg = TrainConfig(batch=8, seq_len=512, steps=args.steps, lr=1e-4,
                       warmup=50, scan_chunk=25, holdout_frac=0.02,
                       mu_dtype="bfloat16" if args.layers > 2
                       else "float32")
    t0 = time.time()
    params, hist = train(cfg, mix, tcfg, params=params)
    print(f"fine-tuned {hist[-1][0]} steps in {time.time()-t0:.0f}s "
          f"(holdout {hist[-1][2]:.3f})", flush=True)

    raw = params_to_raw(params, cfg)
    del params
    bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype="bf16")
    w_uncal = assemble_weights(raw, cfg, bcfg)
    rng = np.random.default_rng(3)
    seqs = [corpus[s:s + 192].astype(int).tolist()
            for s in rng.integers(0, len(corpus) - 200, 3)]
    rms = collect_act_rms(w_uncal, cfg, seqs, impl="auto")
    del w_uncal
    w = assemble_weights(raw, cfg, bcfg, rms_m=rms["rms_m"],
                         rms_f=rms["rms_f"], bake=True)
    del raw
    eng = Engine(w, cfg, impl="auto", dynamic_effort=True, eos_id=-1)

    items = quiz_items(facts, tok)
    t0 = time.time()
    acc = limited_quiz_sweep(eng, items, efforts=EFFORTS)
    out = {"model": cfg.name, "n_items": len(items), "n_choices": 4,
           "fine_tune_steps": int(hist[-1][0]),
           "accuracy": {f"{e:.2f}": round(v, 3) for e, v in acc.items()},
           "random_baseline": 0.25,
           "protocol": "limit-logits over 4 shuffled in-vocab answer "
                       "words (runNetwork.swift:237-250 analog)"}
    print(f"quiz sweep {time.time()-t0:.0f}s: "
          + " ".join(f"{e:.2f}:{v:.3f}" for e, v in acc.items()),
          flush=True)
    json.dump(out, open(f"{D}/quiz.json", "w"), indent=1)
    os.makedirs(f"{ROOT}/artifacts/quality", exist_ok=True)
    json.dump(out, open(
        f"{ROOT}/artifacts/quality/quiz_{args.tag}.json", "w"), indent=1)
    print(f"wrote {D}/quiz.json", flush=True)


if __name__ == "__main__":
    main()
