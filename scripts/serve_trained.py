"""HTTP server measured end-to-end against a TRAINED checkpoint
(VERDICT r4 next #4): real tokenizer, real HTTP round-trips, effort
knob exercised, latency recorded per request.

Writes artifacts/quality/serving_trained_<tag>.json:
  per effort: {n_requests, total_new_tokens, wall_s, req_toks_per_s
  (device-side from Reply), http_p50_ms, http_p95_ms per-request}.

Usage: python scripts/serve_trained.py [--dir runs/trained_wordlm1b
       --tag wordlm1b --port 18123]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time
import urllib.parse
import urllib.request

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=f"{ROOT}/runs/trained_wordlm1b")
    ap.add_argument("--tag", default="wordlm1b")
    ap.add_argument("--port", type=int, default=18123)
    ap.add_argument("--n-req", type=int, default=6)
    ap.add_argument("--n-tokens", type=int, default=48)
    args = ap.parse_args()
    D = args.dir

    import jax
    from effort_tpu.models.generate import Engine
    from effort_tpu.models.weights import load_bucketized
    from effort_tpu.runtime.word_tokenizer import WordTokenizer
    from effort_tpu.serving.server import EffortServer

    tok = WordTokenizer(f"{D}/vocab.json")
    w, cfg, _ = load_bucketized(f"{D}/ckpt_bf16", load_dense=False)
    jax.block_until_ready(jax.tree_util.tree_leaves(w)[0])
    eng = Engine(w, cfg, tokenizer=tok, impl="auto", dynamic_effort=True,
                 eos_id=-1)
    corpus = np.load(f"{D}/corpus.npy")
    split = int(len(corpus) * 0.98)
    prompts = [tok.decode(corpus[split + 600 * i: split + 600 * i + 48]
                          .astype(int).tolist())
               for i in range(args.n_req)]

    out = {"model": cfg.name, "checkpoint": os.path.relpath(
        f"{D}/ckpt_bf16", ROOT), "n_tokens_per_req": args.n_tokens}

    def measure(effort_pct):
        lat = []
        dev_tps = []
        total_toks = 0
        t_all = time.time()
        for p in prompts:
            q = urllib.parse.quote(p[:400])
            t0 = time.time()
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/q?query={q}"
                    f"&effort={effort_pct}&numtokens={args.n_tokens}",
                    timeout=600) as r:
                body = json.loads(r.read())
            lat.append((time.time() - t0) * 1e3)
            dev_tps.append(body["tokens_per_s"])
            total_toks += args.n_tokens
        wall = time.time() - t_all
        lat.sort()
        return {
            "n_requests": len(prompts),
            "total_new_tokens": total_toks,
            "wall_s": round(wall, 2),
            "http_toks_per_s": round(total_toks / wall, 1),
            "device_toks_per_s_mean": round(
                float(np.mean(dev_tps)), 1),
            "http_p50_ms": round(lat[len(lat) // 2], 1),
            "http_p95_ms": round(lat[max(0, int(len(lat) * 0.95) - 1)],
                                 1),
        }

    async def run():
        srv = EffortServer(eng, tokenizer=tok, port=args.port)
        await srv.start()
        loop = asyncio.get_event_loop()
        try:
            # warmup (compiles the decode graphs)
            await loop.run_in_executor(None, measure, 100)
            for e in (100, 35, 25):
                r = await loop.run_in_executor(None, measure, e)
                out[f"effort_{e}"] = r
                print(f"effort {e}%: {r}", flush=True)
            st = await loop.run_in_executor(None, lambda: json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/stats",
                    timeout=60).read()))
            out["server_stats"] = st
        finally:
            await srv.stop()

    asyncio.run(run())
    os.makedirs(f"{ROOT}/artifacts/quality", exist_ok=True)
    path = f"{ROOT}/artifacts/quality/serving_trained_{args.tag}.json"
    json.dump(out, open(path, "w"), indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
