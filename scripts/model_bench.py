"""Model-level decode benchmark on the real TPU.

Reduced-layer Mistral-dims model with synthetic calibrated weights;
per-token time via the two-length slope of the jitted decode scan
(normalized per layer, like the reference normalizes to 32 layers,
runNetwork.swift:299-303).

Usage: model_bench.py [n_layers] [dtype] [efforts_csv] [bucket_size]
       [calibrate 0|1] [fuse 0|1] [qhead 0|1] [percent_load] [experts]

experts > 1 benches Mixtral dims (top-2 MoE; the reference's Mixtral is
"one bug away from working", docs/q8.html — ours decodes).
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig, mistral_7b
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token, make_kv_cache)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    efforts = ([float(x) for x in sys.argv[3].split(",")]
               if len(sys.argv) > 3 else [1.0, 0.5, 0.25])
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    calibrate = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    fuse = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
    qhead = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False
    pload = float(sys.argv[8]) if len(sys.argv) > 8 else 1.0
    experts = int(sys.argv[9]) if len(sys.argv) > 9 else 1
    if experts > 1:
        from effort_tpu.config import mixtral_8x7b
        cfg = mixtral_8x7b(n_layers=L, n_experts=experts, max_seq_len=256)
    else:
        cfg = mistral_7b(n_layers=L, max_seq_len=256)
    bcfg = BucketConfig(bucket_size=B, chunk_rows=16 if B > 1 else 128,
                        dtype=dtype)
    t0 = time.time()
    # dense copies blow HBM at depth (and at 8 experts)
    keep_dense = dtype == "bf16" and L <= 8 and experts == 1
    # percent_load applies DURING assembly: the full-size model is never
    # resident (a 32L int8 model does not fit this device's free HBM)
    w = init_random_weights(cfg, bcfg, seed=0, keep_dense=keep_dense,
                            calibrate=calibrate, fuse=fuse,
                            percent_load=pload)
    if qhead:
        from effort_tpu.models.transformer import quantize_head
        w = quantize_head(w)
    jax.block_until_ready(w.layers.any_w1.vals)
    print(f"init {time.time()-t0:.0f}s; L={L} dtype={dtype} B={B} "
          f"calibrate={calibrate} fuse={fuse} qhead={qhead} "
          f"pload={pload}", flush=True)

    def decode(w, tok0, n, effort, impl):
        k_cache, v_cache = make_kv_cache(cfg)

        def step(carry, pos):
            tok, k_cache, v_cache = carry
            logits, k_cache, v_cache = forward_token(
                w, cfg, tok, pos, k_cache, v_cache, effort=effort,
                impl=impl)
            tok = jnp.argmax(logits).astype(jnp.int32)
            return (tok, k_cache, v_cache), tok

        (_, _, _), toks = jax.lax.scan(
            step, (tok0, k_cache, v_cache),
            jnp.arange(n, dtype=jnp.int32))
        return toks

    def bench(effort, impl, n_lo=8, n_hi=40):
        f_lo = jax.jit(functools.partial(decode, n=n_lo, effort=effort,
                                         impl=impl))
        f_hi = jax.jit(functools.partial(decode, n=n_hi, effort=effort,
                                         impl=impl))
        toks = iter(jnp.arange(2, 40, dtype=jnp.int32))
        t0 = time.time()
        jax.device_get(f_lo(w, next(toks)))
        compile_s = time.time() - t0
        jax.device_get(f_hi(w, next(toks)))
        lo = min(_t(f_lo, w, next(toks)) for _ in range(3))
        hi = min(_t(f_hi, w, next(toks)) for _ in range(3))
        per_tok = (hi - lo) / (n_hi - n_lo)
        return per_tok, compile_s

    def _t(f, w, tok0):
        t0 = time.perf_counter()
        jax.device_get(f(w, tok0))
        return time.perf_counter() - t0

    results = {}
    if keep_dense:
        t, c = bench(1.0, "dense")
        results["dense"] = t
        print(f"dense     : {t*1e3:7.2f} ms/tok ({1/t:6.1f} tok/s; "
              f"32L-equiv {t*32/L*1e3:6.1f} ms, {L/(32*t):5.1f} tok/s) "
              f"[compile {c:.0f}s]", flush=True)
    for e in efforts:
        t, c = bench(e, "pallas")
        results[e] = t
        extra = (f" vs dense {results['dense']/t:4.2f}x"
                 if "dense" in results else "")
        print(f"effort={e:4.2f}: {t*1e3:7.2f} ms/tok ({1/t:6.1f} tok/s; "
              f"32L-equiv {L/(32*t):5.1f} tok/s){extra} [compile {c:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
