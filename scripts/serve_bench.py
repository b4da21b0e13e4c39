"""Batched serving decode benchmark (TPU): steady-state tokens/s at
batch B with per-slot efforts, via a jitted scan of forward_token_batch
(the BatchEngine decode step without the host-side scheduler — the
sandbox tunnel adds ~29 ms/roundtrip that production serving would not
see).

Usage: serve_bench.py [B] [n_layers] [dtype] [efforts_csv] [fuse 0|1]
       [qhead 0|1]
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig, mistral_7b
from effort_tpu.models.transformer import (init_random_weights,
                                           forward_token_batch)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    effs = ([float(x) for x in sys.argv[4].split(",")]
            if len(sys.argv) > 4 else [0.25] * B)
    effs = (effs * B)[:B]
    fuse = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    qhead = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
    cfg = mistral_7b(n_layers=L, max_seq_len=256)
    bcfg = BucketConfig(bucket_size=1, chunk_rows=128, dtype=dtype)
    t0 = time.time()
    w = init_random_weights(cfg, bcfg, seed=0, calibrate=True, fuse=fuse)
    if qhead:
        from effort_tpu.models.transformer import quantize_head
        w = quantize_head(w)
    jax.block_until_ready(w.layers.any_w1.vals)
    print(f"init {time.time()-t0:.0f}s; B={B} L={L} dtype={dtype} "
          f"efforts={effs} fuse={fuse} qhead={qhead}", flush=True)

    KV, D, S = cfg.n_kv_heads, cfg.head_dim, cfg.max_seq_len
    efforts = jnp.asarray(effs, jnp.float32)

    def decode(w, toks0, n):
        kc = jnp.zeros((cfg.n_layers, B, S, KV, D), jnp.bfloat16)
        vc = jnp.zeros_like(kc)

        def step(carry, i):
            toks, pos, kc, vc = carry
            logits, kc, vc = forward_token_batch(
                w, cfg, toks, pos, kc, vc, efforts, impl="auto")
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (toks, pos + 1, kc, vc), toks

        pos0 = jnp.zeros((B,), jnp.int32)
        (_, _, _, _), out = jax.lax.scan(
            step, (toks0, pos0, kc, vc), jnp.arange(n, dtype=jnp.int32))
        return out

    f_lo = jax.jit(functools.partial(decode, n=8))
    f_hi = jax.jit(functools.partial(decode, n=40))

    def run(f, seed):
        toks0 = jax.random.randint(jax.random.key(seed), (B,), 1, 30000)
        t0 = time.time()
        jax.device_get(f(w, toks0))
        return time.time() - t0

    run(f_lo, 0)       # compile
    run(f_hi, 1)
    lo = min(run(f_lo, 2 + i) for i in range(3))
    hi = min(run(f_hi, 5 + i) for i in range(3))
    per_step = (hi - lo) / 32
    print(f"batched decode: {per_step*1e3:.2f} ms/step = "
          f"{B/per_step:.0f} tok/s aggregate "
          f"({1/per_step:.0f} steps/s, 32L-equiv "
          f"{B/(per_step*32/L):.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
