"""Flash-attention kernel vs XLA einsum attention on the real TPU.

Mistral-7B prefill shape: H=32, KV=8, D=128, T=S=2048 (the reference's
maxSeqLen). Prints correctness (max diff vs XLA) and per-call timing for
both paths via the chained-slope method.

Usage: python scripts/bench_flash.py [T] [S]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from effort_tpu.config import mistral_7b
from effort_tpu.kernels.flash_attention import flash_attention_seq
from effort_tpu.models.transformer import _attention_seq
from effort_tpu.utils.timing import chain_time


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    cfg = mistral_7b(max_seq_len=S)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    kc = jax.random.normal(jax.random.key(1), (S, KV, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.key(2), (S, KV, D), jnp.bfloat16)
    slots = jnp.arange(T)

    # correctness
    Q2 = jax.random.normal(jax.random.key(3), (T, H * D), jnp.float32)
    ref = jax.jit(lambda q, k, v: _attention_seq(q, k, v, slots, 0, cfg))(
        Q2, kc, vc)
    out = jax.jit(lambda q, k, v: flash_attention_seq(q, k, v, 0, 0, H, D))(
        Q2, kc, vc)
    ref, out = np.asarray(ref), np.asarray(out)
    print(f"max|diff| = {np.abs(ref - out).max():.5f}  "
          f"rel = {np.abs(ref - out).max() / np.abs(ref).std():.5f}")

    def acts(seed):
        return jax.random.normal(jax.random.key(seed), (T, H * D),
                                 jnp.float32)

    def mk(fn):
        def make(n):
            @jax.jit
            def run(q, k, v):
                def body(i, q):
                    o = fn(q, k, v)
                    return q * 0.5 + o * 0.5
                q = jax.lax.fori_loop(0, n, body, q)
                # scalar result: a [T, H*D] fetch through the ~6.5 MB/s
                # tunnel would dominate the measurement
                return jnp.sum(q)
            return run
        return make

    flash = lambda q, k, v: flash_attention_seq(q, k, v, 0, 0, H, D)
    xla = lambda q, k, v: _attention_seq(q, k, v, slots, 0, cfg)

    args = [(acts(100 + i), kc, vc) for i in range(12)]
    t_flash = chain_time(mk(flash), 8, 72, args)
    args = [(acts(200 + i), kc, vc) for i in range(12)]
    t_xla = chain_time(mk(xla), 8, 72, args)
    print(f"T={T} S={S}: flash {t_flash*1e3:.3f} ms  "
          f"xla {t_xla*1e3:.3f} ms  speedup {t_xla/t_flash:.2f}x")


if __name__ == "__main__":
    main()
