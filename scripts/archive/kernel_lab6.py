"""Lab 6: cache-proof dense baseline + gather kernel G/bufs scan.

Dense uses an 8-matrix working set (>1 GB) cycled via lax.switch so no
cache tier can fake bandwidth. Gather arrays are 400+ MB already.

Usage: kernel_lab6.py [B] [G] [effort] [N] [bufs]
"""

import sys
import dataclasses
import functools

import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec
from effort_tpu.utils.timing import chain_time, fresh_vectors


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    bufs = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    NW = 8
    wbytes = N * N * 2

    # ---- cache-proof dense ----
    ws = [ (jax.random.normal(jax.random.key(100 + i), (N, N), jnp.float32)
            * 0.02).astype(jnp.bfloat16) for i in range(NW)]

    def mk_dense(n):
        @jax.jit
        def run(v, *wlist):
            def body(i, v):
                y = jax.lax.switch(
                    i % NW, [lambda w=w: dense_matvec(v, w) for w in wlist])
                return jnp.tanh(y * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run

    t = chain_time(mk_dense, 8, 72,
                   [(v, *ws) for v in fresh_vectors((N,), 12)])
    print(f"dense-8x: {t*1e6:8.1f} us ({wbytes/t/1e9:6.1f} GB/s)",
          flush=True)
    t_dense = t

    # ---- gather (production kernel path) ----
    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G))
    bm = dataclasses.replace(bm, dense=None)
    NB = bm.blocks_per_expert
    print(f"B={B} G={G} blocks={NB} block_kB={G*bm.n_buckets*2//1024} "
          f"bufs={bufs}", flush=True)

    def mk_gather(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                y = bucket_matvec(bmx, v, effort, impl="pallas")
                return jnp.tanh(y * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run

    budget = min(1.0, effort * 1.3 + 0.02)
    max_blocks = ((int(NB * budget) + 7) // 8) * 8
    bytes_rd = max_blocks * G * bm.n_buckets * 3
    t = chain_time(mk_gather, 8, 72,
                   [(v, bm) for v in fresh_vectors((N,), 12, seed0=777)])
    print(f"gather e={effort}: {t*1e6:8.1f} us "
          f"({bytes_rd/t/1e9:6.1f} GB/s, {t/max_blocks*1e9:5.0f} ns/blk, "
          f"vs dense {t_dense/t:5.2f}x)", flush=True)


if __name__ == "__main__":
    main()
