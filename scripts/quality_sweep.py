"""Effort-scale quality sweep on the production TPU kernels.

Reproduces the reference's single-matrix cosine-sim chart
(docs/ryc/ryc0.3.png; harness goBucketPerformance,
benchmarks/benchmark.swift:159-213) on a w1-class matrix, for the
rank-prefix (B=4) and row-prefix (B=1) kernels, under both heavy-tailed
(decode regime) and uniform activations.

Usage: quality_sweep.py [n_seeds]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize, calib_row_order
from effort_tpu.ops.bucketmul import dense_matvec
from effort_tpu.kernels.fused_stream import fused_matvec, mxu_matvec

REF = {0.40: 1.00, 0.23: 0.99, 0.18: 0.98, 0.13: 0.96, 0.12: 0.94,
       0.08: 0.88}   # reference chart values (BASELINE.md)
EFFORTS = [1.0, 0.5, 0.4, 0.3, 0.25, 0.23, 0.2, 0.18, 0.15, 0.13,
           0.12, 0.1, 0.08, 0.06]


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    IN, OUT = 4096, 14336
    wt = jax.random.normal(jax.random.key(0), (IN, OUT), jnp.float32) * 0.02

    for regime, sigma in (("heavy-tailed", 1.2), ("uniform", 0.0)):
        rms = jnp.exp(jax.random.normal(jax.random.key(5), (IN,)) * sigma)
        pi = calib_row_order(rms)
        rms_p = rms[pi]
        bm1 = bucketize(wt, BucketConfig(bucket_size=1, chunk_rows=128),
                        in_perm=pi, keep_dense=True)
        bm4 = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=16),
                        in_perm=pi, keep_dense=True)
        r1 = jax.jit(mxu_matvec, static_argnames=("effort", "alpha"))
        r4 = jax.jit(fused_matvec, static_argnames=("effort", "alpha",
                                                    "tile_blocks"))
        print(f"--- {regime} activations ---", flush=True)
        print("  effort   B=1 mxu   B=4 rank   reference", flush=True)
        for e in EFFORTS:
            c1s, c4s = [], []
            for seed in range(n_seeds):
                v = rms_p * jax.random.normal(jax.random.key(100 + seed),
                                              (IN,))
                yd = np.asarray(dense_matvec(v, bm1.dense[0]))

                def cos(y):
                    y = np.asarray(y)
                    return y @ yd / (np.linalg.norm(y)
                                     * np.linalg.norm(yd) + 1e-30)
                c1s.append(cos(r1(bm1, v, e, 0, alpha=1.3)))
                c4s.append(cos(r4(bm4, v, e, 0, alpha=1.3,
                                  tile_blocks=8)))
            ref = f"{REF[e]:.2f}" if e in REF else "   -"
            print(f"  {e*100:5.0f}%   {np.mean(c1s):.4f}    "
                  f"{np.mean(c4s):.4f}     {ref}", flush=True)


if __name__ == "__main__":
    main()
