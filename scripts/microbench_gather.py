"""Single-matrix bucketMul microbenchmark on the real TPU.

The analog of goQuickBucketPerformance (benchmarks/benchmark.swift:218-260):
cos-sim + speed of the gather kernel vs a dense matvec on one w1-shaped
matrix, across the effort scale.

NOTE: all jitted functions take arrays as arguments — closing over weights
inlines them as giant MLIR constants and makes remote compiles pathological.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401  (sets compilation cache dir)
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec, dense_matvec

IN, OUT = 4096, 14336


def timeit(fn, *args, n=50):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n, compile_s


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    efforts = [float(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [1.0, 0.5, 0.35, 0.25, 0.15, 0.08]
    k1, k2 = jax.random.split(jax.random.key(0))
    # generated on device: the host<->TPU tunnel is ~6.5 MB/s
    wt = jax.random.normal(k1, (IN, OUT), jnp.float32) * 0.02
    v = jax.random.normal(k2, (IN,), jnp.float32)
    cfg = BucketConfig(bucket_size=B, chunk_rows=G)
    bm = bucketize(wt, cfg, keep_dense=True)
    print("bucketized", flush=True)

    dense_f = jax.jit(dense_matvec)
    t_dense, c = timeit(dense_f, v, bm.dense[0])
    y_dense = np.asarray(dense_f(v, bm.dense[0]))
    bw = IN * OUT * 2 / t_dense / 1e9
    print(f"B={B} G={G}  dense: {t_dense*1e6:8.1f} us  ({bw:6.1f} GB/s)  "
          f"[compile {c:.0f}s]", flush=True)

    pallas_f = jax.jit(
        lambda bm_, v_, e: bucket_matvec(bm_, v_, e, impl="pallas"),
        static_argnums=(2,))
    for effort in efforts:
        y = np.asarray(pallas_f(bm, v, effort))
        cs = float(y @ y_dense /
                   (np.linalg.norm(y) * np.linalg.norm(y_dense) + 1e-30))
        t, c = timeit(pallas_f, bm, v, effort)
        eff_bytes = effort * IN * OUT * (2 + 1)  # vals + int8 pos
        print(f"  effort={effort:5.2f}  {t*1e6:8.1f} us  "
              f"cos={cs:.4f}  speedup_vs_dense={t_dense/t:5.2f}x  "
              f"eff_bw={eff_bytes/t/1e9:6.1f} GB/s  [compile {c:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
