"""Lab 8: production gather path with calibration — demand + speed + quality.

Synthetic activations with persistent outlier dims (lognormal RMS pattern,
the realistic LLM case). Compares uncalibrated vs calibrated layouts.

Usage: kernel_lab8.py [B] [G] [effort] [N] [slots] [sigma]
"""

import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.effort import select_blocks
from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec_jnp
from effort_tpu.kernels.gather_dma import gather_matvec_dma
from effort_tpu.utils.timing import chain_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    slots = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    sigma = float(sys.argv[6]) if len(sys.argv) > 6 else 1.2

    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (N,)) * sigma)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (N,))

    cfg = BucketConfig(bucket_size=B, chunk_rows=G)
    bm_u = bucketize(wt, cfg, keep_dense=True)
    bm_c = bucketize(wt, cfg, act_rms=rms)
    NB = bm_u.blocks_per_expert
    print(f"B={B} G={G} N={N} NB={NB} slots={slots} e={effort} "
          f"sigma={sigma}", flush=True)

    # dense baseline (cache-proof enough at this size, fresh inputs)
    def mk_dense(n):
        @jax.jit
        def run(v, w):
            return jax.lax.fori_loop(
                0, n, lambda i, v: jnp.tanh(dense_matvec(v, w) * 0.02), v)
        return run
    t_dense = chain_time(mk_dense, 8, 72,
                         [(acts(100 + i), bm_u.dense[0]) for i in range(12)])
    print(f"dense: {t_dense*1e6:8.1f} us ({N*N*2/t_dense/1e9:6.1f} GB/s)",
          flush=True)

    for name, bm in (("uncal", bm_u), ("calib", bm_c)):
        # measure true demand
        dem = np.mean([int(select_blocks(bm, acts(200 + i), effort, 0,
                                         NB).n_blocks) for i in range(4)])
        cap = min(NB, ((int(dem * 1.1) + 7) // 8) * 8)
        # quality at this cap vs dense
        v = acts(321)
        sel = select_blocks(bm, v, effort, 0, cap)
        y = np.asarray(gather_matvec_dma(bm, sel, slots))
        yd = np.asarray(v @ wt)
        cs = y @ yd / (np.linalg.norm(y) * np.linalg.norm(yd) + 1e-30)

        def mk(n, bm=bm, cap=cap):
            @jax.jit
            def run(v, bmx):
                def body(i, v):
                    s = select_blocks(bmx, v, effort, 0, cap)
                    return jnp.tanh(
                        gather_matvec_dma(bmx, s, slots) * 0.02)
                return jax.lax.fori_loop(0, n, body, v)
            return run
        t = chain_time(mk, 8, 72, [(acts(400 + i), bm) for i in range(12)])
        bytes_rd = cap * G * bm.n_buckets * 2.25
        print(f"{name}: demand={dem:.0f}/{NB} ({dem/NB:.2f}) cap={cap} "
              f"cos_vs_dense={cs:.4f}  {t*1e6:8.1f} us "
              f"({bytes_rd/t/1e9:5.1f} GB/s, vs dense "
              f"{t_dense/t:5.2f}x)", flush=True)


if __name__ == "__main__":
    main()
