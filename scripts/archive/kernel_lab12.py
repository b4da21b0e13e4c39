"""Lab 12: fused-selection kernel (v4) vs XLA-dispatch kernel (v3).

Parity: fused output vs select_stream+stream_matvec (same approx cutoff).
Speed: per-matvec chained-slope time for both, plus dense, on a given
shape.

Usage: kernel_lab12.py [B] [G] [effort] [N_in] [N_out] [alpha] [TGB]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec
from effort_tpu.kernels.prefix_stream import select_stream, stream_matvec
from effort_tpu.kernels.fused_stream import fused_matvec
from effort_tpu.utils.timing import chain_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    NI = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    NO = int(sys.argv[5]) if len(sys.argv) > 5 else 14336
    alpha = float(sys.argv[6]) if len(sys.argv) > 6 else 1.3
    TGB = int(sys.argv[7]) if len(sys.argv) > 7 else 8

    wt = jax.random.normal(jax.random.key(0), (NI, NO), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (NI,)) * 1.2)
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   act_rms=rms, perm_segment=1, keep_dense=True)
    wt_bf16 = wt.astype(jnp.bfloat16)
    print(f"B={B} G={G} {NI}x{NO} e={effort} alpha={alpha} TGB={TGB}",
          flush=True)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (NI,))

    # ---- parity ---------------------------------------------------------
    for seed in (7, 8, 9):
        v = acts(seed)
        sel = select_stream(bm, v, effort, 0, alpha=alpha, tile_blocks=TGB)
        y3 = np.asarray(stream_matvec(bm, sel, TGB))
        y4 = np.asarray(jax.jit(fused_matvec, static_argnames=(
            "effort", "alpha", "tile_blocks"))(
            bm, v, effort, 0, alpha=alpha, tile_blocks=TGB))
        cos = float(y3 @ y4 / (np.linalg.norm(y3) * np.linalg.norm(y4)
                               + 1e-30))
        dmax = float(np.abs(y3 - y4).max())
        yd = np.asarray(dense_matvec(bm.permute_v(v, 0), bm.dense[0]))
        cd = float(y4 @ yd / (np.linalg.norm(y4) * np.linalg.norm(yd)
                              + 1e-30))
        print(f"seed {seed}: cos(v3,v4)={cos:.6f} maxdiff={dmax:.2e} "
              f"cos(v4,dense)={cd:.4f}", flush=True)

    # ---- speed ----------------------------------------------------------
    # Chain bounce that PRESERVES the workload: selection depends only on
    # |v|, so v' = v * sign(y) keeps the read fraction of every iteration
    # identical to the calibrated operating point while staying
    # data-dependent (nothing can be elided).
    from effort_tpu.utils.timing import fold_bounce as bounce

    def mk_dense(n):
        @jax.jit
        def run(v, w):
            def body(i, v):
                return bounce(dense_matvec(v, w), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_dense = chain_time(mk_dense, 8, 104,
                         [(acts(100 + i), wt_bf16) for i in range(12)])
    print(f"dense: {t_dense*1e6:7.1f} us ({NI*NO*2/t_dense/1e9:6.1f} GB/s)",
          flush=True)

    def mk_v3(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                s = select_stream(bmx, v, effort, 0, alpha=alpha,
                                  tile_blocks=TGB)
                return bounce(stream_matvec(bmx, s, TGB), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t3 = chain_time(mk_v3, 8, 104, [(acts(300 + i), bm) for i in range(12)])
    print(f"v3 (xla-dispatch): {t3*1e6:7.1f} us ({t_dense/t3:4.2f}x dense)",
          flush=True)

    def mk_v4(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                return bounce(fused_matvec(bmx, v, effort, 0, alpha=alpha,
                                           tile_blocks=TGB), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t4 = chain_time(mk_v4, 8, 104, [(acts(500 + i), bm) for i in range(12)])
    print(f"v4 (fused):        {t4*1e6:7.1f} us ({t_dense/t4:4.2f}x dense)",
          flush=True)


if __name__ == "__main__":
    main()
