"""Lab 13: row-prefix MXU kernel (bucket_size=1) — parity + speed.

Usage: kernel_lab13.py [effort] [N_in] [N_out] [alpha] [dtype] [TGB] [S]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec_jnp
from effort_tpu.kernels.fused_stream import mxu_matvec
from effort_tpu.utils.timing import chain_time


def main():
    effort = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    NI = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    NO = int(sys.argv[3]) if len(sys.argv) > 3 else 14336
    alpha = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    dtype = sys.argv[5] if len(sys.argv) > 5 else "bf16"
    TGB = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    S = int(sys.argv[7]) if len(sys.argv) > 7 else 3
    G = int(sys.argv[8]) if len(sys.argv) > 8 else 128
    PSEG = int(sys.argv[9]) if len(sys.argv) > 9 else 1

    wt = jax.random.normal(jax.random.key(0), (NI, NO), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (NI,)) * 1.2)
    bm = bucketize(wt, BucketConfig(bucket_size=1, chunk_rows=G,
                                    dtype=dtype),
                   act_rms=(rms if PSEG >= 0 else None),
                   perm_segment=max(PSEG, 1), keep_dense=True)
    wt_bf16 = wt.astype(jnp.bfloat16)
    print(f"mxu B=1 {NI}x{NO} e={effort} alpha={alpha} dtype={dtype} "
          f"TGB={TGB} S={S} G={G} blocks={bm.blocks_per_expert}", flush=True)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (NI,))

    run_mxu = jax.jit(mxu_matvec, static_argnames=(
        "effort", "alpha", "tile_blocks", "slots"))

    # parity vs the jnp semantics path (full coverage via huge alpha: the
    # prefix then spans all selected rows; u-mask gives exactness)
    for seed in (7, 8):
        v = acts(seed)
        yk = np.asarray(run_mxu(bm, v, effort, 0, alpha=1e9,
                                tile_blocks=TGB, slots=S))
        yj = np.asarray(bucket_matvec_jnp(bm, v, effort, 0,
                                          exact_cutoff=False))
        cos = float(yk @ yj / (np.linalg.norm(yk) * np.linalg.norm(yj)
                               + 1e-30))
        yd = np.asarray(dense_matvec(bm.permute_v(v, 0), bm.dense[0]))
        cd = float(yk @ yd / (np.linalg.norm(yk) * np.linalg.norm(yd)
                              + 1e-30))
        ya = np.asarray(run_mxu(bm, v, effort, 0, alpha=alpha,
                                tile_blocks=TGB, slots=S))
        ca = float(ya @ yd / (np.linalg.norm(ya) * np.linalg.norm(yd)
                              + 1e-30))
        print(f"seed {seed}: cos(mxu,jnp)={cos:.6f} "
              f"cos(mxu_fullcover,dense)={cd:.4f} "
              f"cos(mxu@alpha,dense)={ca:.4f}", flush=True)

    # speed: workload-preserving sign-flip chain
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

    def mk_mxu(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                return bounce(mxu_matvec(bmx, v, effort, 0, alpha=alpha,
                                         tile_blocks=TGB, slots=S), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t = chain_time(mk_mxu, 8, 104, [(acts(300 + i), bm) for i in range(12)])
    print(f"mxu:   {t*1e6:7.1f} us ({t_dense/t:4.2f}x dense)", flush=True)


if __name__ == "__main__":
    main()
