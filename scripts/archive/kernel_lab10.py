"""Lab 10: prefix-stream kernel — parity, quality, speed.

Usage: kernel_lab10.py [B] [G] [effort] [N] [alpha] [tile_blocks]
"""
import sys
import functools
import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec_jnp
from effort_tpu.kernels.prefix_stream import select_stream, stream_matvec
from effort_tpu.utils.timing import chain_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    alpha = float(sys.argv[5]) if len(sys.argv) > 5 else 1.3
    TGB = int(sys.argv[6]) if len(sys.argv) > 6 else 8

    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (N,)) * 1.2)
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   act_rms=rms, perm_segment=1, keep_dense=True)
    print(f"B={B} G={G} N={N} e={effort} alpha={alpha} TGB={TGB}",
          flush=True)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (N,))

    # parity: huge alpha => full coverage => exact match with jnp impl
    v = acts(7)
    sel_full = select_stream(bm, v, effort, 0, alpha=1e9, tile_blocks=TGB,
                             exact_cutoff=True)
    y = np.asarray(stream_matvec(bm, sel_full, TGB))
    yj = np.asarray(bucket_matvec_jnp(bm, v, effort))
    cs = y @ yj / (np.linalg.norm(y) * np.linalg.norm(yj) + 1e-30)
    print(f"parity(full-cover): cos={cs:.6f} maxerr={np.abs(y-yj).max():.2e}",
          flush=True)

    # quality + read fraction at alpha
    sel = select_stream(bm, v, effort, 0, alpha=alpha, tile_blocks=TGB)
    frac = float(sel.cum_tiles[-1]) / (bm.blocks_per_expert // TGB)
    y = np.asarray(stream_matvec(bm, sel, TGB))
    yd = np.asarray(dense_matvec(bm.permute_v(v, 0), bm.dense[0]))
    csd = y @ yd / (np.linalg.norm(y) * np.linalg.norm(yd) + 1e-30)
    print(f"alpha={alpha}: read_frac={frac:.3f} cos_vs_dense={csd:.4f}",
          flush=True)

    # dense baseline + stream timing
    def mk_dense(n):
        @jax.jit
        def run(v, w):
            return jax.lax.fori_loop(
                0, n, lambda i, v: jnp.tanh(dense_matvec(v, w) * 0.02), v)
        return run
    t_dense = chain_time(mk_dense, 8, 104,
                         [(acts(100 + i), bm.dense[0]) for i in range(12)])
    print(f"dense : {t_dense*1e6:8.1f} us ({N*N*2/t_dense/1e9:6.1f} GB/s)",
          flush=True)

    def mk(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                s = select_stream(bmx, v, effort, 0, alpha=alpha,
                                  tile_blocks=TGB)
                return jnp.tanh(stream_matvec(bmx, s, TGB) * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t = chain_time(mk, 8, 104, [(acts(300 + i), bm) for i in range(12)])
    eff_bytes = frac * N * N * 2.25
    print(f"stream: {t*1e6:8.1f} us ({eff_bytes/t/1e9:6.1f} GB/s eff, "
          f"vs dense {t_dense/t:5.2f}x)", flush=True)


if __name__ == "__main__":
    main()
