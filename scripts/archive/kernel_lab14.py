"""Lab 14: batched row-prefix MXU kernel — per-slot parity + speed.

Usage: kernel_lab14.py [T] [effort] [N_in] [N_out] [alpha] [G]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import dense_matvec
from effort_tpu.kernels.fused_stream import mxu_matvec, mxu_matvec_batch
from effort_tpu.utils.timing import chain_time


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    effort = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    NI = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    NO = int(sys.argv[4]) if len(sys.argv) > 4 else 14336
    alpha = float(sys.argv[5]) if len(sys.argv) > 5 else 1.3
    G = int(sys.argv[6]) if len(sys.argv) > 6 else 128

    wt = jax.random.normal(jax.random.key(0), (NI, NO), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (NI,)) * 1.2)
    pi = jnp.argsort(-rms).astype(jnp.int32)
    bm = bucketize(wt, BucketConfig(bucket_size=1, chunk_rows=G),
                   in_perm=pi, keep_dense=True)
    rms_p = rms[pi]
    print(f"batch mxu T={T} {NI}x{NO} e={effort} alpha={alpha} G={G}",
          flush=True)

    def acts(seed, t=T):
        return rms_p * jax.random.normal(jax.random.key(seed), (t, NI))

    run_b = jax.jit(mxu_matvec_batch, static_argnames=("alpha",
                                                       "tile_blocks",
                                                       "slots"))
    run_1 = jax.jit(mxu_matvec, static_argnames=("effort", "alpha",
                                                 "tile_blocks", "slots"))

    # parity: per-slot outputs == single-vector kernel outputs (note the
    # batch kernel streams the max prefix, so give both full coverage)
    V = acts(7)
    effs = jnp.full((T,), effort)
    Yb = np.asarray(run_b(bm, V, effs, 0, alpha=1e9))
    for s in range(min(T, 3)):
        y1 = np.asarray(run_1(bm, V[s], effort, 0, alpha=1e9))
        cos = float(Yb[s] @ y1 / (np.linalg.norm(Yb[s]) *
                                  np.linalg.norm(y1) + 1e-30))
        print(f"slot {s}: cos(batch, single) = {cos:.6f}", flush=True)

    # mixed per-slot efforts incl. a zero slot
    effs_mixed = jnp.asarray([0.0, 0.1, 0.25, 0.5, 1.0, 0.25, 0.25, 0.25]
                             [:T])
    Ym = np.asarray(run_b(bm, V, effs_mixed, 0, alpha=alpha))
    yd = np.asarray(jax.vmap(lambda v: dense_matvec(v, bm.dense[0]))(V))
    for s in range(min(T, 5)):
        d = yd[s]
        c = float(Ym[s] @ d / (np.linalg.norm(Ym[s]) * np.linalg.norm(d)
                               + 1e-30)) if np.linalg.norm(Ym[s]) else 0.0
        print(f"slot {s} e={float(effs_mixed[s]):.2f}: cos vs dense "
              f"{c:.4f}", flush=True)

    # speed: batch-of-T step vs dense batch matmul
    from effort_tpu.utils.timing import fold_bounce as bounce

    def mk_batch(n):
        @jax.jit
        def run(V, bmx):
            def body(i, V):
                return bounce(mxu_matvec_batch(bmx, V, effs, 0,
                                               alpha=alpha), V)
            return jax.lax.fori_loop(0, n, body, V)
        return run
    tb = chain_time(mk_batch, 8, 104,
                    [(acts(300 + i), bm) for i in range(12)])

    def mk_dense(n):
        @jax.jit
        def run(V, w):
            def body(i, V):
                Y = jnp.dot(V.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
                return bounce(Y, V)
            return jax.lax.fori_loop(0, n, body, V)
        return run
    td = chain_time(mk_dense, 8, 104,
                    [(acts(100 + i), bm.dense[0]) for i in range(12)])

    def mk_single(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                y = mxu_matvec(bmx, v, effort, 0, alpha=alpha)
                return bounce(y, v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t1 = chain_time(mk_single, 8, 104,
                    [(acts(500 + i, 1)[0], bm) for i in range(12)])

    print(f"dense batch-{T}: {td*1e6:7.1f} us", flush=True)
    print(f"mxu   batch-{T}: {tb*1e6:7.1f} us ({td/tb:4.2f}x dense; "
          f"{tb/T*1e6:5.1f} us/slot)", flush=True)
    print(f"mxu   single  : {t1*1e6:7.1f} us "
          f"(batch amortization {t1*T/tb:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
