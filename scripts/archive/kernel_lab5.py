"""Lab 5: gather kernel with multi-buffering — random vs sorted vs seq ids.

Usage: kernel_lab5.py [B] [G] [effort] [N=8192]
"""

import sys
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.effort import select_blocks
from effort_tpu.ops.bucketmul import dense_matvec
from effort_tpu.kernels.gather_mul import _kernel
from effort_tpu.utils.timing import chain_time, fresh_vectors


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   keep_dense=True)
    import dataclasses
    bm_nd = dataclasses.replace(bm, dense=None)
    K, OB, nc = bm.n_ranks, bm.n_buckets, bm.n_chunks
    NB = bm.blocks_per_expert
    wbytes = N * N * 2
    print(f"B={B} G={G} N={N} blocks={NB} block_kB={G*OB*2//1024}",
          flush=True)

    def mk_dense(n):
        @jax.jit
        def run(v, w):
            return jax.lax.fori_loop(
                0, n,
                lambda i, v: jnp.tanh(dense_matvec(v, w) * 0.02), v)
        return run
    t_dense = chain_time(mk_dense, 8, 136,
                         [(v, bm.dense[0]) for v in
                          fresh_vectors((N,), 12)])
    print(f"dense: {t_dense*1e6:8.1f} us ({wbytes/t_dense/1e9:6.1f} GB/s)",
          flush=True)

    max_blocks = ((int(NB * min(1.0, effort * 1.3 + 0.02)) + 7) // 8) * 8
    bytes_rd = max_blocks * G * OB * 3
    print(f"effort={effort} max_blocks={max_blocks}", flush=True)

    def gather_call(vals, pos, bids, u, bufs):
        mode = (pl.Buffered(buffer_count=bufs, use_lookahead=False)
                if bufs else None)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bids.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0),
                             pipeline_mode=mode),
                pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0),
                             pipeline_mode=mode),
            ],
            out_specs=pl.BlockSpec((B, OB), lambda b, bids: (0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, B, K, nc),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
        )(bids, u, vals, pos)

    def mk_gather(n, bufs, ids_mode):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                sel = select_blocks(bmx, v, effort, 0, max_blocks)
                if ids_mode == "seq":
                    bids = jnp.arange(max_blocks, dtype=jnp.int32)
                elif ids_mode == "sorted":
                    bids = jnp.sort(sel.block_ids)
                else:
                    bids = sel.block_ids
                acc = gather_call(bmx.vals, bmx.pos, bids, sel.u_scaled,
                                  bufs)
                return jnp.tanh(acc.T.reshape(-1) * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run

    for ids_mode in ("sorted", "seq"):
        for bufs in (2, 4, 8):
            f = functools.partial(mk_gather, bufs=bufs, ids_mode=ids_mode)
            t = chain_time(f, 8, 136,
                           [(v, bm_nd) for v in
                            fresh_vectors((N,), 12, seed0=999)])
            print(f"{ids_mode:6s} bufs={bufs}: {t*1e6:8.1f} us "
                  f"({bytes_rd/t/1e9:6.1f} GB/s, "
                  f"{t/max_blocks*1e9:5.0f} ns/blk, "
                  f"vs dense {t_dense/t:5.2f}x)", flush=True)


if __name__ == "__main__":
    main()
