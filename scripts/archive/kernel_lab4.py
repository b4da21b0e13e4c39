"""Lab 4: honest (chained-slope) timing of dense vs gather bucketMul.

Square matrix so output feeds back as next input. Measures:
  - dense matvec
  - stream-sum (sequential whole-array read) at several block sizes
  - gather kernel: buffer_count scan + sequential-ids control

Usage: kernel_lab4.py [B] [G] [effort] [N=8192]
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
from effort_tpu.utils.timing import chain_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    v0 = jax.random.normal(jax.random.key(1), (N,), jnp.float32)
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   keep_dense=True)
    K, OB, nc = bm.n_ranks, bm.n_buckets, bm.n_chunks
    NB = bm.blocks_per_expert
    wbytes = N * N * 2
    print(f"B={B} G={G} N={N} blocks={NB} block_kB={G*OB*2//1024}",
          flush=True)

    # ---- dense ----
    def mk_dense(n):
        @jax.jit
        def run(v, w):
            def body(i, v):
                y = dense_matvec(v, w)
                return jnp.tanh(y * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t = chain_time(mk_dense, 4, 16, v0, bm.dense[0])
    t_dense = t
    print(f"dense      : {t*1e6:8.1f} us  ({wbytes/t/1e9:6.1f} GB/s)",
          flush=True)

    # ---- stream-sum, carry-dependent (arrays passed as args: closures
    # embed device arrays as giant MLIR constants) ----
    def stream_kernel(c_ref, v_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = c_ref[...].astype(jnp.float32) * 0.0
        o_ref[...] += jnp.sum(v_ref[0].astype(jnp.float32), axis=0,
                              keepdims=True)

    def pc(c, v2, rows, nblk2):
        return pl.pallas_call(
            stream_kernel,
            grid=(nblk2,),
            in_specs=[pl.BlockSpec((1, OB), lambda b: (0, 0)),
                      pl.BlockSpec((1, rows, OB), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, OB), lambda b: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, OB), jnp.float32),
        )(c, v2)

    def mk_stream(n, rows, nblk2):
        @jax.jit
        def run(c, v2):
            return jax.lax.fori_loop(
                0, n, lambda i, c: pc(c, v2, rows, nblk2) * 1e-6, c)
        return run

    for mult in (1, 4, 16):
        if (NB + 1) % mult:
            continue
        rows, nblk2 = G * mult, (NB + 1) // mult
        v2 = bm.vals.reshape(nblk2, rows, OB)
        t = chain_time(lambda n, rows=rows, nblk2=nblk2: mk_stream(
            n, rows, nblk2), 2, 6,
            jnp.zeros((1, OB), jnp.float32), v2)
        print(f"stream x{mult:3d} ({rows*OB*2//1024:6d} kB): {t*1e6:8.1f} us "
              f"({(NB+1)*G*OB*2/t/1e9:6.1f} GB/s)", flush=True)

    # ---- gather ----
    max_blocks = ((int(NB * min(1.0, effort * 1.3 + 0.02)) + 7) // 8) * 8
    sel0 = select_blocks(bm, v0, effort, 0, max_blocks)
    print(f"effort={effort} max_blocks={max_blocks} "
          f"real={int(sel0.n_blocks)}", flush=True)
    bytes_rd = max_blocks * G * OB * 3

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

    def mk_gather(n, bufs, seq):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                sel = select_blocks(bmx, v, effort, 0, max_blocks)
                bids = (jnp.arange(max_blocks, dtype=jnp.int32) if seq
                        else (jnp.sort(sel.block_ids) if seq is None or True
                              else sel.block_ids))
                acc = gather_call(bmx.vals, bmx.pos, bids, sel.u_scaled,
                                  bufs)
                y = acc.T.reshape(-1)
                return jnp.tanh(y * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run

    import dataclasses
    bm_nd = dataclasses.replace(bm, dense=None)
    for seq in (True, False):
        for bufs in (0, 2, 4, 8):
            f = lambda n, bufs=bufs, seq=seq: mk_gather(n, bufs, seq)
            t = chain_time(f, 4, 16, v0, bm_nd)
            tag = "seqids" if seq else "gather"
            print(f"{tag} bufs={bufs}: {t*1e6:8.1f} us "
                  f"({bytes_rd/t/1e9:6.1f} GB/s, "
                  f"{t/max_blocks*1e9:5.0f} ns/blk, "
                  f"vs dense {t_dense/t:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
