"""Lab 3: multi-buffered gather (latency hiding) + streaming block-size scan.

Usage: kernel_lab3.py [B] [G] [effort] [bufcount]
"""

import sys
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.effort import select_blocks

IN, OUT = 4096, 14336


def bench(fn, args_list, n=30):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


@functools.partial(jax.jit, static_argnames=("rows", "mult"))
def stream_sum(vals, *, rows, mult):
    """Stream the whole array with blocks of rows*mult sublanes."""
    nb, g, ob = vals.shape
    v2 = vals.reshape(nb // mult, g * mult, ob)

    def kernel(v_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(v_ref[0].astype(jnp.float32), axis=0,
                              keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(nb // mult,),
        in_specs=[pl.BlockSpec((1, g * mult, ob), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, ob), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, ob), jnp.float32),
    )(v2)


def _kernel(B, K, nc, bids_ref, u_ref, vals_ref, pos_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    bid = bids_ref[b]
    k = jax.lax.rem(bid, K)
    g = jax.lax.rem(bid // K, nc)
    u = u_ref[k, g, :]
    c = vals_ref[0].astype(jnp.float32) * u[:, None]
    p = pos_ref[0].astype(jnp.int32)
    for pp in range(B):
        out_ref[pp, :] += jnp.sum(jnp.where(p == pp, c, 0.0), axis=0)


@functools.partial(jax.jit,
                   static_argnames=("B", "K", "G", "OB", "nc", "bufs"))
def gather_buffered(vals, pos, bids, u, *, B, K, G, OB, nc, bufs):
    mode = pl.Buffered(buffer_count=bufs, use_lookahead=True) if bufs else None
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    bufs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    wt = jax.random.normal(jax.random.key(0), (IN, OUT), jnp.float32) * 0.02
    vs = [jax.random.normal(jax.random.key(100 + i), (IN,), jnp.float32)
          for i in range(8)]
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G))
    K, OB, nc = bm.n_ranks, bm.n_buckets, bm.n_chunks
    NB = bm.blocks_per_expert
    print(f"B={B} G={G} blocks={NB} block_kB={G*OB*2//1024}", flush=True)

    for mult in (1, 4, 16):
        if (NB + 1) % mult:
            continue
        t = bench(lambda v: stream_sum(v, rows=G, mult=mult),
                  [(bm.vals,)], n=10)
        by = bm.vals.size * 2
        print(f"stream mult={mult:3d} ({G*mult*OB*2//1024:5d} kB): "
              f"{t*1e6:9.1f} us ({by/t/1e9:6.1f} GB/s)", flush=True)

    max_blocks = ((int(NB * min(1.0, effort * 1.3 + 0.02)) + 7) // 8) * 8
    sels = [select_blocks(bm, v, effort, 0, max_blocks) for v in vs]
    jax.block_until_ready(sels[0].block_ids)
    print(f"effort={effort} max_blocks={max_blocks} "
          f"real={int(sels[0].n_blocks)}", flush=True)
    bytes_rd = max_blocks * G * OB * 3

    # sequential-ids control: same machinery, contiguous ids
    seq = jnp.arange(max_blocks, dtype=jnp.int32)
    for name, idsets in [("seqids", [(seq, s.u_scaled) for s in sels]),
                         ("gather", [(s.block_ids, s.u_scaled)
                                     for s in sels])]:
        for bc in (0, 2, bufs):
            f = functools.partial(gather_buffered, B=B, K=K, G=G, OB=OB,
                                  nc=nc, bufs=bc)
            t = bench(lambda ids, u, f=f: f(bm.vals, bm.pos, ids, u), idsets)
            print(f"{name} bufs={bc}: {t*1e6:9.1f} us "
                  f"({bytes_rd/t/1e9:6.1f} GB/s, "
                  f"{t/max_blocks*1e9:5.0f} ns/blk)", flush=True)


if __name__ == "__main__":
    main()
