"""Kernel experiments: isolate where gather-bucketMul time goes on the TPU.

Variants:
  dense-vary     honest dense matvec timing (distinct input each call)
  gather-full    current kernel (B-way select)
  gather-noselect same DMA traffic, no position scatter (pure accumulate)
  gather-f32pos  positions pre-converted to bf16, compare in f32
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.effort import select_blocks
from effort_tpu.ops.bucketmul import dense_matvec

IN, OUT = 4096, 14336


def bench(fn, args_list, n=30):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def make_variant(B, K, n_chunks, mode):
    def kernel(bids_ref, u_ref, vals_ref, pos_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        bid = bids_ref[b]
        k = jax.lax.rem(bid, K)
        g = jax.lax.rem(bid // K, n_chunks)
        u = u_ref[k, g, :]
        vals = vals_ref[0].astype(jnp.float32)
        c = vals * u[:, None]
        if mode == "noselect":
            out_ref[0, :] += jnp.sum(c, axis=0)
        elif mode == "f32pos":
            p = pos_ref[0]  # bf16 positions
            for pp in range(B):
                out_ref[pp, :] += jnp.sum(
                    jnp.where(p == float(pp), c, 0.0), axis=0)
        else:
            p = pos_ref[0].astype(jnp.int32)
            for pp in range(B):
                out_ref[pp, :] += jnp.sum(jnp.where(p == pp, c, 0.0), axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("B", "K", "G", "OB", "n_chunks",
                                             "mode"))
def gather_variant(vals, pos, bids, u, *, B, K, G, OB, n_chunks, mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bids.shape[0],),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0)),
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, OB), lambda b, bids: (0, 0)),
    )
    return pl.pallas_call(
        make_variant(B, K, n_chunks, mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
    )(bids, u, vals, pos)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    k1, k2 = jax.random.split(jax.random.key(0))
    wt = jax.random.normal(k1, (IN, OUT), jnp.float32) * 0.02
    vs = [jax.random.normal(jax.random.key(100 + i), (IN,), jnp.float32)
          for i in range(8)]
    cfg = BucketConfig(bucket_size=B, chunk_rows=G)
    bm = bucketize(wt, cfg, keep_dense=True)
    K, OB, n_chunks = bm.n_ranks, bm.n_buckets, bm.n_chunks
    print("bucketized; blocks/expert =", bm.blocks_per_expert, flush=True)

    dense_f = jax.jit(dense_matvec)
    t = bench(dense_f, [(v, bm.dense[0]) for v in vs])
    print(f"dense-vary : {t*1e6:8.1f} us  ({IN*OUT*2/t/1e9:6.1f} GB/s)",
          flush=True)

    max_blocks = ((int(bm.blocks_per_expert * min(1.0, effort * 1.3 + 0.02))
                   + 7) // 8) * 8
    sel_f = jax.jit(functools.partial(select_blocks, max_blocks=max_blocks),
                    static_argnames=())
    sels = [select_blocks(bm, v, effort, 0, max_blocks) for v in vs]
    jax.block_until_ready(sels[0].block_ids)
    nblk = int(sels[0].n_blocks)
    bytes_rd = nblk * G * OB * (2 + 1)
    print(f"effort={effort} max_blocks={max_blocks} real={nblk} "
          f"bytes={bytes_rd/1e6:.1f} MB", flush=True)

    # selection overhead alone
    t = bench(lambda v: select_blocks(bm, v, effort, 0, max_blocks).block_ids,
              [(v,) for v in vs])
    print(f"select-only: {t*1e6:8.1f} us", flush=True)

    pos_bf16 = bm.pos.astype(jnp.bfloat16)
    for mode, pos in [("full", bm.pos), ("noselect", bm.pos),
                      ("f32pos", pos_bf16)]:
        f = functools.partial(gather_variant, B=B, K=K, G=G, OB=OB,
                              n_chunks=n_chunks, mode=mode)
        t = bench(lambda s, p=pos, f=f: f(bm.vals, p, s.block_ids,
                                          s.u_scaled),
                  [(s,) for s in sels])
        print(f"gather-{mode:9s}: {t*1e6:8.1f} us  "
              f"({bytes_rd/t/1e9:6.1f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
