"""Lab 2: discriminate DMA-latency vs bandwidth; test U-pregather variant.

Usage: kernel_lab2.py [B] [G] [effort]
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


# ---------- pure streaming bandwidth: sequential blocks, accumulate ----------
@functools.partial(jax.jit, static_argnames=("rows",))
def stream_sum(vals, *, rows):
    nblocks = vals.shape[0]

    def kernel(v_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(v_ref[0].astype(jnp.float32), axis=0,
                              keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1, rows, vals.shape[2]),
                               lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, vals.shape[2]), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, vals.shape[2]), jnp.float32),
    )(vals)


# ---------- gather with pre-gathered per-block U (no scalar math) ----------
def _kernel_ub(B, bids_ref, u_ref, vals_ref, pos_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
    u = u_ref[0]                                   # [G]
    c = vals_ref[0].astype(jnp.float32) * u[:, None]
    p = pos_ref[0].astype(jnp.int32)
    for pp in range(B):
        out_ref[pp, :] += jnp.sum(jnp.where(p == pp, c, 0.0), axis=0)


@functools.partial(jax.jit, static_argnames=("B", "G", "OB"))
def gather_ub(vals, pos, bids, ublocks, *, B, G, OB):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bids.shape[0],),
        in_specs=[
            pl.BlockSpec((1, G), lambda b, bids: (b, 0)),
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0)),
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, OB), lambda b, bids: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_ub, B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
    )(bids, ublocks, vals, pos)


def pregather_u(sel, bm):
    K, nc, G = sel.u_scaled.shape
    bids = sel.block_ids
    k = bids % K
    g = (bids // K) % nc
    return sel.u_scaled[k, g, :]                   # [max_blocks, G]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    k1 = jax.random.key(0)
    wt = jax.random.normal(k1, (IN, OUT), jnp.float32) * 0.02
    vs = [jax.random.normal(jax.random.key(100 + i), (IN,), jnp.float32)
          for i in range(8)]
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G))
    K, OB, nc = bm.n_ranks, bm.n_buckets, bm.n_chunks
    NB = bm.blocks_per_expert
    print(f"B={B} G={G} blocks={NB} block_kB={G*OB*2//1024}", flush=True)

    # streaming bandwidth ceiling
    t = bench(lambda v: stream_sum(v, rows=G), [(bm.vals,)], n=10)
    by = bm.vals.size * 2
    print(f"stream-sum : {t*1e6:9.1f} us  ({by/t/1e9:6.1f} GB/s)", flush=True)

    max_blocks = ((int(NB * min(1.0, effort * 1.3 + 0.02)) + 7) // 8) * 8
    sels = [select_blocks(bm, v, effort, 0, max_blocks) for v in vs]
    ubs = [pregather_u(s, bm) for s in sels]
    jax.block_until_ready(ubs[0])
    nblk = int(sels[0].n_blocks)
    bytes_rd = max_blocks * G * OB * 3
    print(f"effort={effort} max_blocks={max_blocks} real={nblk}", flush=True)

    f = functools.partial(gather_ub, B=B, G=G, OB=OB)
    t = bench(lambda s, u: f(bm.vals, bm.pos, s.block_ids, u),
              list(zip([s for s in sels], ubs)))
    print(f"gather-ub  : {t*1e6:9.1f} us  ({bytes_rd/t/1e9:6.1f} GB/s, "
          f"{t/max_blocks*1e9:.0f} ns/block)", flush=True)


if __name__ == "__main__":
    main()
