"""Pallas TPU kernel: gathered bucketMul.

The TPU-native equivalent of the reference's hot kernel chain
(bucketMul + bucketIntegrate, bucketMul.metal:83-137). Design:

  - The effort selection (ops/effort.py) compacts the needed (chunk, rank)
    weight blocks into a fixed-capacity id list. Here those ids are
    scalar-prefetched, and Mosaic's pipeline machinery double-buffers the
    HBM->VMEM DMA of each [G, out/B] block automatically — only selected
    blocks are ever read from HBM. This is where the bandwidth (and thus
    tokens/s) win over a dense matvec comes from.
  - Padding slots point at a trailing all-zero block, so pads contribute
    exactly zero and need no masking (replaces zeroRange32 padding,
    bucketMul.metal:11-31).
  - Position scatter: the within-bucket positions (0..B-1) are applied with
    a B-way masked accumulate into a [B, out/B] f32 VMEM accumulator that
    lives across all grid steps; a final cheap transpose interleaves it to
    [out]. This replaces the Metal 16-slot accumulator select loop
    (bucketMul.metal:102-106); B is configurable because the VPU cost of
    the scatter is ~3*B ops/element (B=4 is the default sweet spot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from effort_tpu.ops.layouts import BucketedMatrix
from effort_tpu.ops.effort import BlockSelection


def _kernel(B: int, K: int, n_chunks: int,
            bids_ref, u_ref, vals_ref, pos_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    bid = bids_ref[b]
    k = jax.lax.rem(bid // n_chunks, K)
    g = jax.lax.rem(bid, n_chunks)

    u = u_ref[k, g, :]                                  # [G] f32
    vals = vals_ref[0].astype(jnp.float32)              # [G, OB]
    c = vals * u[:, None]
    # int8 vector compares are unsupported by Mosaic on v5e; upcast once.
    # Arithmetic masking instead of jnp.where: avoids a jax lowering-cache
    # bug with closed '_where' calls across pallas lowerings, and maps to
    # cmp+convert+mul on the VPU.
    p = pos_ref[0].astype(jnp.int32)                    # [G, OB]

    if B == 1:
        out_ref[0, :] += jnp.sum(c, axis=0)
    else:
        for pp in range(B):
            mask = (p == pp).astype(jnp.float32)
            out_ref[pp, :] += jnp.sum(mask * c, axis=0)


def _gather_call(vals, pos, block_ids, u_scaled, *, B, K, G, OB, n_chunks,
                 bufs=2, interpret=False):
    # NOT @jax.jit: this is called inside outer-jitted decode steps, and
    # nested jit (closed_call) trips a lowering-cache KeyError in this
    # jax version when combined with pallas lowerings.
    max_blocks = block_ids.shape[0]
    # select_blocks emits ascending ids (DMA-friendly); pads at the end.
    # buffer_count > 2 hides the per-block DMA latency of the gathered
    # (data-dependent) block stream.
    mode = (pl.Buffered(buffer_count=bufs, use_lookahead=False)
            if (bufs and not interpret) else None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # u: whole array
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0),
                         pipeline_mode=mode),
            pl.BlockSpec((1, G, OB), lambda b, bids: (bids[b], 0, 0),
                         pipeline_mode=mode),
        ],
        out_specs=pl.BlockSpec((B, OB), lambda b, bids: (0, 0)),
    )
    kernel = functools.partial(_kernel, B, K, n_chunks)
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
        interpret=interpret,
    )(block_ids, u_scaled, vals, pos)
    return acc.T.reshape(OB * B)                        # y[j*B+p] = acc[p,j]


def gather_bucket_matvec(bm: BucketedMatrix, sel: BlockSelection,
                         interpret: bool | None = None) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_call(
        bm.vals, bm.pos_unpacked(), sel.block_ids, sel.u_scaled,
        B=bm.bucket_size, K=bm.n_ranks, G=bm.chunk_rows,
        OB=bm.n_buckets, n_chunks=bm.n_chunks, interpret=interpret)
