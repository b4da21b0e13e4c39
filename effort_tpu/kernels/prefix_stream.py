"""bucketMul kernel v3: per-rank PREFIX STREAMING.

The selection rule (stats[i,k]*|v_i| > cutoff) combined with the
activation-calibrated row ordering means the selected rows of each rank
slab cluster at the slab's front. Instead of gathering scattered blocks,
this kernel streams a contiguous PREFIX of each rank slab:

    len_k ~ alpha * count(n_i > k)   (alpha = straggler cover margin)

and relies on the u-mask for exactness of what is read. Rows selected
beyond the prefix are dropped — a measured-quality tradeoff that at equal
bytes clearly beats block gathering (oracle study: ~0.99 cos at 0.34x
weight bytes vs 0.99 at 0.50x for chunk-gather, e=0.25 heavy-tailed
activations).

Properties:
  - purely contiguous DMA (full HBM streaming bandwidth, tiles ~1 MB),
  - dispatch = K scalars (cumulative tile counts) — no id lists, no sort,
    no compaction,
  - deterministic; supports bf16/int8/int4 via the same u-scaling trick.

This is the production decode kernel; the block-gather kernels
(gather_dma.py / gather_mul.py) remain as the exact-coverage alternative.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from effort_tpu.ops.layouts import BucketedMatrix, strided_sample
from effort_tpu.ops.effort import (compute_cutoff, compute_cutoff_exact,
                                   row_rank_counts)


class StreamSelection(NamedTuple):
    cum_tiles: jax.Array     # [K+1] int32 — cumulative tile counts
    base_blocks: jax.Array   # [K] int32 — first block id of each rank slab
    u_scaled: jax.Array      # [K, n_chunks, G] f32


def select_stream(bm: BucketedMatrix, v: jax.Array, effort, expert,
                  alpha: float = None, tile_blocks: int = 8,
                  exact_cutoff: bool = False,
                  tau: float = None) -> StreamSelection:
    """Compute per-rank prefix lengths (in tiles of tile_blocks chunks).

    Prefix lengths use the tau selected-mass coverage bound (see
    kernels.fused_stream._prefix_len — the same redesign that fixed the
    round-2 trained-checkpoint quality cliff); alpha is accepted for
    caller compatibility but ignored."""
    from effort_tpu.kernels.fused_stream import _TAU
    tau = _TAU if tau is None else tau
    K, G, nc = bm.n_ranks, bm.chunk_rows, bm.n_chunks
    expert = jnp.asarray(expert, jnp.int32)
    v = bm.permute_v(v, expert)
    probes = bm.probes[expert]
    cf = compute_cutoff_exact if exact_cutoff else compute_cutoff
    cutoff = cf(strided_sample(v, bm.in_dim, probes.shape[0]), probes,
                effort)
    n = row_rank_counts(v, bm.stats[expert], cutoff)     # [in]

    ranks = jnp.arange(K, dtype=jnp.int32)
    u = v[None, :] * (ranks[:, None] < n[None, :])
    if bm.scales is not None:
        u = u * bm.scales[expert].T
    u_scaled = u.reshape(K, nc, G).astype(jnp.float32)

    # per-rank coverage bound: shortest chunk prefix with tau of the
    # rank's selected score mass
    sel_mass = jnp.where(ranks[:, None] < n[None, :],
                         bm.stats[expert].T * jnp.abs(v)[None, :],
                         0.0).reshape(K, nc, G)              # [K, nc, G]
    cum_mass = jnp.cumsum(jnp.sum(sel_mass, axis=2), axis=1)  # [K, nc]
    tot = jnp.max(cum_mass, axis=1, keepdims=True)
    C = jnp.minimum(
        jnp.sum((cum_mass < tau * tot).astype(jnp.int32), axis=1) + 1, nc)
    lens = (C + tile_blocks - 1) // tile_blocks             # [K] tiles
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(lens).astype(jnp.int32)])
    base = (expert * K + ranks) * nc
    return StreamSelection(cum_tiles=cum, base_blocks=base,
                           u_scaled=u_scaled)


def _kernel(S, B, K, TGB, nc, pos_bits, max_tiles, vpacked, OB,
            cum_ref, base_ref, u_ref, vals_hbm, pos_hbm, out_ref,
            vscr, pscr, vsem, psem):
    G = vscr.shape[2]
    per_byte = 8 // pos_bits
    OBp = pscr.shape[3]
    OB_pad = OBp * per_byte          # pos padded to 128-byte lanes
    OBv = vscr.shape[3] * (2 if vpacked else 1)
    total = cum_ref[K]

    def tile_rank(t):
        # rank of flattened tile t: number of cum boundaries <= t
        r = jnp.int32(0)
        for k in range(1, K):
            r = r + (t >= cum_ref[k]).astype(jnp.int32)
        return r

    def start_block(t, k):
        return base_ref[k] + (t - cum_ref[k]) * TGB

    def dmas(t, slot):
        k = tile_rank(t)
        sb = start_block(t, k)
        return (pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(sb, TGB)], vscr.at[slot],
                    vsem.at[slot]),
                pltpu.make_async_copy(
                    pos_hbm.at[pl.ds(sb, TGB)], pscr.at[slot],
                    psem.at[slot]))

    out_ref[...] = jnp.zeros_like(out_ref)
    for s in range(S):                         # prologue
        @pl.when(s < total)
        def _(s=s):
            a, b = dmas(jnp.int32(s), s)
            a.start()
            b.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TGB, G, OB_pad), 2)
    shift = (lane // OBp) * pos_bits
    mask_val = (1 << pos_bits) - 1
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (TGB, G, OBv), 2)
    shift4 = (lane_v // (OBv // 2)) * 4                 # int4 nibble lanes

    def body(t, _):
        slot = jax.lax.rem(t, S)
        a, bdma = dmas(t, slot)
        a.wait()
        bdma.wait()
        k = tile_rank(t)
        toff = (t - cum_ref[k]) * TGB
        u = u_ref[k, pl.ds(toff, TGB), :]               # [TGB, G]
        if vpacked:
            # int4 two-per-byte (split-halves layout, see pack_positions)
            pv = pltpu.repeat(vscr[slot].astype(jnp.int32), 2, axis=2)
            q4 = ((pv >> shift4) & 15) - 8
            c = q4[:, :, :OB].astype(jnp.float32) * u[:, :, None]
        else:
            c = vscr[slot].astype(jnp.float32) * u[:, :, None]
        packed = pscr[slot].astype(jnp.int32)           # [TGB, G, OBp]
        p_pad = (pltpu.repeat(packed, per_byte, axis=2) >> shift) \
            & mask_val
        p = p_pad[:, :, :OB]
        for pp in range(B):
            m = (p == pp).astype(jnp.float32)
            out_ref[pp, :] += jnp.sum(m * c, axis=(0, 1))

        @pl.when(t + S < total)
        def _():
            a2, b2 = dmas(t + S, slot)
            a2.start()
            b2.start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.lru_cache(maxsize=None)
def _make_kernel(S, B, K, TGB, nc, bits, max_tiles, vpacked, OB):
    # cached: a fresh partial per call would defeat jax's trace cache and
    # recompile the kernel on every eager invocation
    return functools.partial(_kernel, S, B, K, TGB, nc, bits, max_tiles,
                             vpacked, OB)


def stream_matvec(bm: BucketedMatrix, sel: StreamSelection,
                  tile_blocks: int = 8, slots: int = 3) -> jax.Array:
    B, K, G, OB = (bm.bucket_size, bm.n_ranks, bm.chunk_rows, bm.n_buckets)
    bits = bm.pos_bits
    nc = bm.n_chunks
    assert nc % tile_blocks == 0, (nc, tile_blocks)
    max_tiles = K * (nc // tile_blocks)
    vpacked = bm.vals_packed
    kernel = _make_kernel(slots, B, K, tile_blocks, nc, bits, max_tiles,
                          vpacked, OB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # u
            pl.BlockSpec(memory_space=pl.ANY),      # vals
            pl.BlockSpec(memory_space=pl.ANY),      # pos packed
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_blocks, G, bm.vals.shape[-1]),
                       bm.vals.dtype),
            pltpu.VMEM((slots, tile_blocks, G, bm.pos.shape[-1]),
                       jnp.uint8),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sel.cum_tiles, sel.base_blocks, sel.u_scaled, bm.vals, bm.pos)
    return acc.T.reshape(OB * B)
