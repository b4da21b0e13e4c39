"""Runtime effort selection: cutoff, per-row rank counts, block compaction.

This module is the TPU-native replacement for the reference's
findCutoff32 + prepareDispatch pair (bucketMul.metal:141-247, 47-79):

  - cutoff: an exact sorted quantile of the sampled |v * probe| scores
    (the reference runs a tolerance-terminated threadgroup binary search —
    nondeterministic to +-3 counts; ours is exact and deterministic).
  - selection: the rule stats[i,k]*|v_i| > cutoff is monotone in k because
    stats (mean |w| of rank-k elements) is non-increasing in k, so the
    selected set per input row is a rank PREFIX n_i. We compute n_i densely
    on the VPU — no atomics, no dispatch-order nondeterminism
    (cf. docs/gpu.html "Dispatch non-determinism").
  - compaction: selected (chunk, rank) weight blocks are compacted into a
    fixed-capacity id list with top_k (priority = block importance), padded
    with the all-zero block id. This replaces the atomic-append dispatch
    list + roundUp/zeroRange32 padding patch (bucketMul.swift:54-66).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from effort_tpu.ops.layouts import BucketedMatrix


def compute_cutoff(v: jax.Array, probes: jax.Array, probe_dims: jax.Array,
                   effort) -> jax.Array:
    """Exact quantile cutoff. v:[in], probes:[P] (one expert), effort scalar.

    Returns the k-th largest of |v[probe_dims]*probes| with
    k = clip(round(P*effort), 1, P), so ~effort*P samples lie above.
    """
    scores = jnp.abs(v[probe_dims] * probes)
    P = scores.shape[0]
    k = jnp.clip(jnp.round(P * jnp.asarray(effort, jnp.float32)), 1, P
                 ).astype(jnp.int32)
    s_desc = -jnp.sort(-scores)
    return s_desc[k - 1]


def row_rank_counts(v: jax.Array, stats: jax.Array, cutoff: jax.Array):
    """n_i in [0, K]: how many leading ranks of row i pass the cutoff.

    stats: [in, K] (one expert). Returns int32 [in].
    """
    sel = stats * jnp.abs(v)[:, None] > cutoff
    return jnp.sum(sel, axis=1).astype(jnp.int32)


class BlockSelection(NamedTuple):
    """Compacted dispatch for the gather kernel."""
    block_ids: jax.Array     # [max_blocks] int32, padded with zero_block_id
    u_scaled: jax.Array      # [K, n_chunks, G] f32: v * rank-mask (* scale)
    n_blocks: jax.Array      # [] int32 — number of real (non-pad) blocks


def select_blocks(bm: BucketedMatrix, v: jax.Array, effort,
                  expert, max_blocks: int) -> BlockSelection:
    """Build the compacted block list + masked/scaled input for one matvec.

    expert: traced int32 scalar (index into the packed expert axis, like the
    reference's expNo offset, bucketMul.metal:58).
    """
    K, G = bm.n_ranks, bm.chunk_rows
    n_chunks = bm.n_chunks
    expert = jnp.asarray(expert, jnp.int32)
    if bm.dim_order is not None:
        v = v[bm.dim_order[expert]]

    probes = bm.probes[expert]
    stats = bm.stats[expert]                      # [in, K]
    cutoff = compute_cutoff(v, probes, bm.probe_dims, effort)
    n = row_rank_counts(v, stats, cutoff)         # [in]

    # Masked input, with int8/int4 dequant scales folded in so the kernel is
    # dtype-agnostic: u[k,i] = v_i * 1[k < n_i] (* scale[i,k]).
    ranks = jnp.arange(K, dtype=jnp.int32)
    u = v[None, :] * (ranks[:, None] < n[None, :])          # [K, in]
    if bm.scales is not None:
        u = u * bm.scales[expert].T                          # [K, in]
    u_scaled = u.reshape(K, n_chunks, G).astype(jnp.float32)

    # Block (k, g) is needed iff any row in chunk g selects rank k, i.e.
    # max_i n_i > k. Compaction by exclusive cumsum over the RANK-MAJOR
    # flag order (matching the block-id layout) — no top_k: ids come out
    # ascending (DMA-friendly) and capacity overflow drops the deepest
    # ranks first, mirroring the reference's global importance order.
    maxn = jnp.max(n.reshape(n_chunks, G), axis=1)           # [n_chunks]
    bneed = ranks[:, None] < maxn[None, :]                   # [K, n_chunks]
    flags = bneed.reshape(-1).astype(jnp.int32)              # rank-major
    nb_total = flags.shape[0]
    cum = jnp.cumsum(flags)
    slot = jnp.where(flags == 1, cum - 1, max_blocks)
    slot = jnp.minimum(slot, max_blocks)                     # overflow bin
    gids = (expert * bm.blocks_per_expert
            + jnp.arange(nb_total, dtype=jnp.int32))
    ids_full = jnp.full((max_blocks + 1,), bm.zero_block_id, jnp.int32)
    ids_full = ids_full.at[slot].set(
        jnp.where(flags == 1, gids, bm.zero_block_id), mode="drop")
    ids = ids_full[:max_blocks]
    # pads were overwritten wherever slots landed; rebuild pad tail
    n_real = jnp.minimum(cum[-1], max_blocks)
    tail = jnp.arange(max_blocks, dtype=jnp.int32) >= n_real
    ids = jnp.where(tail, bm.zero_block_id, ids)
    return BlockSelection(block_ids=ids, u_scaled=u_scaled,
                          n_blocks=cum[-1])
