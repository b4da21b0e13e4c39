"""Runtime effort selection: cutoff, per-row rank counts, block compaction.

This module is the TPU-native replacement for the reference's
findCutoff32 + prepareDispatch pair (bucketMul.metal:141-247, 47-79):

  - cutoff: a quantile of the sampled |v * probe| scores via a two-level
    vectorized threshold search (deterministic, ~1% value accuracy; the
    reference's threadgroup binary search is tolerance-terminated and
    nondeterministic to +-3 counts). A sort-based exact version exists for
    tests.
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

from effort_tpu.ops.layouts import BucketedMatrix, strided_sample


def compute_cutoff(v_probe_sample: jax.Array, probes: jax.Array,
                   effort) -> jax.Array:
    """Approximate quantile cutoff: a value with ~effort*P of the sampled
    |v[probe_dims]*probes| above it (within ~1% in value).

    Two-level geometric threshold counting instead of a sort: XLA sorts of
    even 4096 elements cost ~150us on TPU, while two broadcast-compare
    count passes are ~2us. Fidelity matches the reference's
    tolerance-terminated binary search (findCutoff32,
    bucketMul.metal:199-246), which also stops at approximate counts.
    """
    scores = jnp.abs(v_probe_sample * probes)
    P = scores.shape[0]
    k = jnp.clip(jnp.round(P * jnp.asarray(effort, jnp.float32)), 1.0,
                 float(P))

    m = jnp.max(scores) + 1e-30
    NL = 32
    ratios = jnp.float32(0.62) ** jnp.arange(1, NL + 1, dtype=jnp.float32)

    def level(lo_val, hi_val):
        # thresholds geometric/linear between hi and lo; count above each
        t = hi_val * ratios                                   # [NL]
        counts = jnp.sum(scores[None, :] > t[:, None], axis=1)  # [NL]
        # first threshold whose count >= k (counts increase as t decreases)
        idx = jnp.argmax(counts >= k)
        hit = counts[idx] >= k
        t_lo = jnp.where(hit, t[idx], lo_val)
        t_hi = jnp.where(hit & (idx > 0), t[jnp.maximum(idx - 1, 0)],
                         hi_val)
        return t_lo, t_hi

    lo, hi = level(jnp.float32(0.0), m)
    # refine linearly inside [lo, hi]
    fr = jnp.arange(1, NL + 1, dtype=jnp.float32) / NL
    t2 = hi - (hi - lo) * fr                                  # [NL] desc
    counts2 = jnp.sum(scores[None, :] > t2[:, None], axis=1)
    idx2 = jnp.argmax(counts2 >= k)
    hit2 = counts2[idx2] >= k
    return jnp.where(hit2, t2[idx2], lo)


def compute_cutoff_exact(v_probe_sample, probes, effort):
    """Sort-based exact version (tests / oracle comparisons)."""
    scores = jnp.abs(v_probe_sample * probes)
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
                  expert, max_blocks: int,
                  exact_cutoff: bool = False) -> BlockSelection:
    """Build the compacted block list + masked/scaled input for one matvec.

    expert: traced int32 scalar (index into the packed expert axis, like the
    reference's expNo offset, bucketMul.metal:58).
    """
    K, G = bm.n_ranks, bm.chunk_rows
    n_chunks = bm.n_chunks
    expert = jnp.asarray(expert, jnp.int32)
    v = bm.permute_v(v, expert)

    probes = bm.probes[expert]
    stats = bm.stats[expert]                      # [in, K]
    cf = compute_cutoff_exact if exact_cutoff else compute_cutoff
    cutoff = cf(strided_sample(v, bm.in_dim, probes.shape[0]), probes,
                effort)
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
