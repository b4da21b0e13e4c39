"""bucketMul kernel v4: FULLY FUSED selection + prefix streaming.

One pallas_call = one effort-truncated matvec. The XLA-side dispatch of
kernel v3 (prefix_stream.select_stream: cutoff quantile, rank counts,
u-mask, prefix lengths — ~30 small XLA ops) costs ~40us/call in per-op
launch overhead on TPU, which dwarfs the actual streaming work for every
matrix smaller than w1 and halves the speedup even there. Here the whole
dispatch runs INSIDE the kernel, on the same data the kernel already
holds:

  prologue (VPU + scalar core):
    scores = |v_sample * probes|            (findCutoff32's probe dot,
                                             bucketMul.metal:141-198)
    cutoff  = two-level geometric/linear threshold count (the TPU
              replacement for the reference's threadgroup binary search,
              bucketMul.metal:199-246 — same formulas as
              ops.effort.compute_cutoff, traced scalar arithmetic)
    n_i     = rank counts; u_k = v * [k < n_i] (* dequant scale)
    lens_k  = tau selected-mass coverage bound (_prefix_len) -> offsets
  main loop: identical DMA-ring prefix streaming as prefix_stream._kernel.

Everything after the (tiny) input transfers is a single launch;
per-matvec overhead drops from ~45us to the pallas dispatch (~5us).

Requires in_dim % 128 == 0 and probe-sample length % 128 == 0 (true for
all production shapes); bucket_matvec falls back to the v3 path
otherwise.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from effort_tpu.ops.layouts import BucketedMatrix, strided_sample

_NL = 32          # thresholds per cutoff-search level (matches compute_cutoff)
_RATIO = 0.62
# Default streamed-prefix over-read factor (see ops.bucketmul.DEFAULT_ALPHA)
_ALPHA = float(os.environ.get("EFFORT_TPU_ALPHA", "1.3"))
# Selected-mass coverage target for the streamed prefix (see _prefix_len).
# Default chosen from the measured tau -> (speed, cos) curve
# (scripts/tau_sweep.py, artifacts/tau_sweep.json): at effort 25% on the
# w1-shape lognormal workload (round-4 re-measure, 5-rep medians),
# 0.97 -> 2.04x dense @ cos 0.9911 vs
# 1.0 -> 1.26x @ cos 0.9931 — the exact-coverage ceiling is the
# selection itself, so the last 3% of selected mass buys ~0.002 cos for
# a third of the speedup.
_TAU = float(os.environ.get("EFFORT_TPU_TAU", "0.97"))
# Force interpret-mode pallas (CPU debugging/eval of the production
# kernel semantics without a TPU; ~100x slower).
_INTERPRET = os.environ.get("EFFORT_TPU_INTERPRET", "") == "1"


def _prefix_len(mass, tau):
    """Shortest chunk-prefix length covering tau of the selected mass.

    mass: [nc, ...] per-chunk selected score mass (stat*|v| summed over
    the chunk's rows, zero where unselected), in the stored (calibrated
    importance) chunk order. Returns [...] int32 chunk counts.

    This replaces round 2's alpha heuristic rows=ceil(count*alpha): that
    bound silently DROPPED selected rows whenever the selection was not
    prefix-concentrated — on trained checkpoints (flat-ish activation
    profiles) it dropped most of them below ~50% effort, producing the
    round-2 model-level quality cliff (agreement 0.05 @25% vs the
    reference's ~0.80, docs/ryc/ryc0.4.png). The coverage bound makes
    quality data-independent: tau=1.0 streams through the LAST selected
    chunk (exact bucketMul semantics, matching the reference's
    compacted dispatch, bucketMul.metal:47-79); tau<1 may stop earlier
    AND may stop far before count*alpha when the leading chunks carry
    the mass. Speed now honestly tracks how concentrated the calibrated
    ordering is instead of assuming it.
    """
    nc = mass.shape[0]
    # cumsum along chunks as a lower-triangular matmul: Mosaic has no
    # cumsum lowering, and nc <= ~112 makes the [nc, nc] dot free on the
    # MXU next to the streaming work.
    row = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
    tri = (col <= row).astype(jnp.float32)
    cum = jax.lax.dot_general(tri, mass, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    tot = jnp.max(cum, axis=0, keepdims=True)       # [1, ...]
    # cum is nondecreasing: #(cum < tau*tot) = first chunk reaching
    # tau*tot; +1 = number of chunks to stream. Zero selection -> 1.
    # Clamp to nc: a (user-error) tau > 1 would otherwise count all nc
    # chunks below threshold and send the DMA one tile past the slab.
    return jnp.minimum(
        jnp.sum((cum < tau * tot).astype(jnp.int32), axis=0) + 1, nc)

def _thresh_tables(lane):
    """Per-lane threshold coefficient tables, built from an iota (pallas
    kernels cannot capture array constants): geo[j] = _RATIO^(j+1),
    frac[j] = (j+1)/_NL, j = lane index."""
    j1 = (lane + 1).astype(jnp.float32)
    geo = jnp.exp(j1 * float(np.log(_RATIO)))
    frac = j1 * (1.0 / _NL)
    return geo, frac


def _vec_cutoff(scores, kq, m):
    """Two-level threshold search, vectorized over the _NL thresholds.

    Replaces 2*_NL serial whole-array reductions (≈5-6us on the VPU) with
    two broadcast compare+reduce passes (<1us). Thresholds within a level
    are strictly descending, so per-threshold counts are monotone
    non-decreasing and the first index with count >= kq equals the number
    of misses — no argmax needed. Semantics identical to
    ops.effort.compute_cutoff (findCutoff32, bucketMul.metal:141-247).

    scores: [A, B] f32; kq, m: traced scalars. Returns the cutoff scalar.
    """
    sc = scores[:, :, None]                                  # [A, B, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _NL), 2)
    geo, frac = _thresh_tables(lane)

    def level(tvec, lo0, hi0):
        # tvec: [1, 1, _NL] descending thresholds
        cnts = jnp.sum((sc > tvec).astype(jnp.float32), axis=(0, 1),
                       keepdims=True)                        # [1, 1, _NL]
        miss = (cnts < kq).astype(jnp.float32)
        nh = jnp.sum(miss)               # first-hit index (monotone cnts)
        any_hit = nh < float(_NL)
        nhi = nh.astype(jnp.int32)
        t_at = lambda i: jnp.sum(jnp.where(lane == i, tvec, 0.0))  # noqa: E731
        t_lo = jnp.where(any_hit, t_at(nhi), lo0)
        t_hi = jnp.where(any_hit,
                         jnp.where(nhi >= 1, t_at(nhi - 1), hi0), hi0)
        return t_lo, t_hi

    lvl1 = m * geo
    lo, hi = level(lvl1, jnp.float32(0.0), m)
    lvl2 = hi - (hi - lo) * frac
    cutoff, _ = level(lvl2, lo, hi)
    return cutoff


def _kernel(S, B, K, TGB, nc, G, pos_bits, vpacked, OB, in_dim, P,
            effort, tau, has_scales,
            e_ref,
            v_ref, vs_ref, probes_ref, stats_ref, scales_ref,
            vals_hbm, pos_hbm,
            out_ref, vscr, pscr, uscr, vsem, psem):
    per_byte = 8 // pos_bits
    OBp = pscr.shape[3]
    OB_pad = OBp * per_byte
    OBv = vscr.shape[3] * (2 if vpacked else 1)
    tile_rows = TGB * G

    # ---- cutoff: two-level threshold count (ops.effort.compute_cutoff) ----
    scores = jnp.abs(vs_ref[...] * probes_ref[...])          # [P//128, 128]
    kq = float(min(max(round(P * effort), 1), P))
    m = jnp.max(scores) + 1e-30
    cutoff = _vec_cutoff(scores, kq, m)

    # ---- rank counts + masked inputs (all in the [nc, G] layout the main
    # loop consumes — Mosaic cannot re-tile (in//128,128)->(nc,G)) --------
    absv = jnp.abs(v_ref[...])                               # [nc, G]
    n = jnp.zeros_like(absv, dtype=jnp.int32)
    for k in range(K):
        n += (stats_ref[k] * absv > cutoff).astype(jnp.int32)
    for k in range(K):
        u_k = v_ref[...] * (n > k).astype(jnp.float32)
        if has_scales:
            u_k = u_k * scales_ref[k]
        uscr[k] = u_k

    # ---- prefix lengths (tiles) + cumulative offsets: per-rank
    # selected-mass coverage bound (_prefix_len) ------------------------
    e = e_ref[0]
    cums = [jnp.int32(0)]
    bases = []
    for k in range(K):
        m_k = jnp.where(n > k, stats_ref[k] * absv, 0.0)      # [nc, G]
        C_k = _prefix_len(jnp.sum(m_k, axis=1, keepdims=True), tau)[0]
        lens = (C_k + TGB - 1) // TGB
        cums.append(cums[-1] + lens)
        bases.append((e * K + k) * nc)
    total = cums[K]

    # ---- DMA-ring prefix streaming (prefix_stream._kernel body) ---------
    def tile_rank(t):
        r = jnp.int32(0)
        for k in range(1, K):
            r = r + (t >= cums[k]).astype(jnp.int32)
        return r

    def start_block(t, k):
        base = bases[0]
        for j in range(1, K):
            base = jnp.where(k == j, bases[j], base)
        off = cums[0]
        for j in range(1, K):
            off = jnp.where(k == j, cums[j], off)
        return base + (t - off) * TGB

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
    for s in range(S):
        @pl.when(s < total)
        def _(s=s):
            a, b = dmas(jnp.int32(s), s)
            a.start()
            b.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TGB, G, OB_pad), 2)
    shift = (lane // OBp) * pos_bits
    mask_val = (1 << pos_bits) - 1
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (TGB, G, OBv), 2)
    shift4 = (lane_v // (OBv // 2)) * 4

    def body(t, _):
        slot = jax.lax.rem(t, S)
        a, bdma = dmas(t, slot)
        a.wait()
        bdma.wait()
        k = tile_rank(t)
        off = cums[0]
        for j in range(1, K):
            off = jnp.where(k == j, cums[j], off)
        toff = (t - off) * TGB
        u = uscr[k, pl.ds(toff, TGB), :]                     # [TGB, G]
        if vpacked:
            pv = pltpu.repeat(vscr[slot].astype(jnp.int32), 2, axis=2)
            q4 = ((pv >> shift4) & 15) - 8
            c = q4[:, :, :OB].astype(jnp.float32) * u[:, :, None]
        else:
            c = vscr[slot].astype(jnp.float32) * u[:, :, None]
        packed = pscr[slot].astype(jnp.int32)
        p_pad = (pltpu.repeat(packed, per_byte, axis=2) >> shift) \
            & mask_val
        p = p_pad[:, :, :OB]
        for pp in range(B):
            mk = (p == pp).astype(jnp.float32)
            out_ref[pp, :] += jnp.sum(mk * c, axis=(0, 1))

        @pl.when(t + S < total)
        def _():
            a2, b2 = dmas(t + S, slot)
            a2.start()
            b2.start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.lru_cache(maxsize=None)
def _make_kernel(S, B, K, TGB, nc, G, bits, vpacked, OB, in_dim, P,
                 effort, tau, has_scales):
    return functools.partial(_kernel, S, B, K, TGB, nc, G, bits, vpacked,
                             OB, in_dim, P, effort, tau, has_scales)


def _kernel_mxu(S, TGB, nc, G, vpacked, OB, in_dim, P,
                tau, has_scales,
                e_ref, eq_ref,
                v_ref, vs_ref, probes_ref, stats_ref, scales_ref,
                vals_hbm,
                out_ref, vscr, uscr, vsem):
    """Row-prefix variant (bucket_size=1): selected input rows contribute
    ALL their columns, so the accumulation is a dense dot on the MXU — no
    positions, no scatter, full matmul bandwidth. Quality-per-byte is
    within ~0.3% cos of rank-prefix under heavy-tailed decode activations
    (scripts/oracle_row_vs_rank.py) at ~3x the streaming rate.
    """
    OBv = vscr.shape[3] * (2 if vpacked else 1)
    tile_rows = TGB * G

    scores = jnp.abs(vs_ref[...] * probes_ref[...])
    # effort arrives as 16.16 fixed-point in SMEM (traced: no recompile
    # when the effort knob moves — the reference's runtime-effort
    # contract, main.swift:110-135 REPL)
    eff = eq_ref[0].astype(jnp.float32) * (1.0 / 65536.0)
    kq = jnp.clip(jnp.round(float(P) * eff), 1.0, float(P))
    m = jnp.max(scores) + 1e-30
    cutoff = _vec_cutoff(scores, kq, m)

    sel = stats_ref[0] * jnp.abs(v_ref[...]) > cutoff      # [nc, G]
    u = v_ref[...] * sel.astype(jnp.float32)
    if has_scales:
        u = u * scales_ref[0]
    # replicated over 8 sublanes: per-tile u rows are then aligned [8, G]
    # loads (Mosaic cannot load a single dynamic sublane row)
    uscr[...] = jnp.broadcast_to(u.astype(jnp.bfloat16)[:, None, :],
                                 uscr.shape)

    # coverage-bound stream length (see _prefix_len)
    m = jnp.where(sel, stats_ref[0] * jnp.abs(v_ref[...]), 0.0)
    C = _prefix_len(jnp.sum(m, axis=1, keepdims=True), tau)[0]
    total = (C + TGB - 1) // TGB
    e = e_ref[0]
    base = e * nc

    def dma(t, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(base + t * TGB, TGB)], vscr.at[slot],
            vsem.at[slot])

    out_ref[...] = jnp.zeros_like(out_ref)
    for s in range(S):
        @pl.when(s < total)
        def _(s=s):
            dma(jnp.int32(s), s).start()

    if vpacked:
        # int4 decode in COLUMN BLOCKS: widening a full 28672-wide tile
        # to int32 materializes ~15 MB of temporaries and spills VMEM
        # (measured 200x slowdown); per-block temporaries stay ~1 MB.
        # Packed layout (pack_positions): byte jb holds elements jb
        # (shift 0) and OBp+jb (shift 4), so packed block c decodes to
        # output columns [c*CBp, c*CBp+CBp) and [OBp+c*CBp, ...).
        OBp_ = vscr.shape[3]
        CBp = _col_block(OBp_, G)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * CBp), 1)
        shift_b = (lane_b // CBp) * 4

    def mxu_row(uj, wj):
        # 8 replicated rows through the MXU (it is idle-rich here);
        # row 0 is the result
        return jax.lax.dot_general(
            uj, wj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0:1]

    def body(t, _):
        slot = jax.lax.rem(t, S)
        dma(t, slot).wait()
        for j in range(TGB):
            uj = uscr[t * TGB + j]                          # [8, G] bf16
            if vpacked:
                pj = vscr[slot][j]                          # [G, OBp] u8
                for c in range(OBp_ // CBp):
                    pvb = pltpu.repeat(
                        pj[:, c * CBp:(c + 1) * CBp].astype(jnp.int32),
                        2, axis=1)                          # [G, 2*CBp]
                    wb = (((pvb >> shift_b) & 15) - 8).astype(jnp.bfloat16)
                    d = mxu_row(uj, wb)                     # [1, 2*CBp]
                    lo = c * CBp
                    out_ref[:, lo:lo + CBp] += d[:, :CBp]
                    hi2 = min(CBp, OB - (OBp_ + lo))
                    if hi2 > 0:
                        out_ref[:, OBp_ + lo:OBp_ + lo + hi2] += \
                            d[:, CBp:CBp + hi2]
            else:
                wj = vscr[slot][j]                          # [G, OB]
                if wj.dtype != jnp.bfloat16:
                    wj = wj.astype(jnp.bfloat16)
                out_ref[...] += mxu_row(uj, wj)

        @pl.when(t + S < total)
        def _():
            dma(t + S, slot).start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)


def _col_block(obp: int, g: int) -> int:
    """Packed-column block size: the int32-widened decode block
    [g, 2*CBp] must stay ~<=2 MB or Mosaic spills it to HBM (measured
    200x slowdown at full width)."""
    cap = max(128, (2**21 // (8 * g)) // 128 * 128)
    for cand in (2048, 1024, 512, 256, 128):
        if cand <= cap and obp % cand == 0:
            return cand
    return min(obp, cap)


@functools.lru_cache(maxsize=None)
def _make_kernel_mxu(S, TGB, nc, G, vpacked, OB, in_dim, P,
                     tau, has_scales):
    return functools.partial(_kernel_mxu, S, TGB, nc, G, vpacked, OB,
                             in_dim, P, tau, has_scales)


def _kernel_mxu_batch(S, T, TGB, nc, G, vpacked, OB, in_dim, P,
                      tau, has_scales,
                      e_ref,
                      v_ref, vs_ref, probes_ref, stats_ref, scales_ref,
                      eff_ref, vals_hbm,
                      out_ref, vscr, uscr, vsem):
    """Batched row-prefix variant: T decode slots share the weights; the
    MXU's sublane rows (wasted as replicas in the single-vector kernel)
    carry one slot each. Selection is per-slot with a PER-SLOT TRACED
    effort (no recompile on effort change); the streamed prefix is the
    max over slots, and each slot's u-mask keeps its own exactness.

    Layouts keep the slot axis in the MIDDLE everywhere ([*, T, *]) so no
    in-kernel relayout is needed:
      v_ref     [nc, T, G]     slot-transposed activations
      vs_ref    [P2, T, 128]   probe-sampled activations
      probes_ref[P2, 1, 128]
      stats_ref [nc, 1, G]
      eff_ref   [1, T, 128]    per-slot effort (lane-replicated)
    """
    OBv = vscr.shape[3] * (2 if vpacked else 1)
    tile_rows = TGB * G

    scores = jnp.abs(vs_ref[...] * probes_ref[...])        # [P2, T, 128]
    kq = jnp.clip(jnp.round(
        float(P) * eff_ref[...][:, :, :1]), 1.0, float(P))  # [1, T, 1]
    m = jnp.max(scores, axis=(0, 2), keepdims=True) + 1e-30  # [1, T, 1]

    # per-slot vectorized two-level search: T small unrolled calls of the
    # 2D helper (a single [P2, T, 128, NL] broadcast materializes ~4 MB
    # temporaries per level and blows the 16 MB scoped-VMEM limit next to
    # the DMA ring)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    cutoff = jnp.zeros_like(m)                              # [1, T, 1]
    for t in range(T):
        c_t = _vec_cutoff(scores[:, t, :], kq[0, t, 0], m[0, t, 0])
        cutoff = jnp.where(slot_iota == t, c_t, cutoff)

    sel = stats_ref[...] * jnp.abs(v_ref[...]) > cutoff     # [nc, T, G]
    u = v_ref[...] * sel.astype(jnp.float32)
    if has_scales:
        u = u * scales_ref[...]
    uscr[...] = u.astype(jnp.bfloat16)

    # streamed prefix = max over slots of the coverage bound
    m = jnp.where(sel, stats_ref[...] * jnp.abs(v_ref[...]), 0.0)
    C = jnp.max(_prefix_len(jnp.sum(m, axis=2), tau))       # [T] -> scalar
    total = (C + TGB - 1) // TGB
    e = e_ref[0]
    base = e * nc

    def dma(t, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(base + t * TGB, TGB)], vscr.at[slot],
            vsem.at[slot])

    out_ref[...] = jnp.zeros_like(out_ref)
    for s in range(S):
        @pl.when(s < total)
        def _(s=s):
            dma(jnp.int32(s), s).start()

    if vpacked:
        # column-block int4 decode (see _kernel_mxu: full-width int32
        # widening spills VMEM)
        OBp_ = vscr.shape[3]
        CBp = _col_block(OBp_, G)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * CBp), 1)
        shift_b = (lane_b // CBp) * 4

    def body(t, _):
        slot = jax.lax.rem(t, S)
        dma(t, slot).wait()
        for j in range(TGB):
            uj = uscr[t * TGB + j]                          # [T, G] bf16

            def dot(wj):
                return jax.lax.dot_general(
                    uj, wj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [T, *]
            if vpacked:
                pj = vscr[slot][j]                          # [G, OBp] u8
                for c in range(OBp_ // CBp):
                    pvb = pltpu.repeat(
                        pj[:, c * CBp:(c + 1) * CBp].astype(jnp.int32),
                        2, axis=1)
                    wb = (((pvb >> shift_b) & 15) - 8).astype(jnp.bfloat16)
                    d = dot(wb)                             # [T, 2*CBp]
                    lo = c * CBp
                    out_ref[:, lo:lo + CBp] += d[:, :CBp]
                    hi2 = min(CBp, OB - (OBp_ + lo))
                    if hi2 > 0:
                        out_ref[:, OBp_ + lo:OBp_ + lo + hi2] += \
                            d[:, CBp:CBp + hi2]
            else:
                wj = vscr[slot][j]                          # [G, OB]
                if wj.dtype != jnp.bfloat16:
                    wj = wj.astype(jnp.bfloat16)
                out_ref[...] += dot(wj)

        @pl.when(t + S < total)
        def _():
            dma(t + S, slot).start()
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.lru_cache(maxsize=None)
def _make_kernel_mxu_batch(S, T, TGB, nc, G, vpacked, OB, in_dim, P,
                           tau, has_scales):
    return functools.partial(_kernel_mxu_batch, S, T, TGB, nc, G, vpacked,
                             OB, in_dim, P, tau, has_scales)


def mxu_matvec_batch(bm: BucketedMatrix, V: jax.Array, efforts: jax.Array,
                     expert=0, alpha: float = None, tile_blocks: int = 1,
                     slots: int = 0, interpret: bool = False,
                     tau: float = None) -> jax.Array:
    """Batched one-launch row-prefix effort matmul.

    V: [T, in] activations (T decode slots, padded to a multiple of 8);
    efforts: [T] per-slot TRACED efforts (0 disables a slot).
    Returns [T, out] f32. The serving batcher's decode step uses this for
    effort-at-speed continuous batching — a case the reference never
    faced (SURVEY §7 "Batch > 1").

    alpha is accepted for caller compatibility but IGNORED: the stream
    length is the tau selected-mass coverage bound (_prefix_len).
    """
    tau = _TAU if tau is None else tau
    interpret = interpret or _INTERPRET
    assert bm.bucket_size == 1
    G, OB = bm.chunk_rows, bm.n_buckets
    nc = bm.n_chunks
    T = V.shape[0]
    assert T % 8 == 0, T
    slots = slots or _auto_slots(bm, tile_blocks)
    expert = jnp.asarray(expert, jnp.int32).reshape(1)
    e0 = expert[0]
    Vp = jax.vmap(lambda v: bm.permute_v(v, e0))(V).astype(jnp.float32)
    v3d = Vp.T.reshape(nc, G, T).transpose(0, 2, 1)         # [nc, T, G]
    P = strided_sample_len(bm.in_dim, bm.probes.shape[1])
    vs = jax.vmap(lambda v: strided_sample(v, bm.in_dim,
                                           bm.probes.shape[1]))(Vp)
    vs3d = vs.T.reshape(P // 128, 128, T).transpose(0, 2, 1)  # [P2,T,128]
    probes3d = bm.probes[e0].astype(jnp.float32).reshape(
        P // 128, 1, 128)
    stats3d = bm.stats[e0].T.reshape(nc, 1, G)
    has_scales = bm.scales is not None
    scales3d = (bm.scales[e0].T.reshape(nc, 1, G)
                if has_scales else stats3d)
    eff3d = jnp.broadcast_to(
        jnp.asarray(efforts, jnp.float32)[None, :, None], (1, T, 128))

    kernel = _make_kernel_mxu_batch(slots, T, tile_blocks, nc, G,
                                    bm.vals_packed, OB, bm.in_dim, P,
                                    float(tau), has_scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_blocks, G, bm.vals.shape[-1]),
                       bm.vals.dtype),
            pltpu.VMEM((nc, T, G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, OB), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(bm, tile_blocks, slots)),
    )(expert, v3d, vs3d, probes3d, stats3d, scales3d, eff3d, bm.vals)
    return acc


def supports_fused(bm: BucketedMatrix) -> bool:
    sample = strided_sample_len(bm.in_dim, bm.probes.shape[1])
    return (bm.in_dim % 128 == 0 and sample % 128 == 0
            and bm.vals.shape[-1] % 128 == 0
            and bm.pos.shape[-1] % 128 == 0)


def strided_sample_len(in_dim: int, n_probes: int) -> int:
    stride = max(1, -(-in_dim // n_probes))
    return in_dim // stride


def _tile_bytes(bm: BucketedMatrix, tile_blocks: int) -> int:
    return (tile_blocks * bm.chunk_rows * bm.vals.shape[-1]
            * bm.vals.dtype.itemsize)


def _auto_slots(bm: BucketedMatrix, tile_blocks: int) -> int:
    """DMA-ring depth from the VMEM budget (depth beyond 3 measured no
    gain on w1-class tiles once timing noise was controlled; fused-w13
    7.3 MB tiles keep 3 thanks to the raised vmem_limit_bytes)."""
    return max(2, min(3, int(24 * 2**20) // max(_tile_bytes(
        bm, tile_blocks), 1)))


def _vmem_limit(bm: BucketedMatrix, tile_blocks: int, slots: int) -> int:
    """Scoped-VMEM budget for the pallas call: the DMA ring plus the
    decode-path value temporaries plus headroom for u/out/inputs. The
    Mosaic default (16 MB) starves fused wide matrices (w1|w3 = 28672
    cols); v5e VMEM is far larger.

    Decode temporaries scale with dtype: bf16 tiles are read once for
    the MXU dot (one tile-sized copy); int8 adds a bf16 cast (2x); the
    packed-int4 path decodes in ~1 MB column blocks (_col_block)."""
    tile = _tile_bytes(bm, tile_blocks)
    factor = {2: 1, 1: 2}.get(bm.vals.dtype.itemsize, 2)
    if bm.vals_packed:
        factor = 3
    ring = slots * tile + factor * (tile // tile_blocks + 1)
    return min(int(100 * 2**20), ring + 8 * 2**20)


def mxu_matvec(bm: BucketedMatrix, v: jax.Array, effort,
               expert=0, alpha: float = None, tile_blocks: int = 1,
               slots: int = 0, interpret: bool = False,
               tau: float = None) -> jax.Array:
    """One-launch row-prefix effort matvec (bucket_size=1 layout).

    effort may be a python float OR a traced scalar — it rides into the
    kernel as a 16.16 fixed-point SMEM scalar, so moving the effort knob
    never recompiles. slots=0 sizes the DMA ring from the VMEM budget.
    interpret=True runs the kernel under the pallas TPU interpreter
    (CPU CI parity tests for the production path).

    alpha is accepted for caller compatibility but IGNORED (see
    _prefix_len); tau sets the selected-mass coverage (tau=1.0 streams
    through the last selected chunk — exact bucketMul semantics)."""
    tau = _TAU if tau is None else tau
    interpret = interpret or _INTERPRET
    assert bm.bucket_size == 1
    G, OB = bm.chunk_rows, bm.n_buckets
    nc = bm.n_chunks
    assert nc % tile_blocks == 0, (nc, tile_blocks)
    slots = slots or _auto_slots(bm, tile_blocks)
    expert = jnp.asarray(expert, jnp.int32).reshape(1)
    e0 = expert[0]
    vp = bm.permute_v(v, e0).astype(jnp.float32)
    vs = strided_sample(vp, bm.in_dim, bm.probes.shape[1])
    P = vs.shape[0]
    v2 = vp.reshape(nc, G)
    vs2 = vs.reshape(P // 128, 128)
    probes2 = bm.probes[e0].astype(jnp.float32).reshape(P // 128, 128)
    stats_t = bm.stats[e0].T.reshape(1, nc, G)
    has_scales = bm.scales is not None
    scales_t = (bm.scales[e0].T.reshape(1, nc, G)
                if has_scales else stats_t)

    eff_q = jnp.round(jnp.asarray(effort, jnp.float32) * 65536.0) \
        .astype(jnp.int32).reshape(1)
    kernel = _make_kernel_mxu(slots, tile_blocks, nc, G, bm.vals_packed,
                              OB, bm.in_dim, P,
                              float(tau), has_scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # v2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # vs2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # probes2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # stats_t
            pl.BlockSpec(memory_space=pltpu.VMEM),     # scales_t
            pl.BlockSpec(memory_space=pl.ANY),      # vals
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_blocks, G, bm.vals.shape[-1]),
                       bm.vals.dtype),
            pltpu.VMEM((nc, 8, G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, OB), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(bm, tile_blocks, slots)),
    )(expert, eff_q, v2, vs2, probes2, stats_t, scales_t, bm.vals)
    return acc.reshape(OB)


def fused_matvec(bm: BucketedMatrix, v: jax.Array, effort: float,
                 expert=0, alpha: float = None, tile_blocks: int = 8,
                 slots: int = 3, interpret: bool = False,
                 tau: float = None) -> jax.Array:
    """One-launch effort matvec (selection + streaming fused).

    alpha is accepted for caller compatibility but IGNORED (see
    _prefix_len); tau sets the selected-mass coverage bound."""
    tau = _TAU if tau is None else tau
    interpret = interpret or _INTERPRET
    if bm.bucket_size == 1:
        return mxu_matvec(bm, v, effort, expert,
                          tile_blocks=1, slots=slots, interpret=interpret,
                          tau=tau)
    B, K, G, OB = (bm.bucket_size, bm.n_ranks, bm.chunk_rows, bm.n_buckets)
    nc = bm.n_chunks
    assert nc % tile_blocks == 0, (nc, tile_blocks)
    expert = jnp.asarray(expert, jnp.int32).reshape(1)
    e0 = expert[0]
    vp = bm.permute_v(v, e0).astype(jnp.float32)
    vs = strided_sample(vp, bm.in_dim, bm.probes.shape[1])
    P = vs.shape[0]
    v2 = vp.reshape(nc, G)
    vs2 = vs.reshape(P // 128, 128)
    probes2 = bm.probes[e0].astype(jnp.float32).reshape(P // 128, 128)
    # loop-invariant under jit+scan: XLA hoists these transposes
    stats_t = bm.stats[e0].T.reshape(K, nc, G)
    has_scales = bm.scales is not None
    scales_t = (bm.scales[e0].T.reshape(K, nc, G)
                if has_scales else stats_t)

    kernel = _make_kernel(slots, B, K, tile_blocks, nc, G, bm.pos_bits,
                          bm.vals_packed, OB, bm.in_dim, P,
                          float(effort), float(tau), has_scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # v2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # vs2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # probes2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # stats_t
            pl.BlockSpec(memory_space=pltpu.VMEM),     # scales_t
            pl.BlockSpec(memory_space=pl.ANY),      # vals
            pl.BlockSpec(memory_space=pl.ANY),      # pos
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, tile_blocks, G, bm.vals.shape[-1]),
                       bm.vals.dtype),
            pltpu.VMEM((slots, tile_blocks, G, bm.pos.shape[-1]),
                       jnp.uint8),
            pltpu.VMEM((K, nc, G), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OB), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(bm, tile_blocks, slots)),
    )(expert, v2, vs2, probes2, stats_t, scales_t, bm.vals, bm.pos)
    return acc.T.reshape(OB * B)
