"""Offline bucketization: dense weights -> BucketedMatrix (JAX, jittable).

TPU-native re-design of the reference's GPU conversion pipeline
(convert.swift:209-331: getProbes -> prepareValsIdxs -> per-row bitonic
sortAbs -> preBucketize -> bucketize -> makeStats). Here the whole thing is a
single vectorized argsort + take_along_axis + transposes under jit — no
bitonic sort kernels, no position bits stolen from the fp16 mantissa.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from effort_tpu.config import BucketConfig
from effort_tpu.ops.layouts import (BucketedMatrix, pack_positions,
                                    probe_sample_indices)


@partial(jax.jit, static_argnames=("bucket_size",))
def _sort_buckets(wt: jax.Array, bucket_size: int):
    """wt [in,out] -> (vals, pos, stats) with vals/pos [in, B, out/B]."""
    in_dim, out_dim = wt.shape
    B = bucket_size
    nb = out_dim // B
    w = wt.reshape(in_dim, nb, B).astype(jnp.float32)
    order = jnp.argsort(-jnp.abs(w), axis=-1, stable=True)  # [in, nb, B]
    sorted_vals = jnp.take_along_axis(w, order, axis=-1)
    vals = jnp.transpose(sorted_vals, (0, 2, 1))  # [in, B(rank), nb]
    pos = jnp.transpose(order, (0, 2, 1)).astype(jnp.int8)
    stats = jnp.mean(jnp.abs(vals), axis=2)  # [in, B]
    return vals, pos, stats


def _to_blocks(x: jax.Array, n_chunks: int, G: int, K: int) -> jax.Array:
    """[E, in, K, nb] -> [E*NB, G, nb], RANK-MAJOR block ids:
    id = (e*K + k) * n_chunks + g. Rank-major keeps same-rank blocks
    contiguous (dense DMA runs for low ranks) and makes ascending-id
    compaction drop deepest ranks first on capacity overflow — the same
    global importance ordering the reference's rank-major bucket rows have
    (loader.swift percentLoad truncation relies on it too)."""
    E, in_dim, k_dim, nb = x.shape
    assert k_dim == K
    x = x.reshape(E, n_chunks, G, K, nb)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))  # [E, K, nchunks, G, nb]
    return x.reshape(E * n_chunks * K, G, nb)


def calib_row_order(act_rms) -> jax.Array:
    """Descending-|activation| input-row order for baked permutation."""
    return jnp.argsort(-jnp.asarray(act_rms, jnp.float32)).astype(jnp.int32)


def pick_chunk_rows(cfg: BucketConfig, in_dim: int, out_dim: int) -> int:
    """Per-matrix chunk size. For the row-prefix MXU layout
    (bucket_size=1) chunk_rows only sets the DMA tile; target ~3 MB so
    narrow matrices aren't per-tile bound."""
    if cfg.bucket_size != 1:
        return cfg.chunk_rows
    item = {"bf16": 2, "int8": 1, "int4": 0.5}[cfg.dtype]
    G = cfg.chunk_rows
    for cand in (1024, 512, 256, 128):
        # >=4 chunks so the stream prefix has granularity to truncate
        if (in_dim % cand == 0 and cand * 4 <= in_dim
                and cand * out_dim * item <= 3 * 2**20):
            return max(G, cand)
    return G


def bucketize(wt, cfg: BucketConfig, keep_dense: bool = False,
              act_rms=None, perm_segment: int = 0,
              in_perm=None, out_perm=None) -> BucketedMatrix:
    """Convert dense transposed weights to the bucketized format.

    wt: [in_dim, out_dim] or [E, in_dim, out_dim] (multi-expert, the packed
    layout of loader.swift:124 buckets[numExperts, ...]).
    act_rms: optional [in_dim] typical activation magnitude per input dim
    (calibration). When given, input dims are permuted so similar-|v| dims
    share a chunk, which collapses the chunk-level read amplification of
    the gather kernel (LLM activation outlier dims are persistent). The
    permutation is applied to v AT RUNTIME (seg_order in the container).

    in_perm: optional [in_dim] (or [E, in_dim]) int32 — BAKED input-row
    permutation: rows are physically reordered and NO runtime permute
    happens (seg_order stays None). Used by the whole-model relayout pass
    (models.transformer.init_random_weights / convert) where the
    surrounding weights absorb the permutation, making the runtime gather
    (measured ~25us/call through XLA) free. Mutually exclusive with
    act_rms.
    out_perm: optional [out_dim] (or [E, out_dim]) int32 — output-column
    permutation applied before bucketing (the producer of this matrix's
    input space was itself permuted).
    """
    wt = jnp.asarray(wt)
    if wt.ndim == 2:
        wt = wt[None]
    E, in_dim, out_dim = wt.shape

    if out_perm is not None:
        op = jnp.asarray(out_perm, jnp.int32)
        if op.ndim == 1:
            wt = wt[:, :, op]
        else:
            wt = jnp.stack([wt[e][:, op[e]] for e in range(E)])
    if in_perm is not None:
        assert act_rms is None, "in_perm (baked) excludes act_rms (runtime)"
        ip = jnp.asarray(in_perm, jnp.int32)
        if ip.ndim == 1:
            wt = wt[:, ip, :]
        else:
            wt = jnp.stack([wt[e][ip[e]] for e in range(E)])

    seg_order = None
    if act_rms is not None:
        # segment-granular permutation: contiguous segments keep the
        # runtime permute a fast row-gather (see layouts.permute_v)
        seg = perm_segment or max(1, cfg.chunk_rows // 4)
        assert in_dim % seg == 0
        keys = jnp.mean(jnp.asarray(act_rms, jnp.float32)
                        .reshape(-1, seg), axis=1)
        sorder = jnp.argsort(-keys).astype(jnp.int32)
        row_order = (sorder[:, None] * seg
                     + jnp.arange(seg)).reshape(-1)
        wt = wt[:, row_order, :]
        seg_order = jnp.tile(sorder[None], (E, 1))
    else:
        seg = perm_segment or 1
    B, G = cfg.bucket_size, cfg.chunk_rows
    assert out_dim % B == 0, (out_dim, B)
    assert in_dim % G == 0, (in_dim, G)
    K = cfg.ranks_loaded
    n_chunks = in_dim // G
    nb = out_dim // B

    outlier_vals = outlier_idx = None
    wt_full = wt
    if cfg.dtype == "int4" and cfg.outlier_frac > 0:
        # OPTIONAL: extract top-|w| outliers and ZERO them in the source
        # before bucketing (q4_draft.py:70-108); added back exactly in
        # fp32 at multiply time (calcOutliers, bucketMulQ4.metal:13-21).
        # Default OFF: clipped scales below match the quality without the
        # table's multi-ms scatter (see BucketConfig.outlier_frac).
        # wt_full keeps the pre-extraction matrix: the dense copy (the
        # reference's "core") and the probes must include the outliers.
        wt, outlier_vals, outlier_idx = _extract_outliers(wt, cfg.outlier_frac)

    vals_l, pos_l, stats_l = [], [], []
    for e in range(E):  # loop keeps peak memory at one expert's intermediates
        va, po, st = _sort_buckets(wt[e], B)
        vals_l.append(va[:, :K])  # truncated loading: keep leading ranks only
        pos_l.append(po[:, :K])
        stats_l.append(st[:, :K])
    vals = jnp.stack(vals_l)    # [E, in, K, nb] f32
    pos = jnp.stack(pos_l)      # [E, in, K, nb] int8
    stats = jnp.stack(stats_l)  # [E, in, K] f32

    scales = None
    if cfg.dtype == "bf16":
        qvals = vals.astype(jnp.bfloat16)
    elif cfg.dtype == "int8":
        # Per-bucket-row symmetric scale: finer than the reference's Q8
        # per-slice ranges (convert.swift:291-313) — TPU int8->f32 converts
        # are cheap so we spend the scale granularity on quality.
        scales = jnp.maximum(jnp.max(jnp.abs(vals), axis=3), 1e-30) / 127.0
        qvals = jnp.clip(jnp.round(vals / scales[..., None]), -127, 127
                         ).astype(jnp.int8)
    elif cfg.dtype == "int4":
        # Per-bucket-row symmetric 4-bit with quantile-CLIPPED scales
        # (s = clip_quantile(|w|)/7; the top tail saturates to +-7s) —
        # smaller error for the bulk beats exactness of the extremes at
        # 4 bits. Packed two-per-byte below (nibble = q + 8, same
        # split-halves byte layout as the position packing so kernels
        # share the unpack pattern).
        absv = jnp.abs(vals)
        scales = jnp.quantile(absv, cfg.clip_quantile, axis=3) / 7.0
        scales = jnp.maximum(scales, 1e-30)
        qvals = jnp.clip(jnp.round(vals / scales[..., None]), -7, 7
                         ).astype(jnp.int8)
    else:
        raise ValueError(cfg.dtype)

    def _pad_for_packing(blocks, elems_per_128_bytes):
        """Pad the OB axis so the PACKED byte width is a multiple of 128
        (Mosaic DMA lane alignment: unaligned trailing dims cannot be
        memref-sliced on TPU). Kernels/readers slice back to n_buckets."""
        w = blocks.shape[-1]
        pad = (-w) % elems_per_128_bytes
        if pad:
            blocks = jnp.concatenate(
                [blocks, jnp.zeros(blocks.shape[:-1] + (pad,),
                                   blocks.dtype)], axis=-1)
        return blocks

    vblocks = _to_blocks(qvals, n_chunks, G, K)
    if cfg.dtype == "int4":
        vblocks = pack_positions(
            _pad_for_packing(vblocks, 256) + jnp.int8(8), 16)
    if B == 1:
        # row-prefix (MXU) layout: positions are identically zero — store
        # a minimal dummy (kernels never read it; pos_unpacked synthesizes)
        pblocks = jnp.zeros((E * n_chunks * K, 1, 128), jnp.uint8)
    else:
        pos_per128 = 128 * (8 // {2: 1, 4: 2, 8: 3, 16: 4, 32: 5}[B])
        pblocks = pack_positions(
            _pad_for_packing(_to_blocks(pos, n_chunks, G, K), pos_per128),
            B)
    # Append one all-zero block: the DMA target for padding slots in the
    # compacted dispatch list (replaces the reference's zeroRange32 padding
    # patch, bucketMul.swift:57-63).
    vblocks = jnp.concatenate([vblocks, jnp.zeros_like(vblocks[:1])])
    pblocks = jnp.concatenate([pblocks, jnp.zeros_like(pblocks[:1])])

    pidx = probe_sample_indices(in_dim, out_dim, cfg.probes)
    probes = wt_full[:, pidx[:, 0], pidx[:, 1]].astype(jnp.float32)  # [E, P]

    return BucketedMatrix(
        vals=vblocks,
        pos=pblocks,
        stats=stats,
        probes=probes,
        probe_dims=jnp.asarray(pidx[:, 0]),
        scales=scales,
        outlier_vals=outlier_vals,
        outlier_idx=outlier_idx,
        dense=wt_full.astype(jnp.bfloat16) if keep_dense else None,
        seg_order=seg_order,
        in_dim=in_dim,
        out_dim=out_dim,
        bucket_size=B,
        chunk_rows=G,
        n_ranks=K,
        n_experts=E,
        dtype_name=cfg.dtype,
        perm_segment=seg,
        rows_sorted=(in_perm is not None or act_rms is not None),
    )


def _extract_outliers(wt, outlier_frac: float):
    """Pull the top-|w| fraction out for exact fp32 handling; zero in wt.

    The table is stored sorted by OUTPUT column so the runtime
    scatter-add can pass indices_are_sorted (a fraction of the cost of
    an unsorted scatter on TPU)."""
    E, in_dim, out_dim = wt.shape
    n_out = max(1, int(in_dim * out_dim * outlier_frac))
    wt_clean, ov_l, oi_l = [], [], []
    for e in range(E):
        flat = wt[e].reshape(-1).astype(jnp.float32)
        _, top = jax.lax.top_k(jnp.abs(flat), n_out)
        top = jnp.sort(top)          # flat index order == output-col major
        rows, cols = top // out_dim, top % out_dim
        order = jnp.argsort(cols, stable=True)
        ov_l.append(flat[top][order])
        oi_l.append(jnp.stack([rows[order], cols[order]],
                              axis=1).astype(jnp.int32))
        wt_clean.append(flat.at[top].set(0.0).reshape(in_dim, out_dim))
    return jnp.stack(wt_clean), jnp.stack(ov_l), jnp.stack(oi_l)


def bucketize_numpy(wt: np.ndarray, cfg: BucketConfig, **kw) -> BucketedMatrix:
    """Convenience wrapper for tests/conversion from numpy arrays."""
    return bucketize(jnp.asarray(wt), cfg, **kw)
