"""Bucketized weight container (TPU-native layout).

Semantics follow the reference conversion pipeline (convert.swift:209-331,
convert.metal:43-119, q4_draft.py): each weight matrix is stored transposed
(rows = input dims); every row is split into buckets of B consecutive output
columns; each bucket's elements are sorted by |w| descending, so "rank k"
collects the k-th largest element of every bucket. The runtime effort knob
selects, per input row i, a rank prefix n_i (because the selection rule
stats[i,k]*|v_i| > cutoff is monotone in k — stats decrease with rank).

TPU-native layout choices (deliberately NOT the Metal layout):
  - values are stored in full bf16 (or int8/int4 + scales) with positions in a
    SEPARATE array, instead of stealing the 4 low mantissa bits of fp16
    (preBucketize, convert.metal:64-70) — bf16 has only 8 mantissa bits, and
    separate positions keep full precision while enabling packed int storage.
  - values are grouped into DMA-able blocks of shape [G, out/B]: block
    (chunk g, rank k) holds rank-k bucket rows of input rows g*G..g*G+G-1.
    The gather kernel fetches only the blocks the effort selection needs —
    the TPU equivalent of the reference's atomic dispatch list
    (prepareDispatch, bucketMul.metal:47-79), but deterministic and built
    from dense VPU ops + top_k compaction instead of atomics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vals", "pos", "stats", "probes", "probe_dims", "scales",
        "outlier_vals", "outlier_idx", "dense", "seg_order",
    ],
    meta_fields=["in_dim", "out_dim", "bucket_size", "chunk_rows",
                 "n_ranks", "n_experts", "dtype_name", "perm_segment",
                 "rows_sorted"],
)
@dataclasses.dataclass
class BucketedMatrix:
    """One bucketized weight matrix (possibly multi-expert).

    Shapes (E = n_experts, K = n_ranks kept after truncated loading,
    NB = (in_dim // G) * K blocks per expert, OB = out_dim // B):

      vals:   [E*NB + 1, G, OB]  bf16|int8|packed-int4; final block is zeros
              (DMA target for padding slots of the compacted block list).
      pos:    [E*NB + 1, G, OB*log2(B)//8] uint8 — within-bucket original
              positions, bit-PACKED in the strided layout of
              pack_positions() (log2(B) bits per element).
      stats:  [E, in_dim, K]     f32  — mean |w| per bucket row
              (makeStats, convert.metal:105-119).
      probes: [E, P]             f32  — sampled weights for the cutoff
              quantile (getProbes, convert.metal:14-22).
      probe_dims: [P] int32      — input dim sampled by each probe.
      scales: [E, in_dim, K] f32 or None — int8/int4 dequant scales.
      outlier_*: int4 only — exact fp32 corrections for the largest weights
              (calcOutliers, bucketMulQ4.metal:13-21; q4_draft.py:70-108).
      dense:  optional [E, in_dim, out_dim] bf16 — dense copy ("core" in
              loader.swift:46-166) for the effort=1.0 fast path and testing.
      seg_order: optional [E, in_dim // perm_segment] int32 — activation-
              calibrated input permutation at SEGMENT granularity (rows of
              wt reordered in contiguous segments so dims with similar
              typical |v| cluster into the same chunk; collapses
              chunk-level read amplification). Segment granularity keeps
              the runtime permute a fast contiguous row-gather
              (v.reshape(-1, seg)[seg_order]) instead of a slow 1D
              element gather.
    """

    vals: jax.Array
    pos: jax.Array
    stats: jax.Array
    probes: jax.Array
    probe_dims: jax.Array
    scales: Optional[jax.Array]
    outlier_vals: Optional[jax.Array]
    outlier_idx: Optional[jax.Array]
    dense: Optional[jax.Array]
    seg_order: Optional[jax.Array]
    in_dim: int
    out_dim: int
    bucket_size: int
    chunk_rows: int
    n_ranks: int
    n_experts: int
    dtype_name: str
    perm_segment: int = 1
    # input rows are in calibrated importance order (in_perm/act_rms was
    # applied at bucketize time). Required for row-prefix (bucket_size 1)
    # truncated loading: dropping trailing rows of an UNSORTED matrix
    # (e.g. wo, whose input is the head-structured attention output)
    # amputates arbitrary structure instead of least-important rows.
    rows_sorted: bool = False

    @property
    def n_buckets(self) -> int:
        return self.out_dim // self.bucket_size

    @property
    def n_chunks(self) -> int:
        return self.in_dim // self.chunk_rows

    @property
    def blocks_per_expert(self) -> int:
        return self.n_chunks * self.n_ranks

    @property
    def zero_block_id(self) -> int:
        return self.n_experts * self.blocks_per_expert

    def permute_v(self, v: jax.Array, expert) -> jax.Array:
        """Apply the calibrated input permutation (fast row-gather).

        Under truncated loading of a BAKED (importance-sorted) layout,
        in_dim < len(v): the dropped tail is the least-important rows, so
        the matvec simply ignores them (the reference's percentLoad
        semantics, loader.swift:50,70,124)."""
        if self.seg_order is None:
            return v[:self.in_dim] if v.shape[0] > self.in_dim else v
        seg = self.perm_segment
        return v.reshape(-1, seg)[self.seg_order[expert]].reshape(-1)

    def dim_order_full(self, expert=0) -> Optional[jax.Array]:
        """Full row permutation derived from seg_order (oracle paths)."""
        if self.seg_order is None:
            return None
        seg = self.perm_segment
        base = self.seg_order[expert][:, None] * seg + jnp.arange(seg)
        return base.reshape(-1).astype(jnp.int32)

    @property
    def pos_bits(self) -> int:
        # bucket_size 1 = row-prefix (MXU) layout: buckets are single
        # elements, positions are identically zero and never stored
        return {1: 0, 2: 1, 4: 2, 8: 3, 16: 4, 32: 5}[self.bucket_size]

    def pos_unpacked(self) -> jax.Array:
        """Unpack self.pos to int8 [E*NB+1, G, OB] (alignment padding
        added at pack time is sliced off)."""
        if self.bucket_size == 1:
            nblk = self.n_experts * self.blocks_per_expert + 1
            return jnp.zeros((nblk, self.chunk_rows, self.n_buckets),
                             jnp.int8)
        return unpack_positions(self.pos,
                                self.bucket_size)[..., :self.n_buckets]

    @property
    def vals_packed(self) -> bool:
        """int4 values stored two-per-byte (uint8 nibbles of q+8)."""
        return self.vals.dtype == jnp.uint8

    def vals_unpacked(self) -> jax.Array:
        """Bucket values with int4 nibble-packing undone (int8 [-7, 7]);
        identity for bf16/int8 storage."""
        if not self.vals_packed:
            return self.vals
        return (unpack_positions(self.vals, 16)
                - jnp.int8(8))[..., :self.n_buckets]

    def reconstruct_dense(self, expert: int = 0,
                          permuted_space: bool = False) -> jax.Array:
        """Scatter vals back to a dense [in_dim, out_dim] f32 matrix.

        Inverse of bucketization (up to dropped ranks under truncated
        loading). Used for the effort=1.0 dense path and for tests.

        permuted_space=True keeps the rows in the bucket layout's
        (calibration-permuted) order — the space the `dense` field uses
        (bucket_matvec's dense path permutes v before the matmul), so
        the result can be attached as a dense copy (see
        weights.attach_dense).
        """
        E, K, G, B = self.n_experts, self.n_ranks, self.chunk_rows, self.bucket_size
        nb = self.n_buckets
        vals = self.vals_unpacked()[:-1].reshape(
            E, K, self.n_chunks, G, nb)[expert]
        pos_all = self.pos_unpacked()
        pos = pos_all[:-1].reshape(E, K, self.n_chunks, G, nb)[expert]
        vals = jnp.transpose(vals, (1, 2, 0, 3)).reshape(self.in_dim, K, nb)
        pos = jnp.transpose(pos, (1, 2, 0, 3)).reshape(self.in_dim, K, nb)
        vals = _dequant(vals, self.scales[expert] if self.scales is not None else None)
        # out[i, j*B + pos[i,k,j]] += vals[i,k,j]
        one_hot = jax.nn.one_hot(pos.astype(jnp.int32), B, dtype=vals.dtype)
        dense = jnp.einsum("ikj,ikjp->ijp", vals, one_hot)
        dense = dense.reshape(self.in_dim, self.out_dim)
        if self.outlier_vals is not None:
            flat = dense.reshape(-1)
            oidx = self.outlier_idx[expert]
            oval = self.outlier_vals[expert]
            flat = flat.at[oidx[:, 0] * self.out_dim + oidx[:, 1]].add(oval)
            dense = flat.reshape(self.in_dim, self.out_dim)
        if not permuted_space:
            order = self.dim_order_full(expert)
            if order is not None:
                # rows were permuted at convert time; invert to original
                dense = dense[jnp.argsort(order)]
        return dense

    def memory_bytes(self) -> int:
        total = 0
        for a in (self.vals, self.pos, self.stats, self.probes, self.scales,
                  self.outlier_vals, self.outlier_idx, self.seg_order):
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total


def concat_bucketed(bms: list) -> BucketedMatrix:
    """Concatenate BucketedMatrix parts along the instance (expert) axis.

    Used by chunked conversion/init: full-precision source tensors for a
    32-layer model do not fit HBM at once, so matrices are bucketized a
    few instances at a time and merged here. All parts must share dims
    and config; the trailing all-zero block is deduplicated.
    """
    a = bms[0]
    if len(bms) == 1:
        return a

    def cat(field, strip_zero=False):
        xs = [getattr(b, field) for b in bms]
        if any(x is None for x in xs):
            assert all(x is None for x in xs), field
            return None
        if strip_zero:
            xs = [x[:-1] for x in xs] + [xs[0][-1:]]
        return jnp.concatenate(xs, axis=0)

    return dataclasses.replace(
        a,
        vals=cat("vals", strip_zero=True),
        pos=cat("pos", strip_zero=True),
        stats=cat("stats"),
        probes=cat("probes"),
        scales=cat("scales"),
        outlier_vals=cat("outlier_vals"),
        outlier_idx=cat("outlier_idx"),
        dense=cat("dense"),
        seg_order=cat("seg_order"),
        n_experts=sum(b.n_experts for b in bms),
    )


def _dequant(vals: jax.Array, scales: Optional[jax.Array]) -> jax.Array:
    """Dequantize bucket values to f32. vals [in,K,nb]; scales [in,K]."""
    if vals.dtype == jnp.bfloat16 or vals.dtype == jnp.float32:
        return vals.astype(jnp.float32)
    assert scales is not None
    return vals.astype(jnp.float32) * scales[..., None]


def probe_sample_indices(in_dim: int, out_dim: int, n_probes: int) -> np.ndarray:
    """Deterministic (input-dim, column) sample used for probes.

    Reference samples the matrix diagonal (getProbes, convert.metal:14-22;
    q4_draft.py:240-241), hard-coded to 4096 probes. We sample UNIFORMLY
    STRIDED input dims (covers the whole range even when in_dim > n_probes,
    which the reference's fixed-4096 scheme does not for w2's 14336 input
    dims) — and a uniform stride lets the runtime fetch v[probe_dims] with
    a fast strided slice instead of a gather.
    """
    stride = max(1, -(-in_dim // n_probes))
    n = in_dim // stride
    dims = np.arange(n, dtype=np.int64) * stride
    cols = dims % out_dim
    return np.stack([dims, cols], axis=1).astype(np.int32)


def strided_sample(v: jax.Array, in_dim: int, n_probes: int) -> jax.Array:
    """v[probe_dims] as a strided slice (matches probe_sample_indices)."""
    stride = max(1, -(-in_dim // n_probes))
    n = in_dim // stride
    return jax.lax.slice(v, (0,), (n * stride,), (stride,))


def pack_positions(pos: jax.Array, bucket_size: int) -> jax.Array:
    """[..., OB] int8 positions -> packed uint8 [..., OB*bits//8].

    STRIDED packing matched to pltpu.repeat's tile semantics (the unpack in
    the DMA kernel is one tile-copy + piecewise-constant shift + mask):
    byte jb holds elements {jb, jb+OBp, jb+2*OBp, ...} (OBp = OB*bits//8),
    element t*OBp+jb at bit shift t*bits.
    """
    bits = {2: 1, 4: 2, 8: 3, 16: 4, 32: 5}[bucket_size]
    per_byte = 8 // bits
    ob = pos.shape[-1]
    assert ob % per_byte == 0, (ob, per_byte)
    lead = pos.shape[:-1]
    p = pos.astype(jnp.uint8).reshape(lead + (per_byte, ob // per_byte))
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * bits)[:, None]
    return jnp.sum(p << shifts, axis=-2, dtype=jnp.uint8)


def unpack_positions(packed: jax.Array, bucket_size: int) -> jax.Array:
    """Inverse of pack_positions: [..., OBp] uint8 -> [..., OB] int8."""
    bits = {2: 1, 4: 2, 8: 3, 16: 4, 32: 5}[bucket_size]
    per_byte = 8 // bits
    lead = packed.shape[:-1]
    obp = packed.shape[-1]
    shifts = (jnp.arange(per_byte, dtype=jnp.uint8) * bits)[:, None]
    parts = (packed[..., None, :] >> shifts) & ((1 << bits) - 1)
    return parts.reshape(lead + (obp * per_byte,)).astype(jnp.int8)
