"""bucketMul: effort-truncated vector-matrix multiply (public API + jnp impl).

Three execution paths, selected by `impl`:
  - "dense":  effort >= 1 fast path — plain bf16 matvec on the MXU.
  - "jnp":    vectorized XLA implementation of the exact bucketMul semantics
              (used on CPU, in tests, and as the quality oracle at scale).
  - "pallas": the production TPU kernel (kernels/gather_mul.py) — gathers
              only the selected (chunk, rank) weight blocks from HBM.

API mirrors the role of expertMul (expertMul.swift:24-38) + BucketMul.fullMul
(bucketMul.swift:54-88): one call = one effort-truncated matvec, with an
optional packed-expert index.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from effort_tpu.ops.layouts import BucketedMatrix
from effort_tpu.ops.effort import (compute_cutoff, row_rank_counts,
                                   select_blocks)

# Streamed-prefix over-read factor (rows = ceil(selected_count * alpha)).
# Overridable for diagnosis sweeps (scripts/diag_cliff.py); the coverage
# bound in the kernels makes quality insensitive to it on calibrated
# checkpoints.
DEFAULT_ALPHA = float(os.environ.get("EFFORT_TPU_ALPHA", "1.4"))


def dense_matvec(v: jax.Array, wt: jax.Array) -> jax.Array:
    """v [in] @ wt [in, out] -> f32 [out] (bf16 weights, f32 accumulate)."""
    return jnp.dot(v.astype(jnp.bfloat16), wt,
                   preferred_element_type=jnp.float32)


def _dequant_u(bm: BucketedMatrix, u: jax.Array, expert) -> jax.Array:
    if bm.scales is not None:
        u = u * bm.scales[expert].T
    return u


def bucket_matvec_jnp(bm: BucketedMatrix, v: jax.Array, effort,
                      expert=0, exact_cutoff: bool = True) -> jax.Array:
    """Exact bucketMul semantics as dense XLA ops (reads all weights; used
    for correctness/quality, not speed)."""
    K, G, B = bm.n_ranks, bm.chunk_rows, bm.bucket_size
    nb = bm.n_buckets
    expert = jnp.asarray(expert, jnp.int32)
    v = bm.permute_v(v, expert)
    from effort_tpu.ops.effort import compute_cutoff_exact
    from effort_tpu.ops.layouts import strided_sample
    cf = compute_cutoff_exact if exact_cutoff else compute_cutoff
    cutoff = cf(strided_sample(v, bm.in_dim, bm.probes.shape[1]),
                bm.probes[expert], effort)
    n = row_rank_counts(v, bm.stats[expert], cutoff)        # [in]
    ranks = jnp.arange(K, dtype=jnp.int32)
    u = v[None, :] * (ranks[:, None] < n[None, :])          # [K, in]
    u = _dequant_u(bm, u, expert)

    # blocks [E*NB+1, G, nb] -> per-rank views [K][in, nb] (rank-major)
    vals = bm.vals_unpacked()[:-1].reshape(bm.n_experts, K, bm.n_chunks,
                                           G, nb)
    pos = bm.pos_unpacked()[:-1].reshape(bm.n_experts, K, bm.n_chunks, G,
                                         nb)
    vals = vals[expert]
    pos = pos[expert]

    if B == 1:
        # row-prefix layout: buckets are single elements, positions are
        # identically zero — the semantics collapse to one dense matmul
        # u_0 @ W (the one-hot scatter below materializes [in, nb]
        # temporaries per rank; ~30x slower CPU eval for nothing)
        vk = vals[0].reshape(bm.in_dim, nb).astype(jnp.float32)
        y = jnp.dot(u[0], vk, preferred_element_type=jnp.float32)
        if bm.outlier_vals is not None:
            ov = bm.outlier_vals[expert]
            oi = bm.outlier_idx[expert]
            y = y.at[oi[:, 1]].add(ov * v[oi[:, 0]],
                                  indices_are_sorted=True)
        return y

    y = jnp.zeros((nb, B), jnp.float32)
    for k in range(K):  # K is small & static; keeps the one-hot peak memory
        vk = vals[k].reshape(bm.in_dim, nb).astype(jnp.float32)
        pk = pos[k].reshape(bm.in_dim, nb).astype(jnp.int32)
        contrib = u[k][:, None] * vk                         # [in, nb]
        oh = jax.nn.one_hot(pk, B, dtype=jnp.float32)        # [in, nb, B]
        y = y + jnp.einsum("ij,ijp->jp", contrib, oh)
    y = y.reshape(bm.out_dim)
    if bm.outlier_vals is not None:
        ov = bm.outlier_vals[expert]
        oi = bm.outlier_idx[expert]
        y = y.at[oi[:, 1]].add(ov * v[oi[:, 0]],
                              indices_are_sorted=True)
    return y


def supports_pallas(bm: BucketedMatrix) -> bool:
    """Whether the streaming kernel can run on this layout.

    Mosaic requires DMA-sliced tiles to be 128-lane aligned in the minor
    dimension; matrices too narrow for that (tiny test models) take the
    vectorized-XLA path instead. Production shapes (Mistral wk/wv and up)
    always pass — bucketize() pads vals/pos lanes to 128 bytes.
    """
    return (bm.vals.shape[-1] % 128 == 0 and bm.pos.shape[-1] % 128 == 0)


def _tile_blocks(bm: BucketedMatrix) -> int:
    """Streaming tile size (chunks per DMA): ~64-128 rows."""
    for t in (8, 4, 2, 1):
        if bm.n_chunks % t == 0:
            return t
    return 1


def bucket_matvec(bm: BucketedMatrix, v: jax.Array, effort,
                  expert=0, impl: str = "auto",
                  block_budget: Optional[float] = None,
                  alpha: Optional[float] = None) -> jax.Array:
    """Effort-truncated matvec.

    `effort` may be a python float (any layout/impl) or a TRACED scalar —
    traced effort runs without recompilation on the row-prefix MXU kernel
    (bucket_size=1; the effort rides into the kernel as an SMEM scalar)
    and on the jnp path; the rank-prefix pallas kernel sizes its static
    prologue from effort and needs it static.
    """
    static_eff = isinstance(effort, (int, float))
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if static_eff and effort >= 0.999 and bm.dense is not None:
            impl = "dense"
        elif on_tpu and supports_pallas(bm) \
                and (static_eff or bm.bucket_size == 1):
            impl = "pallas"
        else:
            impl = "jnp"
    if impl == "dense":
        e = jnp.asarray(expert, jnp.int32)
        # dense copy stores permuted rows
        return dense_matvec(bm.permute_v(v, e), bm.dense[e])
    if impl == "jnp":
        # production cutoff semantics (the approximate two-level search
        # the kernels use in-prologue) so jnp-vs-pallas comparisons are
        # selection-identical; the sort-exact cutoff stays available via
        # bucket_matvec_jnp(exact_cutoff=True) for oracle work
        return bucket_matvec_jnp(bm, v, effort, expert,
                                 exact_cutoff=False)
    if impl in ("pallas", "stream", "gather"):
        if impl in ("pallas", "stream"):
            # production path: per-rank prefix streaming with fused
            # in-kernel selection (one launch); v3 split path as fallback
            from effort_tpu.kernels.fused_stream import (fused_matvec,
                                                         supports_fused)
            alpha = alpha if alpha is not None else DEFAULT_ALPHA
            tgb = _tile_blocks(bm)
            if impl == "pallas" and supports_fused(bm):
                eff = effort if bm.bucket_size == 1 else float(effort)
                y = fused_matvec(bm, v, eff, expert,
                                 alpha=alpha, tile_blocks=tgb)
            elif bm.bucket_size == 1:
                # B=1 layouts have no positions, so the v3 split path
                # (rank-prefix stream + packed-position scatter) cannot
                # serve them — shapes the fused kernel rejects (e.g. a
                # probe-sample length not 128-aligned) take the XLA path
                return bucket_matvec_jnp(bm, v, effort, expert,
                                         exact_cutoff=False)
            else:
                from effort_tpu.kernels.prefix_stream import (
                    select_stream, stream_matvec)
                sel = select_stream(bm, v, effort, expert, alpha=alpha,
                                    tile_blocks=tgb)
                y = stream_matvec(bm, sel, tgb)
        else:
            # exact-coverage block gather (alternative path)
            from effort_tpu.kernels.gather_dma import gather_matvec_dma
            budget = block_budget if block_budget is not None else \
                min(1.0, effort * 2.6 + 0.05)
            max_blocks = _round_up(
                max(8, int(bm.blocks_per_expert * budget)), 8)
            max_blocks = min(max_blocks,
                             _round_up(bm.blocks_per_expert, 8))
            sel = select_blocks(bm, v, effort, expert, max_blocks)
            y = gather_matvec_dma(bm, sel)
        if bm.outlier_vals is not None:
            e = jnp.asarray(expert, jnp.int32)
            vp = bm.permute_v(v, e)
            ov, oi = bm.outlier_vals[e], bm.outlier_idx[e]
            y = y.at[oi[:, 1]].add(ov * vp[oi[:, 0]],
                              indices_are_sorted=True)
        return y
    raise ValueError(impl)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_matmul(bm: BucketedMatrix, V: jax.Array, effort,
                  expert=0, impl: str = "auto") -> jax.Array:
    """Batched effort-truncated matmul: V [T, in] -> [T, out] f32.

    The prefill counterpart of bucket_matvec (a case the reference never
    faced — it is strictly batch-1, SURVEY §7 "Batch > 1"). "auto":
      - effort >= 1 with a dense copy -> dense MXU matmul;
      - effort < 1 on TPU, row-prefix layout -> the batched one-launch
        MXU kernel (kernels/fused_stream.mxu_matvec_batch: per-token
        cutoffs + row-prefix streaming — prefill-at-effort at kernel
        speed, not vmapped one-hot semantics);
      - otherwise the exact vmapped jnp semantics (CPU/tests)."""
    if impl == "auto":
        static_full = (isinstance(effort, (int, float))
                       and float(effort) >= 0.999)
        if bm.dense is not None and static_full:
            impl = "dense"
        elif (jax.default_backend() == "tpu" and bm.bucket_size == 1
              and _supports_batch_kernel(bm)):
            impl = "pallas"
        else:
            impl = "jnp"
    if impl == "dense":
        assert bm.dense is not None, "dense path needs keep_dense weights"
        e = jnp.asarray(expert, jnp.int32)
        Vp = jax.vmap(lambda v: bm.permute_v(v, e))(V)
        return jnp.dot(Vp.astype(jnp.bfloat16), bm.dense[e],
                       preferred_element_type=jnp.float32)
    if impl == "pallas":
        from effort_tpu.kernels.fused_stream import mxu_matvec_batch
        T = V.shape[0]
        Tp = _round_up(max(T, 8), 8)
        Vp = (V if Tp == T
              else jnp.concatenate([V, jnp.zeros((Tp - T, V.shape[1]),
                                                 V.dtype)]))
        # padding slots carry effort 0 (disabled in-kernel)
        eff = jnp.where(jnp.arange(Tp) < T,
                        jnp.asarray(effort, jnp.float32), 0.0)
        y = mxu_matvec_batch(bm, Vp, eff, expert,
                             tile_blocks=_tile_blocks(bm))[:T]
        if bm.outlier_vals is not None:
            e = jnp.asarray(expert, jnp.int32)
            Vperm = jax.vmap(lambda v: bm.permute_v(v, e))(V)
            ov, oi = bm.outlier_vals[e], bm.outlier_idx[e]
            y = y.at[:, oi[:, 1]].add(Vperm[:, oi[:, 0]] * ov[None, :])
        return y
    # per-token bucketMul semantics (vectorized XLA; production cutoff)
    return jax.vmap(
        lambda v: bucket_matvec_jnp(bm, v, effort, expert,
                                    exact_cutoff=False))(V)


def _supports_batch_kernel(bm: BucketedMatrix) -> bool:
    from effort_tpu.kernels.fused_stream import supports_fused
    return supports_fused(bm)
