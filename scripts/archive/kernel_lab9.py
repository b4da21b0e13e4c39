"""Lab 9: decompose in-graph cost of the production gather path.

Chains (all data-dependent, fresh inputs):
  cutoff   compute_cutoff only
  permute  v[dim_order] gather only
  nmask    rank counts + u build (no compaction)
  select   full select_blocks
  kernel   DMA kernel with fixed ids, u rebuilt from v (no selection)
  full     select + kernel

Usage: kernel_lab9.py [B] [G] [effort] [N] [slots]
"""

import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops import effort as eff
from effort_tpu.kernels.gather_dma import gather_matvec_dma
from effort_tpu.ops.effort import select_blocks, BlockSelection
from effort_tpu.utils.timing import chain_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    slots = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (N,)) * 1.2)
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G),
                   act_rms=rms)
    NB = bm.blocks_per_expert
    cap = min(NB, ((int(NB * 0.62) + 7) // 8) * 8)
    print(f"B={B} G={G} N={N} NB={NB} cap={cap}", flush=True)

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (N,))

    fresh = lambda s0: [(acts(s0 + i), bm) for i in range(12)]

    def chain(body_fn, name, s0):
        def mk(n):
            @jax.jit
            def run(v, bmx):
                return jax.lax.fori_loop(
                    0, n, lambda i, v: body_fn(v, bmx), v)
            return run
        t = chain_time(mk, 8, 104, fresh(s0))
        print(f"{name:8s}: {t*1e6:8.1f} us", flush=True)
        return t

    from effort_tpu.ops.layouts import strided_sample

    # cutoff only
    def b_cutoff(v, bmx):
        c = eff.compute_cutoff(
            strided_sample(v, N, bmx.probes.shape[1]), bmx.probes[0],
            effort)
        return jnp.tanh(v * (1 + c * 1e-6))
    chain(b_cutoff, "cutoff", 1000)

    # permute only
    def b_perm(v, bmx):
        vp = bmx.permute_v(v, 0)
        return jnp.tanh(vp)
    chain(b_perm, "permute", 2000)

    # rank counts + u (includes cutoff)
    def b_nmask(v, bmx):
        vp = bmx.permute_v(v, 0)
        c = eff.compute_cutoff(
            strided_sample(vp, N, bmx.probes.shape[1]), bmx.probes[0],
            effort)
        n = eff.row_rank_counts(vp, bmx.stats[0], c)
        ranks = jnp.arange(bmx.n_ranks, dtype=jnp.int32)
        u = vp[None, :] * (ranks[:, None] < n[None, :])
        return jnp.tanh(jnp.sum(u, axis=0))
    chain(b_nmask, "nmask", 3000)

    # full select
    def b_select(v, bmx):
        s = select_blocks(bmx, v, effort, 0, cap)
        return jnp.tanh(v + jnp.sum(s.u_scaled, axis=(0, 1)) * 1e-6
                        + s.block_ids[0].astype(jnp.float32) * 1e-9)
    chain(b_select, "select", 4000)

    # kernel only: fixed ids, u from v directly
    ids_fix = select_blocks(bm, acts(9), effort, 0, cap).block_ids
    K, nc = bm.n_ranks, bm.n_chunks

    def b_kernel(v, bmx):
        u = jnp.broadcast_to(v[None], (K, N)).reshape(K, nc, G)
        sel = BlockSelection(block_ids=ids_fix,
                             u_scaled=u.astype(jnp.float32),
                             n_blocks=jnp.asarray(cap))
        return jnp.tanh(gather_matvec_dma(bmx, sel, slots)[:N] * 0.02)
    chain(b_kernel, "kernel", 5000)

    # full path
    def b_full(v, bmx):
        s = select_blocks(bmx, v, effort, 0, cap)
        return jnp.tanh(gather_matvec_dma(bmx, s, slots)[:N] * 0.02)
    chain(b_full, "full", 6000)


if __name__ == "__main__":
    main()
