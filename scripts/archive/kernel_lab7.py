"""Lab 7: validate + time the manual-DMA gather kernel (v2).

Usage: kernel_lab7.py [B] [G] [effort] [N] [slots]
"""

import sys
import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

import effort_tpu  # noqa: F401
from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.effort import select_blocks
from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec_jnp
from effort_tpu.kernels.gather_dma import gather_matvec_dma, pack_positions
from effort_tpu.utils.timing import chain_time, fresh_vectors


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    effort = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    slots = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    wt = jax.random.normal(jax.random.key(0), (N, N), jnp.float32) * 0.02
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G))
    pos_packed = pack_positions(bm.pos, B)
    NB = bm.blocks_per_expert
    print(f"B={B} G={G} N={N} blocks={NB} slots={slots} e={effort}",
          flush=True)

    budget = min(1.0, effort * 1.3 + 0.02)
    max_blocks = ((int(NB * budget) + 7) // 8) * 8

    # ---- correctness vs jnp oracle (on-device, single call; full cap so
    # clamping cannot mask kernel bugs) ----
    v = jax.random.normal(jax.random.key(7), (N,), jnp.float32)
    sel = select_blocks(bm, v, effort, 0, NB)
    y2 = np.asarray(gather_matvec_dma(bm, sel, pos_packed, slots))
    y1 = np.asarray(bucket_matvec_jnp(bm, v, effort))
    cs = y1 @ y2 / (np.linalg.norm(y1) * np.linalg.norm(y2) + 1e-30)
    err = np.abs(y1 - y2).max()
    clamped = int(sel.n_blocks) >= NB
    print(f"parity vs jnp: cos={cs:.6f} maxerr={err:.2e} "
          f"(n_blocks={int(sel.n_blocks)}/{NB}"
          f"{' CLAMPED' if clamped else ''})", flush=True)

    # ---- timing ----
    def mk(n):
        @jax.jit
        def run(v, bmx, pp):
            def body(i, v):
                s = select_blocks(bmx, v, effort, 0, max_blocks)
                y = gather_matvec_dma(bmx, s, pp, slots)
                return jnp.tanh(y * 0.02)
            return jax.lax.fori_loop(0, n, body, v)
        return run

    bytes_rd = max_blocks * G * bm.n_buckets * (2 + 0.25)
    t = chain_time(mk, 8, 72,
                   [(vv, bm, pos_packed) for vv in
                    fresh_vectors((N,), 12, seed0=555)])
    print(f"gather-dma: {t*1e6:8.1f} us ({bytes_rd/t/1e9:6.1f} GB/s, "
          f"{t/max_blocks*1e9:5.0f} ns/blk)", flush=True)


if __name__ == "__main__":
    main()
