"""Headline benchmark (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmark: w1-shaped (4096x14336) bucketMul vs dense bf16 matvec at
effort=25%, activation-calibrated layout, synthetic persistent-outlier
activations (documented in effort_tpu/utils/timing.py + SURVEY §6).
Baseline target (BASELINE.md): >=1.8x dense decode throughput at 25%
effort with reference-matching quality. vs_baseline = speedup / 1.8.

Timing: chained-slope method (utils/timing.py) — the only honest wall-clock
methodology through this sandbox's device tunnel.
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import effort_tpu  # noqa: F401
    from effort_tpu.config import BucketConfig
    from effort_tpu.ops.bucketize import bucketize
    from effort_tpu.ops.bucketmul import dense_matvec, bucket_matvec
    from effort_tpu.ops.effort import select_blocks
    from effort_tpu.kernels.gather_dma import gather_matvec_dma
    from effort_tpu.utils.timing import chain_time

    IN, OUT = 4096, 14336
    B, G, SLOTS = 4, 16, 8
    EFFORT = 0.25

    wt = jax.random.normal(jax.random.key(0), (IN, OUT), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (IN,)) * 1.2)
    bcfg = BucketConfig(bucket_size=B, chunk_rows=G)
    bm = bucketize(wt, bcfg, act_rms=rms)
    wt_bf16 = wt.astype(jnp.bfloat16)
    NB = bm.blocks_per_expert

    def acts(seed):
        return rms * jax.random.normal(jax.random.key(seed), (IN,))

    # dense baseline: in/out dims differ, so bounce back via a cheap slice
    def mk_dense(n):
        @jax.jit
        def run(v, w):
            def body(i, v):
                y = dense_matvec(v, w)
                return jnp.tanh(y[:IN] * 0.02 + y[IN:2 * IN] * 0.01)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_dense = chain_time(mk_dense, 8, 104,
                         [(acts(100 + i), wt_bf16) for i in range(12)])

    # measured demand -> static cap
    demand = max(int(select_blocks(bm, acts(200 + i), EFFORT, 0,
                                   NB).n_blocks) for i in range(4))
    cap = min(NB, ((int(demand * 1.08) + 7) // 8) * 8)

    def mk_gather(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                s = select_blocks(bmx, v, EFFORT, 0, cap)
                y = gather_matvec_dma(bmx, s, SLOTS)
                return jnp.tanh(y[:IN] * 0.02 + y[IN:2 * IN] * 0.01)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_eff = chain_time(mk_gather, 8, 104,
                       [(acts(300 + i), bm) for i in range(12)])

    # quality check at the benchmark's effort/cap
    v = acts(999)
    sel = select_blocks(bm, v, EFFORT, 0, cap)
    y = np.asarray(gather_matvec_dma(bm, sel, SLOTS))
    yd = np.asarray(dense_matvec(v, wt_bf16))
    cos = float(y @ yd / (np.linalg.norm(y) * np.linalg.norm(yd) + 1e-30))

    speedup = t_dense / t_eff
    out = {
        "metric": "bucketMul w1-matvec speedup at effort=25% vs dense bf16"
                  " (1 chip, calibrated layout)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 1.8, 3),
        "detail": {
            "t_dense_us": round(t_dense * 1e6, 1),
            "t_effort25_us": round(t_eff * 1e6, 1),
            "cos_sim_vs_dense": round(cos, 4),
            "dense_GBps": round(IN * OUT * 2 / t_dense / 1e9, 1),
            "block_demand_frac": round(demand / NB, 3),
            "config": {"B": B, "G": G, "slots": SLOTS, "dtype": "bf16"},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
