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
    from effort_tpu.ops.bucketmul import dense_matvec
    from effort_tpu.kernels.prefix_stream import (select_stream,
                                                  stream_matvec)
    from effort_tpu.utils.timing import chain_time

    IN, OUT = 4096, 14336
    B, G, TGB = 4, 16, 8
    EFFORT, ALPHA = 0.25, 1.3

    wt = jax.random.normal(jax.random.key(0), (IN, OUT), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (IN,)) * 1.2)
    bcfg = BucketConfig(bucket_size=B, chunk_rows=G)
    bm = bucketize(wt, bcfg, act_rms=rms, perm_segment=1, keep_dense=True)
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

    def mk_stream(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                s = select_stream(bmx, v, EFFORT, 0, alpha=ALPHA,
                                  tile_blocks=TGB)
                y = stream_matvec(bmx, s, TGB)
                return jnp.tanh(y[:IN] * 0.02 + y[IN:2 * IN] * 0.01)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_eff = chain_time(mk_stream, 8, 104,
                       [(acts(300 + i), bm) for i in range(12)])

    # quality + read fraction at the benchmark's operating point
    v = acts(999)
    sel = select_stream(bm, v, EFFORT, 0, alpha=ALPHA, tile_blocks=TGB)
    read_frac = float(sel.cum_tiles[-1]) / (NB // TGB)
    y = np.asarray(stream_matvec(bm, sel, TGB))
    yd = np.asarray(dense_matvec(bm.permute_v(v, 0), bm.dense[0])
                    if bm.dense is not None else
                    dense_matvec(bm.permute_v(v, 0),
                                 bm.reconstruct_dense().astype(
                                     jnp.bfloat16)))
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
            "weight_read_frac": round(read_frac, 3),
            "activations": "synthetic persistent-outlier (lognormal rms)",
            "config": {"B": B, "G": G, "tile_blocks": TGB, "alpha": ALPHA,
                       "kernel": "prefix-stream", "dtype": "bf16"},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
