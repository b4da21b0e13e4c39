"""Headline benchmark (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmark: w1-shaped (4096x14336) effort matvec at effort=25% vs dense
bf16 on the MXU, on the PRODUCTION path: row-prefix MXU kernel
(bucket_size=1, fused in-kernel selection, kernels/fused_stream.py) with
the calibration permutation BAKED into the weight layout (as the
whole-model relayout pass does — no runtime gather). Activations:
synthetic persistent-outlier (lognormal per-dim rms), the empirically
universal LLM decode regime.

Timing: chained-slope (utils/timing.py) with the WORKLOAD-PRESERVING
fold_bounce: v' = v * sign(fold(y)) keeps |v| (and therefore the
selection and the read volume) identical every iteration, stays
data-dependent, and consumes EVERY output element (a sliced bounce lets
XLA dead-code-eliminate unread weight columns of the dense baseline; a
tanh bounce distorts the activation distribution and measures a lighter
selection than the one quality is quoted at).

Baseline target (BASELINE.md): >=1.8x dense decode throughput at 25%
effort with reference-matching quality. vs_baseline = speedup / 1.8.

detail.rank_prefix_* report the bucket_size=4 rank-prefix (VPU scatter)
kernel — the finest-granularity path, quality king under uniform
activations — on the same honest chain.
"""

import json

import numpy as np


def _arm_watchdog(seconds: int = 2700) -> None:
    """The axon tunnel can hang indefinitely (even jax.devices() blocks);
    a hung benchmark must fail visibly instead of wedging the driver."""
    import signal

    def _abort(signum, frame):
        import sys
        print("bench.py watchdog: no result within "
              f"{seconds}s (TPU tunnel hung?)", file=sys.stderr)
        raise SystemExit(3)

    try:
        signal.signal(signal.SIGALRM, _abort)
        signal.alarm(seconds)
    except (ValueError, OSError):
        pass  # non-main thread / platform without SIGALRM


def main():
    _arm_watchdog()
    import jax
    import jax.numpy as jnp
    import effort_tpu  # noqa: F401
    from effort_tpu.config import BucketConfig
    from effort_tpu.ops.bucketize import bucketize, calib_row_order
    from effort_tpu.ops.bucketmul import dense_matvec
    from effort_tpu.kernels.fused_stream import fused_matvec, mxu_matvec
    from effort_tpu.utils.timing import chain_time

    IN, OUT = 4096, 14336
    EFFORT, ALPHA = 0.25, 1.3

    wt = jax.random.normal(jax.random.key(0), (IN, OUT), jnp.float32) * 0.02
    rms = jnp.exp(jax.random.normal(jax.random.key(5), (IN,)) * 1.2)
    pi = calib_row_order(rms)
    rms_p = rms[pi]                       # permuted-space activation scale

    bm1 = bucketize(wt, BucketConfig(bucket_size=1, chunk_rows=128),
                    in_perm=pi, keep_dense=True)
    bm4 = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=16),
                    in_perm=pi, keep_dense=True)

    def acts(seed):
        # generated directly in the baked-permutation space
        return rms_p * jax.random.normal(jax.random.key(seed), (IN,))

    from effort_tpu.utils.timing import fold_bounce as bounce

    # chain 8 -> 304 iterations, median of 5 reps: the tunnel's per-call
    # jitter (±10us, occasional impossibly-fast outliers) demands long
    # chains and a robust statistic
    N_HI, REPS = 304, 5

    def mk_dense(n):
        @jax.jit
        def run(v, w):
            def body(i, v):
                return bounce(dense_matvec(v, w), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_dense = chain_time(mk_dense, 8, N_HI,
                         [(acts(100 + i), bm1.dense[0]) for i in range(12)],
                         reps=REPS)

    def mk_mxu(alpha):
        def mk(n):
            @jax.jit
            def run(v, bmx):
                def body(i, v):
                    return bounce(mxu_matvec(bmx, v, EFFORT, 0,
                                             alpha=alpha), v)
                return jax.lax.fori_loop(0, n, body, v)
            return run
        return mk
    t_mxu = chain_time(mk_mxu(ALPHA), 8, N_HI,
                       [(acts(300 + i), bm1) for i in range(12)], reps=REPS)

    def mk_rank(n):
        @jax.jit
        def run(v, bmx):
            def body(i, v):
                return bounce(fused_matvec(bmx, v, EFFORT, 0, alpha=ALPHA,
                                           tile_blocks=8), v)
            return jax.lax.fori_loop(0, n, body, v)
        return run
    t_rank = chain_time(mk_rank, 8, N_HI,
                        [(acts(500 + i), bm4) for i in range(12)], reps=REPS)

    # quality at the SAME operating point (same distribution as the
    # chain), MEAN over 16 activation draws — a single draw is ±0.003
    def cos_vs_dense(y, v):
        yd = np.asarray(dense_matvec(v, bm1.dense[0]))
        y = np.asarray(y)
        return float(y @ yd / (np.linalg.norm(y) * np.linalg.norm(yd)
                               + 1e-30))
    run1 = jax.jit(mxu_matvec,
                   static_argnames=("effort", "alpha", "tile_blocks",
                                    "slots"))
    run4 = jax.jit(fused_matvec,
                   static_argnames=("effort", "alpha", "tile_blocks",
                                    "slots"))
    cs1, cs4 = [], []
    for s in range(900, 916):
        v = acts(s)
        cs1.append(cos_vs_dense(run1(bm1, v, EFFORT, 0, alpha=ALPHA), v))
        cs4.append(cos_vs_dense(run4(bm4, v, EFFORT, 0, alpha=ALPHA,
                                     tile_blocks=8), v))
    cos1, cos4 = float(np.mean(cs1)), float(np.mean(cs4))

    speedup = t_dense / t_mxu
    out = {
        "metric": "effort matvec speedup at effort=25% vs dense bf16, "
                  "w1 shape 4096x14336 (1 chip, row-prefix MXU kernel, "
                  "baked calibration, workload-preserving chain)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 1.8, 3),
        "detail": {
            "t_dense_us": round(t_dense * 1e6, 1),
            "t_mxu_us": round(t_mxu * 1e6, 1),
            "cos_vs_dense": round(cos1, 4),
            "dense_GBps": round(IN * OUT * 2 / t_dense / 1e9, 1),
            "rank_prefix_us": round(t_rank * 1e6, 1),
            "rank_prefix_x": round(t_dense / t_rank, 3),
            "rank_prefix_cos": round(cos4, 4),
            "model_level": "scripts/model_bench.py (fused q|k|v + w1|w3, "
                           "int8 LM head): 4L bf16 @e0.25 2.27x dense "
                           "(876 tok/s); 32L (full Mistral-7B depth) int8 "
                           "@ percent_load 11/16: 284 tok/s @e0.25, 161 "
                           "@e0.5, 125 @e1.0; 24L int8 full load 277 "
                           "tok/s @e0.25 (v5e-1)",
            "activations": "synthetic persistent-outlier (lognormal rms)",
            "config": {"effort": EFFORT, "alpha": ALPHA,
                       "kernel": "fused mxu row-prefix B=1 / "
                                 "fused rank-prefix B=4", "dtype": "bf16"},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
