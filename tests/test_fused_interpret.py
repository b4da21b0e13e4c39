"""CPU-CI parity for the PRODUCTION v4 fused kernels via pallas interpret
mode (kernels/fused_stream.py: mxu_matvec / fused_matvec /
mxu_matvec_batch).

Round-1 gap: the fused kernels only ran on real TPU (tests skipped
off-TPU), so CPU CI could not catch regressions in the production path.
Interpret mode executes the same kernel body (DMA ring, in-kernel
cutoff, prefix streaming) under the pallas interpreter.

Parity target: bucket_matvec_jnp with the SAME approximate two-level
cutoff (exact_cutoff=False — the kernel's in-kernel selection,
ops/effort.compute_cutoff semantics). With alpha large enough to stream
every row/rank tile, the kernel computes the identical selection and
sum, so agreement is tight (bf16 rounding only); at production alpha the
prefix truncation is the quality knob and agreement is a cos bound.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec_jnp
from effort_tpu.kernels.fused_stream import (fused_matvec, mxu_matvec,
                                             mxu_matvec_batch,
                                             supports_fused)

pytestmark = pytest.mark.smoke

IN, OUT = 256, 512
FULL_TAU = 1.0      # stream through the last selected chunk -> exact
                    # selection coverage (alpha is ignored by the kernels
                    # since the coverage-bound redesign)


def _mk(B, dtype, seed=0):
    G = 128 if B == 1 else 16
    wt = jax.random.normal(jax.random.key(seed), (IN, OUT),
                           jnp.float32) * 0.02
    bm = bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G,
                                    dtype=dtype))
    assert supports_fused(bm)
    return bm


def _v(seed=1):
    return jax.random.normal(jax.random.key(seed), (IN,), jnp.float32)


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int4"])
@pytest.mark.parametrize("effort", [0.25, 0.6])
def test_mxu_matvec_interpret_parity(dtype, effort):
    """B=1 row-prefix MXU kernel == jnp semantics at full coverage."""
    bm = _mk(1, dtype)
    v = _v()
    y = np.asarray(mxu_matvec(bm, v, effort, 0, tau=FULL_TAU,
                              interpret=True))
    yr = np.asarray(bucket_matvec_jnp(bm, v, effort, 0,
                                      exact_cutoff=False))
    assert _cos(y, yr) > 0.9999, (dtype, effort, _cos(y, yr))


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int4"])
def test_fused_matvec_interpret_parity(dtype):
    """B=4 rank-prefix kernel == jnp semantics at full coverage."""
    bm = _mk(4, dtype)
    v = _v(2)
    y = np.asarray(fused_matvec(bm, v, 0.4, 0, tau=FULL_TAU,
                                tile_blocks=8, interpret=True))
    yr = np.asarray(bucket_matvec_jnp(bm, v, 0.4, 0, exact_cutoff=False))
    tol = 0.9999 if dtype == "bf16" else 0.999
    assert _cos(y, yr) > tol, (dtype, _cos(y, yr))


def test_mxu_matvec_interpret_production_tau():
    """At the production coverage target (default tau) the streamed
    prefix keeps >= tau of the selected score mass REGARDLESS of how
    concentrated the layout is; on a calibrated layout it also stays
    short. Quality must hold close to the jnp semantics."""
    from effort_tpu.ops.bucketize import calib_row_order
    rms = jnp.exp(jax.random.normal(jax.random.key(9), (IN,)) * 1.2)
    pi = calib_row_order(rms)
    wt = jax.random.normal(jax.random.key(0), (IN, OUT),
                           jnp.float32) * 0.02
    bm = bucketize(wt, BucketConfig(bucket_size=1, chunk_rows=128),
                   in_perm=pi)
    v = rms[pi] * jax.random.normal(jax.random.key(3), (IN,))
    y = np.asarray(mxu_matvec(bm, v, 0.25, 0, interpret=True))
    yr = np.asarray(bucket_matvec_jnp(bm, v, 0.25, 0, exact_cutoff=False))
    assert _cos(y, yr) > 0.998, _cos(y, yr)


def test_mxu_matvec_interpret_uncalibrated_no_cliff():
    """Round-2 regression: on an UNCALIBRATED layout (selection scattered
    across chunks) the alpha-bounded prefix dropped most selected rows at
    low effort (the trained-checkpoint quality cliff, VERDICT r2 #1).
    The coverage bound must stay near the jnp semantics there too."""
    bm = _mk(1, "bf16", seed=11)
    v = _v(12)
    for e in (0.4, 0.25):
        y = np.asarray(mxu_matvec(bm, v, e, 0, interpret=True))
        yr = np.asarray(bucket_matvec_jnp(bm, v, e, 0,
                                          exact_cutoff=False))
        assert _cos(y, yr) > 0.998, (e, _cos(y, yr))


def test_mxu_matvec_interpret_traced_effort():
    """The B=1 kernel takes effort as a traced SMEM scalar: same
    compiled callable, different efforts, results match the per-effort
    jnp reference."""
    bm = _mk(1, "bf16")
    v = _v(4)
    run = jax.jit(lambda b, v, e: mxu_matvec(b, v, e, 0,
                                             tau=FULL_TAU,
                                             interpret=True))
    for e in (0.2, 0.7):
        y = np.asarray(run(bm, v, jnp.float32(e)))
        yr = np.asarray(bucket_matvec_jnp(bm, v, e, 0,
                                          exact_cutoff=False))
        assert _cos(y, yr) > 0.9999, (e, _cos(y, yr))


def test_mxu_matvec_batch_interpret_per_slot():
    """Batched kernel: each slot gets its own effort; slot rows match
    the single-vector kernel at the same effort, and effort=0 disables
    a slot (zero output)."""
    bm = _mk(1, "bf16")
    T = 8
    V = jax.random.normal(jax.random.key(7), (T, IN), jnp.float32)
    efforts = jnp.asarray([0.25, 0.5, 1.0, 0.0, 0.25, 0.7, 0.1, 0.0],
                          jnp.float32)
    Y = np.asarray(mxu_matvec_batch(bm, V, efforts, 0, tau=FULL_TAU,
                                    interpret=True))
    assert Y.shape == (T, OUT)
    for t in range(T):
        if float(efforts[t]) == 0.0:
            assert np.abs(Y[t]).max() == 0.0, t
            continue
        yr = np.asarray(mxu_matvec(bm, V[t], float(efforts[t]), 0,
                                   tau=FULL_TAU, interpret=True))
        assert _cos(Y[t], yr) > 0.999, (t, _cos(Y[t], yr))
