"""bucketMul correctness: jnp & pallas(interpret) vs the numpy oracle, plus
the quality-vs-effort contract (cosine similarity to the dense product)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import (bucket_matvec, bucket_matvec_jnp,
                                      dense_matvec)
from effort_tpu.ops.effort import select_blocks
from effort_tpu.ops import oracle
from effort_tpu.kernels.gather_mul import gather_bucket_matvec

pytestmark = pytest.mark.smoke

IN, OUT = 64, 256


def _setup(rng, B=4, dtype="bf16", **kw):
    wt = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    v = rng.standard_normal(IN).astype(np.float32)
    cfg = BucketConfig(bucket_size=B, chunk_rows=8, dtype=dtype, **kw)
    return wt, v, bucketize(wt, cfg, keep_dense=True)


def cossim(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize("B", [4, 8, 16])
@pytest.mark.parametrize("effort", [0.1, 0.3, 0.7, 1.0])
def test_jnp_matches_oracle(rng, B, effort):
    wt, v, bm = _setup(rng, B=B)
    o_vals, o_pos, o_stats, o_probes, o_pd = oracle.bucketize_oracle(wt, B)
    y_oracle = oracle.bucketmul_oracle(v, o_vals, o_pos, o_stats, o_probes,
                                       o_pd, effort)
    y_jnp = np.asarray(bucket_matvec_jnp(bm, jnp.asarray(v), effort))
    np.testing.assert_allclose(y_jnp, y_oracle, atol=2e-3)


@pytest.mark.parametrize("B", [4, 16])
@pytest.mark.parametrize("effort", [0.15, 0.5, 1.0])
def test_pallas_interpret_matches_jnp(rng, B, effort):
    wt, v, bm = _setup(rng, B=B)
    y_jnp = np.asarray(bucket_matvec_jnp(bm, jnp.asarray(v), effort))
    max_blocks = bm.blocks_per_expert  # no clamping in this test
    sel = select_blocks(bm, jnp.asarray(v), effort, 0, max_blocks,
                        exact_cutoff=True)
    y_pal = np.asarray(gather_bucket_matvec(bm, sel, interpret=True))
    np.testing.assert_allclose(y_pal, y_jnp, atol=2e-3)


def test_effort_one_approaches_dense(rng):
    wt, v, bm = _setup(rng)
    y = bucket_matvec_jnp(bm, jnp.asarray(v), 1.0)
    y_dense = np.asarray(v @ wt)
    assert cossim(y, y_dense) > 0.9999


def test_quality_monotone_in_effort(rng):
    """The capability contract: cos-sim to dense grows with effort and is
    high at moderate effort (reference chart docs/ryc/ryc0.3.png)."""
    wt, v, bm = _setup(rng, B=16)
    y_dense = np.asarray(v @ wt)
    sims = []
    for e in [0.1, 0.25, 0.5, 0.9]:
        sims.append(cossim(bucket_matvec_jnp(bm, jnp.asarray(v), e), y_dense))
    assert all(s2 >= s1 - 1e-3 for s1, s2 in zip(sims, sims[1:])), sims
    assert sims[-1] > 0.999
    assert sims[1] > 0.8  # gaussian weights; real-weight curves are higher


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_quantized_quality(rng, dtype):
    wt, v, bm = _setup(rng, B=4, dtype=dtype)
    y_dense = np.asarray(v @ wt)
    y = bucket_matvec_jnp(bm, jnp.asarray(v), 1.0)
    assert cossim(y, y_dense) > 0.995


def test_fast_cutoff_matches_exact(rng):
    """Approximate threshold-search cutoff selects within ~3% of exact."""
    from effort_tpu.ops.effort import (compute_cutoff, compute_cutoff_exact,
                                       row_rank_counts)
    wt, v, bm = _setup(rng, B=8)
    v = jnp.asarray(v)
    from effort_tpu.ops.layouts import strided_sample
    vs_ = strided_sample(v, bm.in_dim, bm.probes.shape[1])
    for e in (0.1, 0.25, 0.5, 0.9):
        c_f = float(compute_cutoff(vs_, bm.probes[0], e))
        c_e = float(compute_cutoff_exact(vs_, bm.probes[0], e))
        n_f = int(row_rank_counts(v, bm.stats[0], c_f).sum())
        n_e = int(row_rank_counts(v, bm.stats[0], c_e).sum())
        assert abs(n_f - n_e) <= max(8, 0.05 * n_e), (e, n_f, n_e)


def test_block_clamping_degrades_gracefully(rng):
    wt, v, bm = _setup(rng)
    y_full = np.asarray(bucket_matvec(bm, jnp.asarray(v), 0.5, impl="jnp"))
    # pallas path with a tight budget: top-priority blocks only
    sel = select_blocks(bm, jnp.asarray(v), 0.5, 0,
                        max_blocks=bm.blocks_per_expert // 4)
    y_cl = np.asarray(gather_bucket_matvec(bm, sel, interpret=True))
    y_dense = np.asarray(v @ wt)
    assert cossim(y_cl, y_dense) > 0.5
    assert cossim(y_cl, y_full) > 0.6


def test_dense_path(rng):
    wt, v, bm = _setup(rng)
    y = bucket_matvec(bm, jnp.asarray(v), 1.0, impl="dense")
    np.testing.assert_allclose(np.asarray(y), v @ wt, rtol=2e-2, atol=2e-3)


def test_determinism(rng):
    wt, v, bm = _setup(rng)
    a = np.asarray(bucket_matvec(bm, jnp.asarray(v), 0.3, impl="jnp"))
    b = np.asarray(bucket_matvec(bm, jnp.asarray(v), 0.3, impl="jnp"))
    np.testing.assert_array_equal(a, b)
