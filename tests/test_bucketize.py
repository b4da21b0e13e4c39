"""Bucketization layout invariants + agreement with the numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.oracle import bucketize_oracle

pytestmark = pytest.mark.smoke

IN, OUT = 64, 256


def _wt(rng, e=None):
    shape = (IN, OUT) if e is None else (e, IN, OUT)
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


@pytest.mark.parametrize("B", [4, 8, 16])
def test_matches_oracle(rng, B):
    wt = _wt(rng)
    cfg = BucketConfig(bucket_size=B, chunk_rows=8)
    bm = bucketize(wt, cfg)
    o_vals, o_pos, o_stats, o_probes, o_pdims = bucketize_oracle(wt, B)

    K, G, nb = bm.n_ranks, bm.chunk_rows, bm.n_buckets
    vals = np.asarray(bm.vals[:-1], np.float32).reshape(K, IN // G, G, nb)
    vals = np.transpose(vals, (1, 2, 0, 3)).reshape(IN, K, nb)
    pos = np.asarray(bm.pos_unpacked()[:-1]).reshape(K, IN // G, G, nb)
    pos = np.transpose(pos, (1, 2, 0, 3)).reshape(IN, K, nb)

    np.testing.assert_allclose(vals, o_vals, atol=5e-4)  # bf16 storage
    np.testing.assert_array_equal(pos, o_pos)
    np.testing.assert_allclose(np.asarray(bm.stats[0]), o_stats, atol=2e-4)
    np.testing.assert_allclose(np.asarray(bm.probes[0]), o_probes, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bm.probe_dims), o_pdims)


def test_stats_nonincreasing_in_rank(rng):
    """The prefix-selection property relies on stats decreasing with rank."""
    bm = bucketize(_wt(rng), BucketConfig(bucket_size=8, chunk_rows=8))
    stats = np.asarray(bm.stats[0])
    assert np.all(np.diff(stats, axis=1) <= 1e-7)


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int4"])
def test_reconstruct_dense_roundtrip(rng, dtype):
    wt = _wt(rng)
    cfg = BucketConfig(bucket_size=4, chunk_rows=8, dtype=dtype)
    bm = bucketize(wt, cfg)
    dense = np.asarray(bm.reconstruct_dense())
    tol = {"bf16": 5e-4, "int8": 8e-4, "int4": 8e-3}[dtype]
    if dtype == "int4":
        # clipped scales: the top (1 - clip_quantile) tail saturates by
        # design; the bulk must reconstruct within tol
        err = np.abs(dense - wt)
        assert np.quantile(err, cfg.clip_quantile - 0.005) <= tol
        assert err.mean() <= tol
    else:
        np.testing.assert_allclose(dense, wt, atol=tol)


def test_truncated_loading_drops_tail_ranks(rng):
    wt = _wt(rng)
    full = bucketize(wt, BucketConfig(bucket_size=8, chunk_rows=8))
    trunc = bucketize(wt, BucketConfig(bucket_size=8, chunk_rows=8,
                                       percent_load=0.5))
    assert trunc.n_ranks == 4
    assert trunc.vals.shape[0] < full.vals.shape[0]
    # Reconstruction keeps the largest-|w| half of every bucket.
    dense_t = np.asarray(trunc.reconstruct_dense())
    w_r = wt.reshape(IN, OUT // 8, 8)
    keep = np.zeros_like(w_r)
    for i in range(IN):
        for j in range(OUT // 8):
            order = np.argsort(-np.abs(w_r[i, j]), kind="stable")[:4]
            keep[i, j, order] = w_r[i, j, order]
    np.testing.assert_allclose(dense_t, keep.reshape(IN, OUT), atol=5e-4)


def test_multi_expert_packing(rng):
    wt = _wt(rng, e=3)
    bm = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=8))
    assert bm.n_experts == 3
    assert bm.vals.shape[0] == 3 * bm.blocks_per_expert + 1
    for e in range(3):
        np.testing.assert_allclose(
            np.asarray(bm.reconstruct_dense(expert=e)), wt[e], atol=5e-4)
    # zero pad block really is zero
    assert np.all(np.asarray(bm.vals[-1]) == 0)


def test_int4_outliers_extracted(rng):
    wt = _wt(rng)
    wt[3, 17] = 1.5  # a huge outlier
    bm = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=8,
                                    dtype="int4", outlier_frac=0.02))
    oi = np.asarray(bm.outlier_idx[0])
    ov = np.asarray(bm.outlier_vals[0])
    hit = (oi[:, 0] == 3) & (oi[:, 1] == 17)
    assert hit.any() and np.isclose(ov[hit][0], 1.5)
    np.testing.assert_allclose(np.asarray(bm.reconstruct_dense()), wt,
                               atol=8e-3)
