"""Activation-calibrated dim ordering: correctness + read-amplification."""

import numpy as np
import jax.numpy as jnp

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec_jnp
from effort_tpu.ops.effort import select_blocks

IN, OUT = 256, 512


def _acts(rng, n=6):
    """Persistent-outlier activations: v = rms_pattern * noise."""
    log_rms = rng.normal(0, 1.2, IN)
    r = np.exp(log_rms).astype(np.float32)
    return r, [r * rng.standard_normal(IN).astype(np.float32)
               for _ in range(n)]


def test_dim_order_preserves_semantics(rng):
    wt = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    r, vs = _acts(rng)
    cfg = BucketConfig(bucket_size=4, chunk_rows=8)
    bm_plain = bucketize(wt, cfg)
    bm_cal = bucketize(wt, cfg, act_rms=r)
    assert bm_cal.seg_order is not None
    for v in vs[:3]:
        a = np.asarray(bucket_matvec_jnp(bm_plain, jnp.asarray(v), 0.4))
        b = np.asarray(bucket_matvec_jnp(bm_cal, jnp.asarray(v), 0.4))
        # same selection rule on permuted rows -> identical results up to
        # probe-sample differences (probes sample different rows after the
        # permutation, moving the cutoff slightly)
        cs = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cs > 0.98, cs


def test_dim_order_reduces_block_demand(rng):
    wt = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    r, vs = _acts(rng)
    cfg = BucketConfig(bucket_size=4, chunk_rows=8)
    bm_plain = bucketize(wt, cfg)
    bm_cal = bucketize(wt, cfg, act_rms=r)
    NB = bm_plain.blocks_per_expert

    def demand(bm):
        return np.mean([int(select_blocks(bm, jnp.asarray(v), 0.25, 0,
                                          NB).n_blocks) for v in vs])

    d_plain, d_cal = demand(bm_plain), demand(bm_cal)
    # with persistent outlier dims, clustering must cut the demand
    assert d_cal < 0.82 * d_plain, (d_plain, d_cal)
    # row-granular permutation clusters even harder
    bm_row = bucketize(wt, cfg, act_rms=r, perm_segment=1)
    assert demand(bm_row) < 0.70 * d_plain


def test_reconstruct_dense_inverts_permutation(rng):
    wt = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    r, _ = _acts(rng)
    bm = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=8), act_rms=r)
    np.testing.assert_allclose(np.asarray(bm.reconstruct_dense()), wt,
                               atol=5e-4)
