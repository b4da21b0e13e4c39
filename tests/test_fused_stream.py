"""Fused-selection kernel (v4): capability gating + TPU parity hook.

The DMA+selection kernel itself is TPU-only (manual DMA ring, scalar-core
cutoff search); its selection math is the same code path as
ops.effort.compute_cutoff / row_rank_counts, which are covered by
tests/test_prefix_stream.py. On TPU, scripts/archive/kernel_lab12.py verifies
bit-exact parity with the v3 (select_stream + stream_matvec) pipeline.
"""

import jax
import numpy as np
import pytest

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.kernels.fused_stream import (supports_fused,
                                             strided_sample_len,
                                             fused_matvec)


def _bm(in_dim, out_dim, B=4, G=16):
    rng = np.random.default_rng(0)
    wt = (rng.standard_normal((in_dim, out_dim)) * 0.02).astype(np.float32)
    return bucketize(wt, BucketConfig(bucket_size=B, chunk_rows=G))


def test_supports_fused_production_shapes():
    assert supports_fused(_bm(4096, 14336))
    assert supports_fused(_bm(4096, 1024))


def test_supports_fused_rejects_narrow():
    # tiny test-model shapes: val lanes below the 128-lane alignment
    assert not supports_fused(_bm(256, 256, B=4, G=8))   # OB = 64 lanes


def test_strided_sample_len():
    assert strided_sample_len(4096, 4096) == 4096
    assert strided_sample_len(14336, 4096) == 3584


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="manual-DMA kernel is TPU-only")
def test_fused_matches_v3_on_tpu():
    from effort_tpu.kernels.prefix_stream import (select_stream,
                                                  stream_matvec)
    import jax.numpy as jnp
    bm = _bm(4096, 1024)
    v = jax.random.normal(jax.random.key(1), (4096,), jnp.float32)
    sel = select_stream(bm, v, 0.25, 0, alpha=1.3, tile_blocks=8)
    y3 = np.asarray(stream_matvec(bm, sel, 8))
    y4 = np.asarray(fused_matvec(bm, v, 0.25, 0, alpha=1.3, tile_blocks=8))
    np.testing.assert_allclose(y3, y4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="manual-DMA kernel is TPU-only")
def test_mxu_batch_matches_single_on_tpu():
    import jax.numpy as jnp
    from effort_tpu.kernels.fused_stream import mxu_matvec, mxu_matvec_batch
    bm = _bm(4096, 1024, B=1, G=128)
    V = jax.random.normal(jax.random.key(1), (8, 4096), jnp.float32)
    effs = jnp.full((8,), 0.25)
    Yb = np.asarray(mxu_matvec_batch(bm, V, effs, 0, alpha=1e9))
    for s in (0, 3, 7):
        y1 = np.asarray(mxu_matvec(bm, V[s], 0.25, 0, alpha=1e9))
        np.testing.assert_allclose(Yb[s], y1, atol=2e-2, rtol=1e-3)
