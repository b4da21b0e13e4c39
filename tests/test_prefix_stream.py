"""Prefix-stream selection: pure-jnp emulation tests (CPU).

The kernel itself is TPU-only (manual DMA); here we verify the SELECTION
semantics: full-cover alpha equals the exact jnp bucketMul, and partial
alpha is a row-prefix truncation of it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from effort_tpu.config import BucketConfig
from effort_tpu.ops.bucketize import bucketize
from effort_tpu.ops.bucketmul import bucket_matvec_jnp
from effort_tpu.kernels.prefix_stream import select_stream

IN, OUT = 256, 512


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    wt = (rng.standard_normal((IN, OUT)) * 0.02).astype(np.float32)
    r = np.exp(rng.normal(0, 1.2, IN)).astype(np.float32)
    bm = bucketize(wt, BucketConfig(bucket_size=4, chunk_rows=8),
                   act_rms=r, perm_segment=1, keep_dense=True)
    vs = [jnp.asarray(r * rng.standard_normal(IN).astype(np.float32))
          for _ in range(3)]
    return bm, vs


def _emulate(bm, sel, tile_blocks):
    """jnp emulation of the streaming kernel from the selection."""
    K, G, nc, B = bm.n_ranks, bm.chunk_rows, bm.n_chunks, bm.bucket_size
    nb = bm.n_buckets
    vals = np.asarray(bm.vals[:-1], np.float32).reshape(K, nc, G, nb)
    pos = np.asarray(bm.pos_unpacked()[:-1]).reshape(K, nc, G, nb)
    u = np.asarray(sel.u_scaled)
    cum = np.asarray(sel.cum_tiles)
    y = np.zeros((nb, B), np.float32)
    for k in range(K):
        n_tiles = cum[k + 1] - cum[k]
        chunks = min(nc, n_tiles * tile_blocks)
        for g in range(chunks):
            c = vals[k, g] * u[k, g][:, None]          # [G, nb]
            for r_ in range(G):
                for j in range(nb):
                    y[j, pos[k, g, r_, j]] += c[r_, j]
    return y.reshape(-1)  # y[j, p] -> out[j*B+p]


def test_full_cover_matches_jnp(setup):
    bm, vs = setup
    for v in vs[:2]:
        sel = select_stream(bm, v, 0.3, 0, tau=1.0, tile_blocks=2,
                            exact_cutoff=True)
        y_em = _emulate(bm, sel, 2)
        y_jnp = np.asarray(bucket_matvec_jnp(bm, v, 0.3))
        np.testing.assert_allclose(y_em, y_jnp, atol=2e-3)


def test_partial_tau_is_truncation(setup):
    bm, vs = setup
    v = vs[0]
    sel_full = select_stream(bm, v, 0.3, 0, tau=1.0, tile_blocks=2,
                             exact_cutoff=True)
    sel_part = select_stream(bm, v, 0.3, 0, tau=0.8, tile_blocks=2,
                             exact_cutoff=True)
    cum_f = np.asarray(sel_full.cum_tiles)
    cum_p = np.asarray(sel_part.cum_tiles)
    assert (np.diff(cum_p) <= np.diff(cum_f)).all()
    y_f = _emulate(bm, sel_full, 2)
    y_p = _emulate(bm, sel_part, 2)
    cs = y_f @ y_p / (np.linalg.norm(y_f) * np.linalg.norm(y_p) + 1e-30)
    assert cs > 0.95, cs


def test_lens_scale_with_effort(setup):
    bm, vs = setup
    v = vs[0]
    t_lo = int(select_stream(bm, v, 0.1, 0, alpha=1.3,
                             tile_blocks=2).cum_tiles[-1])
    t_hi = int(select_stream(bm, v, 0.6, 0, alpha=1.3,
                             tile_blocks=2).cum_tiles[-1])
    assert t_lo < t_hi
