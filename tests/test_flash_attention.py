"""Flash attention kernel (interpret mode) vs the reference XLA attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effort_tpu.config import tiny_test_model
from effort_tpu.kernels.flash_attention import (flash_attention,
                                                flash_attention_seq)
from effort_tpu.models.transformer import _attention_seq


def _ref(Q2, kc, vc, slots, mask_from, cfg):
    return _attention_seq(Q2, kc, vc, slots, mask_from, cfg)


@pytest.mark.parametrize("T,S,offset", [(16, 32, 0), (16, 32, 5),
                                        (8, 64, 3)])
def test_flash_matches_reference(T, S, offset):
    cfg = tiny_test_model(n_heads=4, n_kv_heads=2, head_dim=128,
                          max_seq_len=S)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    Q2 = jax.random.normal(k1, (T, H * D), jnp.float32)
    kc = jnp.zeros((S, KV, D), jnp.bfloat16)
    vc = jnp.zeros((S, KV, D), jnp.bfloat16)
    # fill cache slots [offset, offset+T)
    kc = kc.at[offset:offset + T].set(
        jax.random.normal(k2, (T, KV, D), jnp.bfloat16))
    vc = vc.at[offset:offset + T].set(
        jax.random.normal(k3, (T, KV, D), jnp.bfloat16))

    slots = offset + jnp.arange(T)
    ref = _ref(Q2, kc, vc, slots, offset, cfg)
    out = flash_attention_seq(Q2, kc, vc, offset, offset, H, D,
                              interpret=True)
    # kernel computes QK^T and P@V in bf16 (MXU); reference is f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=8e-3)


def test_flash_block_sizes():
    """Multiple KV blocks exercise the online-softmax accumulation."""
    H, KV, D, T, S = 2, 2, 128, 32, 256
    cfg = tiny_test_model(n_heads=H, n_kv_heads=KV, head_dim=D,
                          max_seq_len=S)
    key = jax.random.key(7)
    Q2 = jax.random.normal(key, (T, H * D), jnp.float32) * 2.0
    kc = jax.random.normal(jax.random.key(8), (S, KV, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.key(9), (S, KV, D), jnp.bfloat16)
    slots = 100 + jnp.arange(T)   # queries near the end of a long cache
    ref = _ref(Q2, kc, vc, slots, 0, cfg)
    out = flash_attention_seq(Q2, kc, vc, 100, 0, H, D, interpret=True)
    # kernel computes QK^T in bf16 (MXU); reference is f32 throughout
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=8e-3)
