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


def _err_stats(out, ref):
    out, ref = np.asarray(out, np.float64), np.asarray(ref, np.float64)
    cos = float((out * ref).sum()
                / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-30))
    mean_rel = float(np.abs(out - ref).mean() / (np.abs(ref).mean()
                                                 + 1e-30))
    max_over_std = float(np.abs(out - ref).max() / (ref.std() + 1e-30))
    return cos, mean_rel, max_over_std


def test_flash_error_bounded_at_scale():
    """Accuracy bound over a MANY-BLOCK accumulation (VERDICT r3 next
    #7: the published rel_err drifted 0.065 -> 0.111 from 1024x2048 to
    4096x8192 with the bf16 P@V dot; fp32 probabilities through the dot
    [pv_f32, now the default] must hold a tight bound as block count
    grows, and must beat the bf16-dot variant)."""
    H, KV, D, T, S = 8, 2, 128, 512, 2048
    cfg = tiny_test_model(n_heads=H, n_kv_heads=KV, head_dim=D,
                          max_seq_len=S)
    Q2 = jax.random.normal(jax.random.key(1), (T, H * D), jnp.float32)
    kc = jax.random.normal(jax.random.key(2), (S, KV, D), jnp.bfloat16)
    vc = jax.random.normal(jax.random.key(3), (S, KV, D), jnp.bfloat16)
    slots = (S - T) + jnp.arange(T)      # queries see the whole cache
    ref = _ref(Q2, kc, vc, slots, 0, cfg)

    out_f32 = flash_attention_seq(Q2, kc, vc, S - T, 0, H, D,
                                  interpret=True, pv_f32=True)
    out_bf16 = flash_attention_seq(Q2, kc, vc, S - T, 0, H, D,
                                   interpret=True, pv_f32=False)
    cos, mean_rel, max_std = _err_stats(out_f32, ref)
    cos_b, mean_rel_b, _ = _err_stats(out_bf16, ref)
    assert cos > 0.99995, cos
    assert mean_rel < 2e-3, mean_rel
    assert max_std < 0.03, max_std
    assert mean_rel < mean_rel_b, (mean_rel, mean_rel_b)

    # scale-aware worst-case bound (r5, scripts/flash_err_probe.py):
    # max |err| normalized by per-row output rms is flat across shapes
    # (0.0200 at both 1024x2048 and 4096x8192 on TPU); elementwise
    # relative error is unbounded only on near-zero outputs
    # (cancellation), which is a metric artifact, not accumulation
    # error — docs/kernels.md "Worst-case element error"
    o, r = np.asarray(out_f32, np.float64), np.asarray(ref, np.float64)
    row_rms = np.sqrt((r ** 2).mean(axis=1, keepdims=True))
    max_abs_over_rms = float((np.abs(o - r) / (row_rms + 1e-30)).max())
    assert max_abs_over_rms < 0.03, max_abs_over_rms
