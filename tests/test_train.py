"""Trainer subsystem: forward parity with the inference stack, loss
descent, and the export -> convert -> load -> eval round trip.

The parity test is the load-bearing one: the quality evidence pipeline
(train a real model, then measure agreement/NLL down the effort scale)
is only meaningful if the TRAINED function and the SERVED function are
the same function.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.train import (TrainConfig, byte_corpus_from_files,
                              export_hf, forward, init_params,
                              next_token_loss, train)

pytestmark = pytest.mark.smoke


def _cfg():
    import dataclasses
    return dataclasses.replace(tiny_test_model(), vocab_size=256,
                               n_layers=2)


def test_forward_shapes_and_loss_finite():
    cfg = _cfg()
    params = init_params(cfg, seed=0)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16)), jnp.int32)
    logits, _ = forward(params, cfg, toks)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())
    loss = next_token_loss(params, cfg, toks)
    assert np.isfinite(float(loss))
    # random init: loss ~= ln(vocab)
    assert abs(float(loss) - np.log(cfg.vocab_size)) < 1.0


def test_forward_parity_with_inference_stack(tmp_path):
    """Trainer forward logits == inference forward_token logits after
    export -> convert -> load (effort=1.0, bf16 bucket rounding)."""
    from effort_tpu.convert.convert import convert_checkpoint
    from effort_tpu.models.weights import load_bucketized
    from effort_tpu.models.transformer import forward_token, make_kv_cache

    cfg = _cfg()
    params = init_params(cfg, seed=3)
    export_hf(params, cfg, str(tmp_path / "hf"))
    convert_checkpoint(str(tmp_path / "hf"), str(tmp_path / "b"), cfg,
                       BucketConfig(bucket_size=4, chunk_rows=8),
                       progress=lambda *a: None)
    w, cfg2, _ = load_bucketized(str(tmp_path / "b"))

    toks = [5, 250, 17, 99, 3]
    ref = np.asarray(forward(params, cfg,
                             jnp.asarray([toks], jnp.int32))[0][0])
    kc, vc = make_kv_cache(cfg2)
    for t, tok in enumerate(toks):
        lg, kc, vc = forward_token(w, cfg2, jnp.asarray(tok),
                                   jnp.asarray(t), kc, vc, effort=1.0,
                                   impl="jnp")
        a, b = np.asarray(lg, np.float64), ref[t].astype(np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, (t, cos)
        # argmax must agree wherever the margin exceeds bf16 bucket
        # rounding (random-init logits are near-flat; trained logits
        # have decisive margins and match exactly)
        srt = np.sort(b)
        if srt[-1] - srt[-2] > 0.05:
            assert int(a.argmax()) == int(b.argmax()), t


def test_train_reduces_loss():
    """A few dozen steps on highly regular data must cut the loss well
    below the random-init ln(V)."""
    cfg = _cfg()
    pattern = np.tile(np.arange(64, dtype=np.uint8) % 17 + 40, 400)
    tcfg = TrainConfig(batch=8, seq_len=32, steps=60, warmup=10,
                       lr=1e-3, scan_chunk=20, holdout_frac=0.05)
    params, hist = train(cfg, pattern, tcfg, progress=lambda *a: None)
    first, last = hist[0][1], hist[-1][1]
    assert last < first * 0.5, hist
    assert hist[-1][2] < np.log(cfg.vocab_size) * 0.5, hist  # holdout too


def test_byte_corpus_from_files(tmp_path):
    p1, p2 = tmp_path / "a.txt", tmp_path / "b.txt"
    p1.write_bytes(b"hello world")
    p2.write_bytes(b"goodbye")
    c = byte_corpus_from_files([str(p1), str(p2)])
    assert c.dtype == np.uint8 and len(c) == 18
    c2 = byte_corpus_from_files([str(p1), str(p2)], limit_bytes=11)
    assert len(c2) == 11


def test_moe_forward_parity():
    """Trainer MoE forward (dense all-experts, top-2 gated) must match
    the serving MoE path (_ffn top-2 sparse, runNetwork.swift:184-201)
    through the in-memory assembly used by the on-device quality
    pipeline (scripts/trained_quality_ondevice.params_to_raw)."""
    import dataclasses as _dc
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "tq_ondevice", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "trained_quality_ondevice.py"))
    tqo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tqo)

    from effort_tpu.models.transformer import (assemble_weights,
                                               forward_token,
                                               make_kv_cache)
    cfg = _cfg()
    cfg = _dc.replace(cfg, n_experts=4, n_experts_per_tok=2)
    params = init_params(cfg, seed=5)
    raw = tqo.params_to_raw(params, cfg)
    w = assemble_weights(raw, cfg, BucketConfig(bucket_size=4,
                                                chunk_rows=8))

    toks = [5, 250, 17, 99]
    ref = np.asarray(forward(params, cfg,
                             jnp.asarray([toks], jnp.int32))[0][0])
    kc, vc = make_kv_cache(cfg)
    for t, tok in enumerate(toks):
        lg, kc, vc = forward_token(w, cfg, jnp.asarray(tok),
                                   jnp.asarray(t), kc, vc, effort=1.0,
                                   impl="jnp")
        a, b = np.asarray(lg, np.float64), ref[t].astype(np.float64)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, (t, cos)
