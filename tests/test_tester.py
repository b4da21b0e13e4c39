"""Golden-state tester: save, verify pass, detect corruption."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.tester import (capture_states, save_states,
                                      verify_states)


def test_golden_roundtrip(tmp_path):
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    states = capture_states(w, cfg, [1, 5, 9], effort=1.0)
    assert f"h_tok0_lay{cfg.n_layers-1}" in states
    save_states(str(tmp_path), states)

    # identical rerun verifies clean
    states2 = capture_states(w, cfg, [1, 5, 9], effort=1.0)
    rep = verify_states(str(tmp_path), states2)
    assert rep.passed and rep.drift == 0, str(rep)

    # perturbed weights are detected
    w_bad = init_random_weights(cfg, BucketConfig(bucket_size=4,
                                                  chunk_rows=8), seed=9)
    states3 = capture_states(w_bad, cfg, [1, 5, 9], effort=1.0)
    rep = verify_states(str(tmp_path), states3)
    assert not rep.passed
    assert rep.drift > 0 or rep.failures


def test_low_effort_drifts_but_logits_close(tmp_path):
    """Moderate effort: residual drift may accumulate; report shows it."""
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    states = capture_states(w, cfg, [1, 5], effort=1.0)
    save_states(str(tmp_path), states)
    states_lo = capture_states(w, cfg, [1, 5], effort=0.7)
    rep = verify_states(str(tmp_path), states_lo, threshold=0.8)
    assert rep.compared > 0
