"""Orchestrator resilience (VERDICT r3 missing #1): a complete headline
JSON line must be printed after EVERY phase so the driver — which keeps
the LAST parseable line — still records a number when it kills the
process mid-run."""

import importlib.util
import io
import json
import os
import sys

import pytest

pytestmark = pytest.mark.smoke

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def _run_orchestrate(monkeypatch, capsys, phase_results):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **k: (True, "PROBE_OK tpu 1"))

    def fake_phase(name, timeout_s, retries=1):
        res = phase_results.get(name)
        if res is None:
            return None, f"{name} failed", {}
        return res, "", {}
    monkeypatch.setattr(bench, "_run_phase", fake_phase)
    bench.orchestrate()
    return _json_lines(capsys.readouterr().out)


def test_headline_after_every_phase(monkeypatch, capsys):
    results = {
        "matvec": {"value": 2.0, "metric": "matvec x", "detail": {}},
        "model": {"value": 2.3, "metric": "model x",
                  "detail": {"speedup_vs_dense_25": 2.3}},
        "trained": {"value": 1.1, "metric": "trained x", "detail": {}},
        "int4": {"value": 7.0, "metric": "int4 x", "detail": {}},
        "serving": {"value": 4000.0, "metric": "srv", "detail": {}},
        "moe": {"value": 600.0, "metric": "moe", "detail": {}},
        "longctx": {"value": 3.0, "metric": "lc", "detail": {}},
    }
    lines = _run_orchestrate(monkeypatch, capsys, results)
    # one complete line per phase (7), each parseable with value+metric
    assert len(lines) == 7, [l.get("metric") for l in lines]
    for l in lines:
        assert "value" in l and "metric" in l and "vs_baseline" in l
    # first line: matvec fallback; model line onwards: model headline
    assert lines[0]["value"] == 2.0
    assert "pending" in lines[0]["metric"]
    assert lines[1]["value"] == 2.3
    # the LAST line (what the driver keeps) carries the model headline
    # and every extra phase in detail
    last = lines[-1]
    assert last["value"] == 2.3
    for extra in ("trained", "int4", "serving", "moe", "longctx"):
        assert extra in last["detail"], extra
    assert last["detail"]["matvec"]["speedup_x"] == 2.0


def test_model_phase_failure_keeps_matvec_headline(monkeypatch, capsys):
    results = {
        "matvec": {"value": 1.9, "metric": "matvec x", "detail": {}},
        "trained": {"value": 1.1, "metric": "trained x", "detail": {}},
    }
    lines = _run_orchestrate(monkeypatch, capsys, results)
    assert lines, "no JSON emitted"
    last = lines[-1]
    assert last["value"] == 1.9
    assert "model_error" in last["detail"]
    assert "trained" in last["detail"]


def test_all_failed_emits_error_line(monkeypatch, capsys):
    lines = _run_orchestrate(monkeypatch, capsys, {})
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert lines[0]["error"] == "all-phases-failed"


def test_regen_trained_builds_measurable_model(monkeypatch, tmp_path):
    """Clean-tree fallback (_regen_trained): with runs/ absent the
    trained phase must TRAIN a model in-process rather than emit
    `no-trained-checkpoint` (driver benches run in fresh checkouts).
    Tiny config + 3 steps on CPU; asserts the returned weights decode
    and the holdout slice is real corpus text."""
    bench = _load_bench()
    import scripts.trained_wordlm as tw
    from effort_tpu.config import ModelConfig

    monkeypatch.setenv("WORDLM_REGEN_DIR", str(tmp_path))
    monkeypatch.setattr(
        tw, "model_cfg",
        lambda: ModelConfig(name="wordlm-500m", dim=64, hidden_dim=128,
                            n_layers=2, n_heads=4, n_kv_heads=2,
                            head_dim=16, vocab_size=tw.VOCAB,
                            max_seq_len=256, rope_theta=1e6))
    monkeypatch.setattr(tw, "_local_text",
                        lambda mb: "the quick brown fox " * 6000)
    monkeypatch.setenv("BENCH_REGEN_STEPS", "3")
    emitted = []
    monkeypatch.setattr(bench, "_emit_partial", emitted.append)

    w, cfg, hold, steps, raw, rms, ho_nats = bench._regen_trained()
    # scan_chunk clamps to the step count, so 3 means 3 (ADVICE r4 low)
    assert steps == 3
    assert raw is not None and rms is not None
    assert cfg.n_layers == 1 and cfg.name == "wordlm-regen-250m"
    assert len(hold) > 100
    assert any("trained_regen_calibrated" in d for d in emitted)

    import jax
    import jax.numpy as jnp
    from effort_tpu.models.transformer import forward_token, make_kv_cache
    kc, vc = make_kv_cache(cfg)
    logits, _, _ = forward_token(w, cfg, jnp.asarray(hold[0]),
                                 jnp.asarray(0), kc, vc, effort=0.5,
                                 impl="jnp")
    assert logits.shape == (cfg.vocab_size,)
    assert bool(jnp.isfinite(logits).all())
    # dense copies present: the speed sweep's baseline needs them
    assert w.layers.w1.dense is not None
