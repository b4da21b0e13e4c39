"""Marker-rewrite machinery of scripts/update_numbers.py (the published-
numbers single source of truth) and the trained-quality corpus builder."""

import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.smoke

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_render_map_covers_all_phases():
    un = _load("update_numbers")
    num = {
        "matvec": {"value": 2.5, "detail": {"t_mxu_us": 63.6,
                                            "t_dense_us": 160.0,
                                            "cos_vs_dense": 0.9885}},
        "int4": {"value": 6.0, "detail": {"t_int4_us": 26.6,
                                          "t_dense_us": 160.0,
                                          "cos_vs_dense": 0.983}},
        "model": {"value": 2.42, "detail": {"model_toks_per_s_25": 284.0,
                                            "model_toks_per_s_50": 161.0,
                                            "model_toks_per_s_100": 125.0}},
        "serving": {"value": 5089.0, "detail": {"batch": 8, "n_layers": 4,
                                                "agg_toks_32L_equiv": 636.0}},
        "moe": {"value": 300.0, "detail": {
            "n_layers": 4, "moe_toks_per_s_25": 300.0,
            "moe_toks_per_s_50": 200.0, "moe_toks_per_s_100": 100.0,
            "moe_toks_per_s_32L_equiv_25": 37.5}},
    }
    r = un.render_map(num)
    for key in ("mv.line", "mv.speedup", "i4.line", "mdl.speedup25",
                "mdl.full", "mdl.tok25", "srv.line", "moe.line"):
        assert key in r and r[key], key
    assert "2.50x" in r["mv.line"] and "0.989" in r["mv.line"]
    assert "284" in r["mdl.full"]


def test_docs_markers_resolve():
    """Every <!--N:key--> marker in README/docs must be a key render_map
    can produce (else update_numbers silently leaves it stale)."""
    import glob
    import re
    un = _load("update_numbers")
    # a fully-populated fake: every render key exists
    num = json.loads(json.dumps({
        "matvec": {"value": 1.0, "detail": {"t_mxu_us": 1, "t_dense_us": 1,
                                            "cos_vs_dense": 1}},
        "int4": {"value": 1.0, "detail": {"t_int4_us": 1, "t_dense_us": 1,
                                          "cos_vs_dense": 1}},
        "model": {"value": 1.0, "detail": {"model_toks_per_s_25": 1,
                                           "model_toks_per_s_50": 1,
                                           "model_toks_per_s_100": 1,
                                           "logits_cos_25": 1.0,
                                           "logits_cos_50": 1.0,
                                           "full_depth_logits_cos_25": 1.0}},
        "serving": {"value": 1.0, "detail": {"batch": 8, "n_layers": 4,
                                             "agg_toks_32L_equiv": 1}},
        "trained": {"value": 1.0, "detail": {
            "model": "wordlm-500m", "agreement_25": 1.0,
            "toks_per_s_25": 1.0, "toks_per_s_100": 1.0,
            "dense_toks_per_s": 1.0, "streamed_chunk_frac_25": 1.0}},
        "moe": {"value": 1.0, "detail": {
            "n_layers": 4, "moe_toks_per_s_25": 1, "moe_toks_per_s_50": 1,
            "moe_toks_per_s_100": 1, "moe_toks_per_s_32L_equiv_25": 1}},
        "longctx": {"value": 1.0, "detail": {
            "prefill_1024x2048": {"t_xla_ms": 1, "t_flash_ms": 1,
                                  "flash_speedup_x": 1.0,
                                  "rel_err_vs_xla": 0.0},
            "prefill_4096x8192": {"t_xla_ms": 1, "t_flash_ms": 1,
                                  "flash_speedup_x": 1.0,
                                  "rel_err_vs_xla": 0.0},
            "ring_kv": {"window": 1024, "n_layers": 2,
                        "ms_per_tok_at_pos_256": 1.0,
                        "ms_per_tok_at_pos_5120": 1.0,
                        "flat_ratio": 1.0}}},
    }))
    keys = set(un.render_map(num))
    pat = re.compile(r"<!--N:([a-z0-9._]+)-->")
    for path in [f"{ROOT}/README.md"] + glob.glob(f"{ROOT}/docs/*.md"):
        for key in pat.findall(open(path).read()):
            assert key in keys, (path, key)


def test_rewrite_docs_roundtrip(tmp_path, monkeypatch):
    un = _load("update_numbers")
    doc = tmp_path / "README.md"
    (tmp_path / "docs").mkdir()
    doc.write_text("speed: <!--N:mv.speedup-->old<!--/N--> end\n"
                   "unknown: <!--N:nope-->keep<!--/N-->\n")
    monkeypatch.setattr(un, "ROOT", str(tmp_path))
    n = un.rewrite_docs({"mv.speedup": "9.99x"})
    out = doc.read_text()
    assert "<!--N:mv.speedup-->9.99x<!--/N-->" in out
    assert "<!--N:nope-->keep<!--/N-->" in out   # unknown keys untouched
    assert n == 1


def test_build_facts_deterministic():
    tq = _load("trained_quality")
    f1, f2 = tq.build_facts(), tq.build_facts()
    assert f1 == f2 and len(f1) == 128
    subs = {f["subj"] for f in f1}
    assert len(subs) == 128          # no subject collisions
    line = tq.fact_line(f1[0])
    assert f1[0]["subj"] in line and f1[0]["val"] in line
