"""Operating-point auto-tuner: pure selection logic + ladder filtering."""

import json

from effort_tpu.config import BucketConfig, ModelConfig
from effort_tpu.models.autotune import (choose_operating_point,
                                        expand_rows, _ladder)


ROWS = [
    {"config": "bf16 tau=0.97", "toks_per_s_50": 700.0,
     "toks_per_s_25": 740.0, "agreement_vs_full_50": 0.95,
     "agreement_vs_full_25": 0.84, "speedup_vs_full_dense_25": 1.01},
    {"config": "int8 percent_load=0.688", "toks_per_s_50": 1200.0,
     "toks_per_s_25": 1600.0, "agreement_vs_full_50": 0.88,
     "agreement_vs_full_25": 0.71, "speedup_vs_full_dense_25": 2.19},
    {"config": "int4 percent_load=0.688", "toks_per_s_50": 1500.0,
     "toks_per_s_25": 2000.0, "agreement_vs_full_50": 0.62,
     "agreement_vs_full_25": 0.41},
]


def test_expand_rows():
    pts = expand_rows(ROWS)
    assert len(pts) == 6
    by = {(p["config"], p["effort"]): p for p in pts}
    assert by[("bf16 tau=0.97", 0.25)]["agreement"] == 0.84
    assert by[("int8 percent_load=0.688", 0.25)]["speedup"] == 2.19


def test_choose_respects_floor():
    pts = expand_rows(ROWS)
    # floor 0.8: int8@50 (0.88) qualifies and is the fastest qualifying
    c = choose_operating_point(pts, target_agreement=0.8)
    assert c["config"].startswith("int8") and c["effort"] == 0.5, c
    # floor 0.9: only bf16@50 (0.95) qualifies among faster-than-it
    c = choose_operating_point(pts, target_agreement=0.9)
    assert c["config"].startswith("bf16") and c["effort"] == 0.5, c
    # no floor: raw fastest (int4@25) wins
    c = choose_operating_point(pts, target_agreement=None)
    assert c["config"].startswith("int4") and c["effort"] == 0.25, c
    # unreachable floor: None (caller falls back to full effort)
    assert choose_operating_point(pts, target_agreement=0.99) is None


def test_choose_skips_unmeasured_agreement_under_floor():
    pts = [{"config": "x", "effort": 0.25, "toks_per_s": 9999.0,
            "agreement": None},
           {"config": "y", "effort": 0.5, "toks_per_s": 100.0,
            "agreement": 0.9}]
    c = choose_operating_point(pts, target_agreement=0.8)
    assert c["config"] == "y"
    c = choose_operating_point(pts, target_agreement=None)
    assert c["config"] == "x"


def test_ladder_hbm_budget_filters(tmp_path):
    """An HBM budget analytically excludes configs that cannot fit —
    the reference's autoAdjustPercent RAM probe generalized."""
    cfg = ModelConfig(name="t", dim=4096, hidden_dim=14336, n_layers=32,
                      n_heads=32, n_kv_heads=8, head_dim=128,
                      vocab_size=32000)
    ck = tmp_path / "ckpt_bf16"
    ck.mkdir()
    (ck / "config.json").write_text("{}")
    ck8 = tmp_path / "ckpt_int8"
    ck8.mkdir()
    (ck8 / "config.json").write_text("{}")

    no_budget = _ladder(str(ck), None, cfg, (0.25,))
    assert {c["dtype"] for c in no_budget} == {"int8", "bf16"}

    # 8 GB: full bf16 (~14.5 GB) cannot fit; int8 can
    tight = _ladder(str(ck), 8 * 2**30, cfg, (0.25,))
    dts = [(c["dtype"], c["percent_load"]) for c in tight]
    assert ("bf16", 1.0) not in dts
    assert any(d == "int8" for d, _ in dts)
