"""Profiling/tracing hooks (CPU)."""

import jax.numpy as jnp

from effort_tpu.utils.profiling import StepTimer, annotate, hlo_dump


def test_step_timer():
    t = StepTimer()
    with t.prep():
        x = jnp.arange(8.0)
    with t.eval():
        y = (x * 2).sum()
    assert t.steps == 1
    assert "tps" in t.summary()


def test_hlo_dump(tmp_path):
    txt = hlo_dump(lambda x: x * 2 + 1, jnp.ones((8, 8)),
                   dump_dir=str(tmp_path))
    assert "HloModule" in txt or "ENTRY" in txt
    assert (tmp_path / "optimized.hlo.txt").exists()


def test_annotate():
    with annotate("test-span"):
        _ = jnp.zeros(4) + 1
