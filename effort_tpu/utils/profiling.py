"""Tracing / profiling hooks.

The reference toggles Metal frame capture programmatically around hot
spots (gpu.startCapture/stopCapture, gpu.swift:198-221) and prints
prep-vs-eval wall-clock splits (runNetwork.swift:291-310; SURVEY §5).
TPU-native equivalents:

  - trace(): context manager around jax.profiler.trace — produces a
    TensorBoard/xprof trace directory with per-HLO device timelines
    (the frame-capture analog);
  - annotate(): jax.profiler.TraceAnnotation wrapper for host-side spans
    (the "prep" side);
  - hlo_dump(): compile a function with XLA dump flags to inspect what
    the compiler did to a kernel (fusion, layout, collective schedule);
  - warn_of_sync(): debug guard that logs every host<->device transfer —
    the analog of the reference's gpu.warnOfEvals flag (gpu.swift:30,
    109-112) for catching accidental synchronization in the decode loop.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/effort_tpu_trace",
          host_profiling: bool = True) -> Iterator[str]:
    """Capture a device trace for everything run inside the context."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield log_dir


def annotate(name: str):
    """Host-side span annotation visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def hlo_dump(fn, *example_args, dump_dir: str = "/tmp/effort_tpu_hlo"):
    """Lower + compile fn, returning the optimized HLO text (and writing
    it to dump_dir for offline inspection)."""
    os.makedirs(dump_dir, exist_ok=True)
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(os.path.join(dump_dir, "optimized.hlo.txt"), "w") as f:
        f.write(txt)
    return txt


class StepTimer:
    """prep/eval split timer, the analog of the reference's per-token
    "prep ms / eval ms / tps" print (runNetwork.swift:291-310):
    prep = host time before dispatch, eval = device wait."""

    def __init__(self):
        self.prep_s = 0.0
        self.eval_s = 0.0
        self.steps = 0
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def prep(self):
        t0 = time.perf_counter()
        yield
        self.prep_s += time.perf_counter() - t0

    @contextlib.contextmanager
    def eval(self):
        t0 = time.perf_counter()
        yield
        self.eval_s += time.perf_counter() - t0
        self.steps += 1

    def summary(self, n_layers_norm: int = 32) -> str:
        n = max(1, self.steps)
        tps = n / max(self.eval_s, 1e-9)
        return (f"prep {self.prep_s / n * 1e3:.1f} ms, "
                f"eval {self.eval_s / n * 1e3:.1f} ms/token, "
                f"{tps:.1f} tps")


@contextlib.contextmanager
def warn_of_sync():
    """Log every jax.device_get / np.asarray-forced transfer inside the
    context (catching accidental per-token syncs, the reference's
    warnOfEvals)."""
    import warnings
    from jax import config as _cfg
    old = _cfg.jax_transfer_guard_device_to_host
    try:
        jax.config.update("jax_transfer_guard_device_to_host", "log")
        yield
    finally:
        jax.config.update("jax_transfer_guard_device_to_host", old)
