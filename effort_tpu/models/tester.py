"""Golden-state regression tester.

Counterpart of helpers/tester.swift: run a reduced-layer model over a fixed
token sequence, record intermediate activations (post-layer residual
stream h per (token, layer) plus final logits per token) to a versioned
safetensors file; later runs compare each recorded vector by cosine
similarity >= threshold, counting residual-stream "drift" separately from
hard failures (tester.swift:26-64, 91-102).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

from effort_tpu.config import ModelConfig
from effort_tpu.models.transformer import (ModelWeights, forward_token,
                                           make_kv_cache)
from effort_tpu.runtime.safetensors_io import (SafeTensorReader,
                                               SafeTensorWriter)

VERSION = "1.0"


@dataclasses.dataclass
class VerifyReport:
    passed: bool
    failures: List[str]
    drift: int                 # residual-stream keys below threshold
    compared: int

    def __str__(self):
        s = "PASS" if self.passed else "FAIL"
        return (f"golden-state {s}: {self.compared} compared, "
                f"{self.drift} drift, {len(self.failures)} failures"
                + (f" ({self.failures[:5]})" if self.failures else ""))


def capture_states(w: ModelWeights, cfg: ModelConfig,
                   token_ids: Sequence[int], effort: float = 1.0,
                   impl: str = "jnp") -> Dict[str, np.ndarray]:
    k_cache, v_cache = make_kv_cache(cfg)
    states: Dict[str, np.ndarray] = {}
    for t, tok in enumerate(token_ids):
        logits, k_cache, v_cache, h_layers = forward_token(
            w, cfg, jnp.asarray(tok), jnp.asarray(t), k_cache, v_cache,
            effort=effort, impl=impl, collect_h=True)
        for l in range(cfg.n_layers):
            states[f"h_tok{t}_lay{l}"] = np.asarray(h_layers[l])
        states[f"logits_tok{t}"] = np.asarray(logits)
    return states


def save_states(path_dir: str, states: Dict[str, np.ndarray],
                tag: str = "golden") -> str:
    name = f"tests-{VERSION}-{tag}"
    wtr = SafeTensorWriter(path_dir, name)
    for k, v in states.items():
        wtr.add(k, v.astype(np.float32))
    wtr.save()
    return name


def verify_states(path_dir: str, states: Dict[str, np.ndarray],
                  tag: str = "golden", threshold: float = 0.99
                  ) -> VerifyReport:
    name = f"tests-{VERSION}-{tag}"
    fn = None
    for f in sorted(os.listdir(path_dir)):
        if f.startswith(name) and f.endswith(".safetensors"):
            fn = os.path.join(path_dir, f)
            break
    assert fn is not None, f"no golden file {name} in {path_dir}"
    r = SafeTensorReader(fn)
    failures, drift, compared = [], 0, 0
    for key in r.keys():
        if key not in states:
            failures.append(f"missing:{key}")
            continue
        a = np.array(r[key], np.float64).ravel()
        b = np.asarray(states[key], np.float64).ravel()
        n = np.linalg.norm(a) * np.linalg.norm(b)
        cs = float(a @ b / n) if n else 1.0
        compared += 1
        if cs < threshold:
            # residual-stream keys accumulate drift (tolerated, counted);
            # anything else is a hard failure
            if key.startswith("h_"):
                drift += 1
            else:
                failures.append(f"{key}:cos={cs:.4f}")
    r.close()
    return VerifyReport(passed=not failures, failures=failures,
                        drift=drift, compared=compared)
