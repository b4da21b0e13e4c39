"""Honest device timing through the axon tunnel.

block_until_ready() through the remote-device tunnel does NOT synchronize
with execution completion, and repeated identical dispatches can return
without re-executing. The only trustworthy methodology found:

  1. chain N data-DEPENDENT iterations of the op inside ONE jitted function
     (carry feeds the next iteration, so nothing can be elided/hoisted),
  2. force completion with jax.device_get of the (small) final carry,
  3. report the SLOPE between two chain lengths, cancelling the fixed
     dispatch + result-fetch overhead (~29 ms here).
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def chain_time(make_chain: Callable[[int], Callable], n_lo: int, n_hi: int,
               *args, reps: int = 3) -> float:
    """Seconds per iteration, slope-based.

    make_chain(n) must return a jitted callable running n dependent
    iterations; *args are passed to it.
    """
    f_lo, f_hi = make_chain(n_lo), make_chain(n_hi)
    jax.device_get(f_lo(*args))
    jax.device_get(f_hi(*args))
    lo = min(_t(f_lo, args) for _ in range(reps))
    hi = min(_t(f_hi, args) for _ in range(reps))
    return max(hi - lo, 1e-9) / (n_hi - n_lo)


def _t(f, args) -> float:
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    return time.perf_counter() - t0
