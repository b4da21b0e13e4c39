"""Honest device timing through the axon tunnel.

block_until_ready() through the remote-device tunnel does NOT synchronize
with execution completion, and identical repeated dispatches (same
executable + same input buffers) return cached results without re-running.
The only trustworthy methodology found:

  1. chain N data-DEPENDENT iterations of the op inside ONE jitted function
     (carry feeds the next iteration, so nothing can be elided/hoisted),
  2. force completion with jax.device_get of the (small) final carry,
  3. report the SLOPE between two chain lengths, cancelling the fixed
     dispatch + result-fetch overhead (~29 ms here),
  4. use FRESH input values for every single timed call (repeat a call with
     the same args and you measure the cache, not the device).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


def chain_time(make_chain: Callable[[int], Callable], n_lo: int, n_hi: int,
               args_per_rep: Sequence[tuple], reps: int = 3) -> float:
    """Seconds per chain iteration, slope-based.

    make_chain(n) returns a jitted callable running n dependent iterations.
    args_per_rep: one DISTINCT args tuple per timed call (>= 2*reps of
    them); never reused between calls.
    """
    args_iter = iter(args_per_rep)
    f_lo, f_hi = make_chain(n_lo), make_chain(n_hi)
    jax.device_get(f_lo(*next(args_iter)))   # compile
    jax.device_get(f_hi(*next(args_iter)))
    lo = min(_t(f_lo, next(args_iter)) for _ in range(reps))
    hi = min(_t(f_hi, next(args_iter)) for _ in range(reps))
    return max(hi - lo, 1e-9) / (n_hi - n_lo)


def _t(f, args) -> float:
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    return time.perf_counter() - t0


def fresh_vectors(shape, n, seed0=1234, scale=1.0):
    """n distinct device-resident inputs (generated on device)."""
    import jax.numpy as jnp
    return [jax.random.normal(jax.random.key(seed0 + i), shape,
                              jnp.float32) * scale for i in range(n)]
