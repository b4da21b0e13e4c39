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
    # median, not min: the tunnel occasionally returns an impossibly-fast
    # low outlier (below the HBM roofline of the op), which min() would
    # select; the median is robust to both tails
    lo = _median(sorted(_t(f_lo, next(args_iter)) for _ in range(reps)))
    hi = _median(sorted(_t(f_hi, next(args_iter)) for _ in range(reps)))
    return max(hi - lo, 1e-9) / (n_hi - n_lo)


def _median(xs):
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def _t(f, args) -> float:
    t0 = time.perf_counter()
    jax.device_get(f(*args))
    return time.perf_counter() - t0


def fold_bounce(y, v):
    """Workload-preserving chain bounce that consumes EVERY element of y.

    v' = v * sign(folded y): |v'| == |v| so the next iteration's effort
    selection (and read volume) is identical, yet v' depends on all of y —
    a bounce that slices y (e.g. y[:IN]) lets XLA dead-code-eliminate the
    unused output columns and SLICE THE WEIGHT READS of a dense matmul
    (measured: a [8,4096]x[4096,14336] chain "ran" at 2.6 TB/s because
    only 4096 of 14336 columns were live). Pallas kernels are opaque to
    this, which makes a sliced bounce silently favor the effort kernel.

    y: [..., N_out]; v: [..., N_in]. Returns v'.
    """
    import jax.numpy as jnp
    n_in = v.shape[-1]
    n_out = y.shape[-1]
    k = -(-n_out // n_in)
    pad = k * n_in - n_out
    if pad:
        y = jnp.concatenate(
            [y, jnp.zeros(y.shape[:-1] + (pad,), y.dtype)], axis=-1)
    folded = y.reshape(y.shape[:-1] + (k, n_in)).sum(axis=-2)
    return v * jnp.where(folded >= 0, 1.0, -1.0)


def fresh_vectors(shape, n, seed0=1234, scale=1.0):
    """n distinct device-resident inputs (generated on device)."""
    import jax.numpy as jnp
    return [jax.random.normal(jax.random.key(seed0 + i), shape,
                              jnp.float32) * scale for i in range(n)]
