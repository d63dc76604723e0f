"""Tracing / profiling / numerical-debug subsystem (SURVEY.md §5).

The reference has nothing beyond wall-clock prints; TPU-native
equivalents:

* `trace(dir)`          — jax.profiler context writing a Perfetto trace.
* `chain_time(fn, ...)` — honest device timing on this host's tunneled
  TPU, where `block_until_ready` returns before remote execution ends:
  times a dependent `lax.fori_loop` chain at two lengths and returns the
  slope (fixed overhead cancels).  This is THE way to benchmark here.
* `checkify_nan(fn)`    — wrap a jitted fn with jax.checkify NaN/OOB
  checks (the "sanitizer": Pallas interpret mode + checkify errors).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profiler trace context; view with Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chain_time(fn: Callable, x, *rest, k1: int = 5, k2: int = 25,
               reps: int = 2) -> float:
    """Per-call seconds of `fn(x, *rest)` measured as a chain slope.

    `fn`'s output is folded back into the carry so iterations serialize;
    the result is fetched with np.asarray (a real completion barrier).
    """

    @jax.jit
    def chain(x, n, *rest):
        def body(i, p):
            out = fn(p, *rest)
            # tiny additive dependency — NOT multiplied by zero (XLA would
            # constant-fold the dependency away and unserialize the chain)
            # cast back: bf16 carries otherwise promote to f32 and break
            # the fori_loop carry-type invariant
            return (p + 1e-12 * jnp.mean(out.astype(jnp.float32))).astype(
                x.dtype)
        # reduce the carry to a scalar BEFORE the host fetch: for MB-
        # scale carriers the D2H transfer over the tunnel takes seconds
        # with second-scale variance, swamping the per-iteration slope
        # (this produced negative "timings" on 268 MB gradients)
        return jnp.mean(jax.lax.fori_loop(0, n, body, x)
                        .astype(jnp.float32))

    np.asarray(chain(x, k1, *rest))
    np.asarray(chain(x, k2, *rest))
    # per-side minima: min over reps of EACH chain length, then one
    # slope.  (min-of-slopes pairs a slow short run with a fast long run
    # and is optimistically biased — the closed experiment in CLAUDE.md.)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(x, k1, *rest))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chain(x, k2, *rest))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (k2 - k1)


def checkify_nan(fn: Callable) -> Callable:
    """Wrap fn with NaN/division/OOB checks; returns (err, out) semantics
    collapsed to raising on error."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
