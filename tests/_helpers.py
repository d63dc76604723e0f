"""Shared test utilities.

`jit_init` wraps `model.init` in jax.jit: on the 1-core CPU host, eager
init of a PointNet++-sized module costs 10-17 s of op-by-op dispatch,
while the jitted version compiles once (persisted by the compilation
cache conftest enables) and replays in ~1 s on every later suite run.
Used by the trace-bound model/parity tests — the main lever that took
the suite from 14+ to <8 min (VERDICT r2 item 4).
"""

import jax


def jit_init(model, rngs, *args, **static_kwargs):
    """model.init under jit; static_kwargs are closed over (e.g. train)."""
    fn = jax.jit(lambda r, a: model.init(r, *a, **static_kwargs))
    return fn(rngs, args)
