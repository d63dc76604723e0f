"""Implementation dispatch for geometry ops.

Every op has a pure-JAX reference implementation (in `geometry.py`) and
may have a Pallas TPU kernel (in `pallas_kernels.py`) registered under the
same name.  Selection:

* mode "auto"   — Pallas kernel when the default JAX backend is TPU and a
                  kernel is registered; pure-JAX otherwise.
* mode "jax"    — always pure-JAX.
* mode "pallas" — always Pallas (interpret mode off-TPU is up to the kernel).

The pure-JAX implementations are the semantic source of truth; kernels
must match them bit-exactly for index-producing ops (tests enforce this).

TRACE-TIME semantics (important): the mode is read when a function is
TRACED, not when it is called — a jitted function keeps whatever
implementation it was first traced with, and the mode is NOT part of
jax's cache key.  To compare impls, build a FRESH jitted function
inside each `use_impl(...)` block (the kernel-parity tests do exactly
this); calling one cached fn under two modes silently reuses the first
trace.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, Dict

import jax

_KERNELS: Dict[str, Callable] = {}
# process-wide default (set_impl, e.g. the CLIs' --impl flag) + a
# thread-local override (use_impl).  A plain threading.local alone made
# --impl jax invisible to worker threads (prefetch, a daemon's HTTP
# handlers): they'd fall back to 'auto', and with the axon sitecustomize
# force-registering the TPU that re-selects Pallas kernels in exactly
# the outage scenarios --impl jax exists to avoid (code-review r5).
_GLOBAL_MODE = "auto"
_state = threading.local()


def _mode() -> str:
    return getattr(_state, "mode", None) or _GLOBAL_MODE


def set_impl(mode: str) -> None:
    """Set the PROCESS-WIDE op-implementation mode ('auto'|'jax'|'pallas').
    Seen by every thread unless overridden by `use_impl` in that thread."""
    global _GLOBAL_MODE
    if mode not in ("auto", "jax", "pallas"):
        raise ValueError(f"unknown impl mode {mode!r}")
    _GLOBAL_MODE = mode


def get_impl() -> str:
    return _mode()


@contextlib.contextmanager
def use_impl(mode: str):
    """Context manager pinning the mode FOR THIS THREAD (overrides the
    process-wide set_impl default); restores the previous override on
    exit.  Remember the trace-time caveat in the module docstring."""
    if mode not in ("auto", "jax", "pallas"):
        raise ValueError(f"unknown impl mode {mode!r}")
    prev = getattr(_state, "mode", None)
    _state.mode = mode
    try:
        yield
    finally:
        _state.mode = prev


def register_kernel(name: str, fn: Callable) -> None:
    _KERNELS[name] = fn


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing should not fail
        return False


def kernel_or_none(name: str):
    """Return the registered kernel for `name` if the active mode selects
    kernels (pallas always; auto only on TPU), else None.

    Used by ops with no pure-JAX twin under the same signature (e.g. the
    fused SA kernel, whose fallback is the unfused module path)."""
    mode = _mode()
    if mode == "jax":
        return None
    kern = _KERNELS.get(name)
    if kern is None:
        return None
    if mode == "pallas":
        return kern
    return kern if _on_tpu() else None


def resolve(name: str, jax_fn: Callable) -> Callable:
    """Pick the active implementation for op `name`."""
    mode = _mode()
    if mode == "jax":
        return jax_fn
    kern = _KERNELS.get(name)
    if kern is None:
        if mode == "pallas":
            raise NotImplementedError(f"no Pallas kernel registered for {name!r}")
        return jax_fn
    if mode == "pallas":
        return kern
    return kern if _on_tpu() else jax_fn
