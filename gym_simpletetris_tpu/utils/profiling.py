"""Tracing/profiling hooks (SURVEY.md §5: absent in the reference; provided as
first-class here).

- ``trace(dir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard/Perfetto trace of device execution.
- ``cost_analysis(fn, *args)``: XLA's per-executable cost model (FLOPs, bytes)
  for any jittable function — the "how big is this program" question without
  running it.
- ``debug_mode()``: enables jax_debug_nans + jax_check_tracer_leaks, the
  sanitizer story for a pure-functional engine (no shared mutable state exists
  to race on).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> dict:
    """Compile ``fn`` for the given args and return XLA's cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca or {})


@contextlib.contextmanager
def debug_mode():
    """NaN checking + tracer-leak checking, scoped."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_check_tracer_leaks", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_check_tracer_leaks", False)


def block(tree: Any) -> Any:
    """Barrier helper for benchmarking walls."""
    return jax.block_until_ready(tree)
