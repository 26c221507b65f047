"""Tracing / profiling hooks (SURVEY.md section 7):

- `trace(path)`: context manager around `jax.profiler.trace` — produces a
  Perfetto/TensorBoard trace of device execution.
- `cost_analysis(fn, *args)`: XLA's per-executable FLOP/byte estimates
  via `jit(fn).lower(...).compile().cost_analysis()`.
- `debug_checks()`: context manager enabling jax_debug_nans +
  jax_enable_checks for CI debugging runs (never the hot path).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(path: str):
    with jax.profiler.trace(path):
        yield


def cost_analysis(fn, *args, **kwargs):
    """Returns XLA cost analysis dict(s) for jit(fn)(*args)."""
    lowered = jax.jit(fn, **kwargs).lower(*args)
    compiled = lowered.compile()
    return compiled.cost_analysis()


@contextlib.contextmanager
def debug_checks():
    old_nans = jax.config.jax_debug_nans
    old_checks = jax.config.jax_enable_checks
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_enable_checks", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_enable_checks", old_checks)
