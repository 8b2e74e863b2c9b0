"""Profiling hooks: named scopes per pipeline phase + TensorBoard traces.

Rebuild of "tracing/profiling" in SURVEY.md section 6: the reference had ad
hoc GUI timing; here every phase (pyramid/sweep/paths/blend) is wrapped in
``jax.named_scope`` so device traces segment cleanly, and ``trace_to``
captures a TensorBoard/Perfetto trace around any callable.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def phase_scope(name: str):
    """Named scope visible in XLA/TPU profiles."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: Optional[str]):
    """Capture a jax.profiler trace around a block (no-op if logdir None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
