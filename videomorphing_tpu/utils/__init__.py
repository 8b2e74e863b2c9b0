"""Utilities: structured metrics/logging, profiling hooks, checkpoint store,
and the ctypes bindings to the native (C++) host runtime."""

from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.utils.logging import MetricsLogger, level_record
from videomorphing_tpu.utils.profiling import phase_scope, trace_to
from videomorphing_tpu.utils.checkpoint import FieldStore

__all__ = [
    "enable_compile_cache",
    "MetricsLogger",
    "level_record",
    "phase_scope",
    "trace_to",
    "FieldStore",
]
