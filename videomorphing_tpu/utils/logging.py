"""Structured metrics/observability (SURVEY.md section 6).

The reference prints energy per level to the GUI; here every solve emits
structured per-level records (energy, iterations, wall time) as JSON lines,
and the CLI computes the BASELINE metrics (frames/sec, iters/sec/Mpixel) so
every run is a benchmark run.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from functools import lru_cache as _lru_cache
from typing import Any, Dict, Optional

logger = logging.getLogger("videomorphing_tpu")


def level_record(level: int, shape, stats) -> Dict[str, Any]:
    """Serialize a LevelStats into a plain-dict record."""
    return {
        "level": level,
        "shape": list(shape),
        "e0": float(stats.e0),
        "e_final": float(stats.e_final),
        "iters": int(stats.iters),
        "step": float(stats.step),
    }


class MetricsLogger:
    """JSON-lines metrics sink with wall-clock phase timing.

    >>> m = MetricsLogger(verbose=True)
    >>> with m.phase("optimize"):
    ...     ...
    >>> m.emit("solve_done", levels=records)
    """

    def __init__(self, stream=None, verbose: bool = False):
        self.stream = stream if stream is not None else sys.stderr
        self.verbose = verbose
        self._t0 = time.perf_counter()

    def emit(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "t": round(time.perf_counter() - self._t0, 4), **fields}
        line = json.dumps(rec, default=_to_jsonable)
        if self.verbose:
            print(line, file=self.stream, flush=True)
        logger.info(line)

    def phase(self, name: str):
        return _Phase(self, name)


class _Phase:
    def __init__(self, m: MetricsLogger, name: str):
        self.m = m
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.m.emit("phase", name=self.name, seconds=round(time.perf_counter() - self.t0, 4))
        return False


def _to_jsonable(x):
    try:
        return float(x)
    except Exception:
        return str(x)


def endpoint_ssim(frames, src_a, src_b) -> "Dict[str, float]":
    """Endpoint-fidelity SSIM: frame 0 vs source A, last frame vs source B.

    The BASELINE tracked metric is SSIM vs the reference's output frames;
    the reference tree is unavailable (SURVEY.md section 0), so every run
    emits this self-fidelity stand-in instead — at t=0/1 the morph must
    reproduce its inputs, which catches warp/blend regressions in the same
    units the eventual reference comparison will use.
    """
    import jax.numpy as jnp

    f0 = jnp.asarray(frames[0])
    f1 = jnp.asarray(frames[-1])
    a = jnp.asarray(src_a, f0.dtype)
    b = jnp.asarray(src_b, f0.dtype)
    s0, s1 = _jitted_endpoint_measure()(f0, f1, a, b)
    return {"ssim_t0_vs_a": round(float(s0), 5), "ssim_t1_vs_b": round(float(s1), 5)}


@_lru_cache(maxsize=None)
def _jitted_endpoint_measure():
    # ONE jit: eager per-op dispatch pays ~30 ms tunnel latency each on the
    # production backend (PERF.md methodology)
    import jax
    import jax.numpy as jnp

    from videomorphing_tpu.ops.ssim import dssim_map

    @jax.jit
    def measure(f0, f1, a, b):
        sl = (slice(2, -2), slice(2, -2))  # warps edge-clamp the 1-px border
        return (
            1.0 - jnp.mean(dssim_map(f0[sl], a[sl])),
            1.0 - jnp.mean(dssim_map(f1[sl], b[sl])),
        )

    return measure


def midpoint_agreement_ssim(v, i0, i1, crop: int = 4) -> "Dict[str, float]":
    """Correspondence-quality instrument for ARBITRARY inputs: SSIM between
    the two one-sided halfway reconstructions I0(phi0(p)) and I1(phi1(p)).

    A correct field aligns the warped sources on the halfway domain, so
    their SSIM is high; a wrong-but-smooth field leaves them misaligned —
    the failure mode the endpoint metric cannot see (VERDICT round 1). This
    is exactly E_SIM's alignment objective read back out as a metric, in
    the same units as the eventual reference comparison. Emitted by every
    CLI run; the analytic golden gate lives in ``utils.golden``.
    """
    import jax.numpy as jnp

    v = jnp.asarray(v)
    i0 = jnp.asarray(i0, v.dtype)
    i1 = jnp.asarray(i1, v.dtype)
    s = float(_jitted_midpoint_measure()(v, i0, i1, crop))
    return {"ssim_halfway_agreement": round(s, 5)}


@_lru_cache(maxsize=None)
def _jitted_midpoint_measure():
    # ONE jit (see endpoint_ssim): this runs in every CLI invocation and
    # its eager form cost ~a second of tunnel latency at 1080p
    import functools

    import jax
    import jax.numpy as jnp

    from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords
    from videomorphing_tpu.ops.ssim import dssim_map

    @functools.partial(jax.jit, static_argnums=3)
    def measure(v, i0, i1, crop):
        g = grid_coords(v.shape[0], v.shape[1], v.dtype)
        w0 = bilinear_sample(i0, g - v)
        w1 = bilinear_sample(i1, g + v)
        sl = (slice(crop, -crop), slice(crop, -crop))
        return 1.0 - jnp.mean(dssim_map(w0[sl], w1[sl]))

    return measure
