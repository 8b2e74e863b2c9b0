"""Determinism tests — the rebuild's race-detection instrument.

The reference relies on checkerboard coloring for write-safety
(correctness-by-construction); SURVEY.md section 6 prescribes the same
argument here PLUS bitwise-identical rerun tests: any read-write hazard in
a kernel or a nondeterministic reduction would break exact reproducibility.
"""

import numpy as np
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.solver.ctf import optimize_pair
from videomorphing_tpu.synth.render import render_frame


def _pair(rng, h=40, w=48):
    i0 = rng.random((h, w, 3), dtype=np.float32)
    for _ in range(2):
        i0 = 0.25 * (
            np.roll(i0, 1, 0) + np.roll(i0, -1, 0)
            + np.roll(i0, 1, 1) + np.roll(i0, -1, 1)
        )
    i1 = np.roll(i0, 3, axis=1)
    return jnp.asarray(i0), jnp.asarray(i1)


def test_solver_bitwise_deterministic(rng):
    i0, i1 = _pair(rng)
    mp = MorphParams(n_levels=2, iters_coarse=15)
    a = np.asarray(optimize_pair(i0, i1, params=mp).v)
    b = np.asarray(optimize_pair(i0, i1, params=mp).v)
    np.testing.assert_array_equal(a, b)


def test_render_bitwise_deterministic(rng):
    i0, i1 = _pair(rng)
    v = jnp.zeros(i0.shape[:2] + (2,), jnp.float32).at[..., 1].set(1.5)
    sp = SynthParams()
    a = np.asarray(render_frame(i0, i1, v, None, 0.37, sp))
    b = np.asarray(render_frame(i0, i1, v, None, 0.37, sp))
    np.testing.assert_array_equal(a, b)


def test_video_scan_bitwise_deterministic(rng):
    from videomorphing_tpu.config import VideoParams
    from videomorphing_tpu.video.pipeline import solve_clip_fields

    i0, i1 = _pair(rng, 32, 32)
    clip_a = jnp.stack([i0, jnp.roll(i0, 1, axis=1)])
    clip_b = jnp.stack([i1, jnp.roll(i1, 1, axis=1)])
    mp = MorphParams(n_levels=2, iters_coarse=10)
    vp = VideoParams(flow_iters=15)
    a, _, _ = solve_clip_fields(clip_a, clip_b, None, mp, vp)
    b, _, _ = solve_clip_fields(clip_a, clip_b, None, mp, vp)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
