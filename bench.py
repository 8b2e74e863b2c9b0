"""Benchmark entry point — prints ONE JSON line with the headline metric.

Workload: the BASELINE.json config-4 shape — a 1080p video-pair morph
(temporal warm-start optimization + quadratic paths + occlusion-aware
Poisson-extended blending), synthetic content so the bench has no I/O
dependency. Runs on whatever devices are visible (one chip under the
driver).

Metric: morph frames/sec at 1080p, steady state (compile excluded by a
warmup run of identical shapes).

Baseline: the north star is a 30-frame 1080p morph in <10 s on a v5e-8,
i.e. 3.0 frames/s on 8 chips = 0.375 frames/s per chip
(BASELINE.md "Rebuild targets"). vs_baseline = per-chip fps / 0.375.
Values > 1.0 beat the target rate pro-rated to the chips available.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _make_clips(t_len: int, h: int, w: int, seed: int = 0):
    """Synthetic but non-trivial content: textured moving blobs + gradient."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = rng.random((h, w, 3), dtype=np.float32)
    # smooth the texture a little so the data term has structure
    for _ in range(2):
        tex = 0.25 * (
            np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
            + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
        )
    base = 0.3 + 0.4 * tex + 0.2 * (xx / w)[..., None]

    def blob(cy, cx, s):
        return np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / s**2)[..., None]

    def clip(x0):
        frames = []
        for k in range(t_len):
            f = base + 0.5 * blob(h * 0.5, x0 + k * 2.0, h * 0.08)
            frames.append(np.clip(f, 0, 1))
        return np.stack(frames).astype(np.float32)

    return clip(w * 0.45), clip(w * 0.55)


def run_bench(t_len: int, h: int, w: int, repeats: int = 1):
    import jax
    import jax.numpy as jnp

    from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
    from videomorphing_tpu.video.pipeline import morph_video

    mp = MorphParams()
    sp = SynthParams()
    vp = VideoParams()

    def once(seed):
        # DISTINCT content per run: the TPU runtime caches (executable,
        # inputs) pairs, so re-running on identical clips returns cached
        # results in ~0 time and fakes the benchmark.
        a_np, b_np = _make_clips(t_len, h, w, seed=seed)
        clip_a = jax.device_put(jnp.asarray(a_np))
        clip_b = jax.device_put(jnp.asarray(b_np))
        res = morph_video(clip_a, clip_b, mp=mp, sp=sp, vp=vp, render=True)
        res.frames.block_until_ready()
        return res

    # warmup: compiles every shape involved (same shapes as the timed run)
    once(0)

    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        once(r + 1)
        best = min(best, time.perf_counter() - t0)
    return t_len / best, best


def main(argv=None) -> int:
    from videomorphing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    t_len = int(os.environ.get("BENCH_FRAMES", "6"))
    h = int(os.environ.get("BENCH_H", "1080"))
    w = int(os.environ.get("BENCH_W", "1920"))

    import jax

    n_chips = max(len(jax.devices()), 1)
    fps, wall = run_bench(t_len, h, w)
    per_chip = fps / n_chips
    baseline_per_chip = 3.0 / 8.0  # north star: 30 frames / 10 s on 8 chips

    print(
        json.dumps(
            {
                "metric": f"morph_frames_per_sec_{h}p",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(per_chip / baseline_per_chip, 4),
            }
        )
    )
    print(
        f"# {t_len} frames {w}x{h} in {wall:.2f}s on {n_chips} chip(s)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
