"""End-to-end quality + speed probe for pack_dtype="bfloat16" (TODO perf #2).

Run from /root/repo on the TPU:  python scripts/probe_bf16.py [--h 480 --w 854]

Method follows PERF.md "Quality gates for every speed knob": same on-device
synthetic clip pair morphed with the f32 pack (the oracle default) and the
bf16 pack; report mean-abs / p99 / max frame difference, golden midpoint
SSIM under bf16, and the measured wall-clock delta. The decision rule used
for every previous knob: flip the default only if p99 stays in the same
band as the accepted knobs (~2e-4) AND the speedup is real.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.video.pipeline import morph_video

from bench import _make_clips_device  # on-device clip synthesis (no tunnel I/O)


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def run(mp, t_len, h, w, seed):
    gen = jax.jit(lambda s: _make_clips_device(t_len, h, w, s))
    ca, cb = gen(jnp.int32(seed))
    ca.block_until_ready(); cb.block_until_ready()
    t0 = time.perf_counter()
    res = morph_video(ca, cb, mp=mp, sp=SynthParams(), vp=VideoParams(), render=True)
    fetch(res.frames[-1])
    return res.frames, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    mp32 = MorphParams()
    mp16 = dataclasses.replace(mp32, pack_dtype="bfloat16")
    seed = int(time.time_ns()) % (1 << 31)

    f32, t32c = run(mp32, args.frames, args.h, args.w, seed)
    f16, t16c = run(mp16, args.frames, args.h, args.w, seed)
    # timed pass on FRESH content (runtime result-caches identical inputs)
    seed2 = int(time.time_ns()) % (1 << 31)
    _, t32 = run(mp32, args.frames, args.h, args.w, seed2)
    seed3 = int(time.time_ns()) % (1 << 31)
    _, t16 = run(mp16, args.frames, args.h, args.w, seed3)

    d = np.abs(np.asarray(f32, np.float32) - np.asarray(f16, np.float32))
    print(f"frame diff (f32 pack vs bf16 pack, {args.frames}x{args.h}x{args.w}):")
    print(f"  mean={d.mean():.2e}  p99={np.percentile(d, 99):.2e}  max={d.max():.2e}")
    print(f"wall: f32 {t32:.2f}s  bf16 {t16:.2f}s  speedup {t32 / t16:.3f}x"
          f"  (compile passes: {t32c:.1f}/{t16c:.1f}s)")

    # golden midpoint fidelity under bf16 (the hard gate)
    from videomorphing_tpu.utils.golden import run_golden

    worst = 1.0
    for name in ("translation", "rotation"):
        m = run_golden(name, hw=(256, 256), mp=mp16)
        worst = min(worst, float(m["ssim_mid"]))
        print(f"golden[{name}] bf16: ssim_mid={float(m['ssim_mid']):.5f} "
              f"v_err_mean={float(m['v_err_mean']):.4f}px")
    print(f"golden worst (bf16): {worst:.5f}  (gate: >= 0.99)")


if __name__ == "__main__":
    main()
