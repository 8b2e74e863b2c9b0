"""Quality + speed probe for ANY config knob.

Run from /root/repo on the TPU:

    python scripts/probe_knob.py --set video.flow_scale=0.25 [--h 480 --w 854]

Method follows PERF.md "Quality gates for every speed knob": the same
on-device synthetic clip pair is morphed with the default config and with
the overridden config; report mean-abs / p99 / max frame difference, the
golden midpoint SSIM under the override, and the measured wall-clock
delta. Decision rule used for every accepted knob so far: flip a default
only if p99 stays in the band of the accepted knobs (~2e-4) AND the
speedup is real.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.cli import _apply_set_overrides
from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.video.pipeline import morph_video

from bench import _make_clips_device  # on-device clip synthesis (no tunnel I/O)


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def run(mp, sp, vp, t_len, h, w, seed):
    gen = jax.jit(lambda s: _make_clips_device(t_len, h, w, s))
    ca, cb = gen(jnp.int32(seed))
    ca.block_until_ready(); cb.block_until_ready()
    t0 = time.perf_counter()
    res = morph_video(ca, cb, mp=mp, sp=sp, vp=vp, render=True)
    fetch(res.frames[-1])
    return res.frames, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[], metavar="SEC.FIELD=VAL",
                    help="override(s) to probe against the defaults")
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--platform", default=None,
                    help="cpu/tpu — the axon plugin ignores JAX_PLATFORMS; "
                    "this is the only reliable off-chip switch")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not getattr(args, "set"):
        ap.error("at least one --set SEC.FIELD=VAL is required")

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    base = (MorphParams(), SynthParams(), VideoParams())
    probe = _apply_set_overrides(getattr(args, "set"), *base)
    print("probing:", ", ".join(getattr(args, "set")))

    seed = int(time.time_ns()) % (1 << 31)
    f_base, tc_b = run(*base, args.frames, args.h, args.w, seed)
    f_probe, tc_p = run(*probe, args.frames, args.h, args.w, seed)
    # timed pass on FRESH content (runtime result-caches identical inputs)
    _, t_base = run(*base, args.frames, args.h, args.w,
                    int(time.time_ns()) % (1 << 31))
    _, t_probe = run(*probe, args.frames, args.h, args.w,
                     int(time.time_ns()) % (1 << 31))

    d = np.abs(np.asarray(f_base, np.float32) - np.asarray(f_probe, np.float32))
    print(f"frame diff (default vs probe, {args.frames}x{args.h}x{args.w}):")
    print(f"  mean={d.mean():.2e}  p99={np.percentile(d, 99):.2e}  max={d.max():.2e}")
    print(f"wall: default {t_base:.2f}s  probe {t_probe:.2f}s  "
          f"speedup {t_base / t_probe:.3f}x  (compile passes: {tc_b:.1f}/{tc_p:.1f}s)")

    # golden midpoint fidelity under the override (the hard gate); video
    # knobs don't reach the pair path, but running it is cheap insurance
    from videomorphing_tpu.utils.golden import run_golden

    worst = 1.0
    for name in ("translation", "rotation", "scale"):
        m = run_golden(name, hw=(256, 256), mp=probe[0], sp=probe[1])
        worst = min(worst, float(m["ssim_mid"]))
        print(f"golden[{name}] probe: ssim_mid={float(m['ssim_mid']):.5f} "
              f"v_err_mean={float(m['v_err_mean']):.4f}px")
    print(f"golden worst (probe): {worst:.5f}  (gate: >= 0.99)")


if __name__ == "__main__":
    main()
