"""Phase breakdown of the north-star workload (30-frame 1080p morph).

Run from /root/repo on the TPU:  python scripts/profile_northstar.py

Times each pipeline phase separately with the PERF.md methodology (fresh
on-device content per timed pass, scalar-fetch barriers), so the
round-3+ perf roadmap is chosen from current data rather than the round-2
table (flows 9.3 / cold 2.2 / warm 2.9-per-5-frames / paths 0.7 / render
2.3 at 6 frames — superseded by the split-pack and lax.map changes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.solver.ctf import optimize_pair
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.video.pipeline import (
    _clip_confidences,
    _jitted_bulges,
    _jitted_clip_flows,
    _jitted_frame_scan,
    _jitted_track,
    _jitted_video_render,
)

from bench import _make_clips_device


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--platform", default=None,
                    help="cpu/tpu — the axon plugin ignores JAX_PLATFORMS; "
                    "this is the only reliable off-chip switch")
    ap.add_argument("--trace", default=None,
                    help="directory: capture per-phase jax.profiler traces "
                    "(warm_scan + render, the two largest phases) for "
                    "scripts/trace_summary.py")
    ap.add_argument("--median", action="store_true",
                    help="relin_median: 3x3 field median at each relin "
                    "(default ON since round 4; kept for A/B symmetry)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="SEC.FIELD=VAL",
                    help="config override(s), same syntax as the CLI "
                    "(e.g. --set video.warm_relin_every=12)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    t_len, h, w = args.frames, args.h, args.w

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    mp, sp, vp = MorphParams(), SynthParams(), VideoParams()
    if args.median:
        import dataclasses

        mp = dataclasses.replace(mp, relin_median=True)
    if getattr(args, "set"):
        from videomorphing_tpu.cli import _apply_set_overrides

        mp, sp, vp = _apply_set_overrides(getattr(args, "set"), mp, sp, vp)
    gen = jax.jit(lambda s: _make_clips_device(t_len, h, w, s))

    def phases(seed):
        ca, cb = gen(jnp.int32(seed))
        fetch(ca); fetch(cb)
        out = {}

        t0 = time.perf_counter()
        flows_fn = _jitted_clip_flows(vp)
        fa_fwd, fa_bwd = flows_fn(ca)
        fb_fwd, fb_bwd = flows_fn(cb)
        fetch(fa_fwd); fetch(fb_fwd)
        out["flows"] = time.perf_counter() - t0

        pts = jnp.zeros((1, 0, 2, 2), ca.dtype)
        t0 = time.perf_counter()
        tracked = _jitted_track(t_len, (0,), mp, vp)(
            pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd
        )
        fetch(tracked)
        out["track"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        res0 = optimize_pair(ca[0], cb[0], points=tracked[0], params=mp)
        fetch(res0.v)
        out["cold_solve"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        vs, _it = _jitted_frame_scan(mp, vp, (h, w))(
            ca[1:], cb[1:], res0.v, tracked[1:], fa_fwd, fb_fwd
        )
        fetch(vs)
        out["warm_scan"] = time.perf_counter() - t0
        fields = jnp.concatenate([res0.v[None], vs], 0)

        t0 = time.perf_counter()
        bulges = _jitted_bulges(sp)(fields)
        fetch(bulges)
        out["paths"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        conf_a = _clip_confidences(fa_fwd, fa_bwd, t_len, vp)
        conf_b = _clip_confidences(fb_fwd, fb_bwd, t_len, vp)
        fetch(conf_a); fetch(conf_b)
        out["occlusion"] = time.perf_counter() - t0

        times = jnp.linspace(0.0, 1.0, t_len, dtype=ca.dtype)
        t0 = time.perf_counter()
        frames = _jitted_video_render(sp)(
            ca, cb, fields, bulges, times, conf_a, conf_b
        )
        fetch(frames[-1])
        out["render"] = time.perf_counter() - t0
        return out

    phases(0)  # compile pass
    rec = phases(int(time.time_ns()) % (1 << 31))
    total = sum(rec.values())

    if args.trace:
        # fresh content (the runtime result-caches identical inputs), one
        # trace per hot phase so trace_summary.py attributes cleanly
        ca, cb = gen(jnp.int32(int(time.time_ns()) % (1 << 31)))
        fetch(ca); fetch(cb)
        flows_fn = _jitted_clip_flows(vp)
        fa_fwd, fa_bwd = flows_fn(ca)
        fb_fwd, fb_bwd = flows_fn(cb)
        pts = jnp.zeros((1, 0, 2, 2), ca.dtype)
        tracked = _jitted_track(t_len, (0,), mp, vp)(
            pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd
        )
        res0 = optimize_pair(ca[0], cb[0], points=tracked[0], params=mp)
        fetch(res0.v)
        with jax.profiler.trace(os.path.join(args.trace, "warm_scan")):
            vs, _it = _jitted_frame_scan(mp, vp, (h, w))(
                ca[1:], cb[1:], res0.v, tracked[1:], fa_fwd, fb_fwd
            )
            fetch(vs)
        fields = jnp.concatenate([res0.v[None], vs], 0)
        bulges = _jitted_bulges(sp)(fields)
        conf_a = _clip_confidences(fa_fwd, fa_bwd, t_len, vp)
        conf_b = _clip_confidences(fb_fwd, fb_bwd, t_len, vp)
        fetch(bulges); fetch(conf_a); fetch(conf_b)
        times = jnp.linspace(0.0, 1.0, t_len, dtype=ca.dtype)
        with jax.profiler.trace(os.path.join(args.trace, "render")):
            frames = _jitted_video_render(sp)(
                ca, cb, fields, bulges, times, conf_a, conf_b
            )
            fetch(frames[-1])
        ca3, _ = gen(jnp.int32(int(time.time_ns()) % (1 << 31)))
        fetch(ca3)  # fresh content: already-flowed clips are result-cached
        with jax.profiler.trace(os.path.join(args.trace, "flows")):
            fa3 = flows_fn(ca3)
            fetch(fa3[0])
        print("traces written under", args.trace)
    print(json.dumps({
        "metric": "northstar_phases",
        "frames": t_len, "h": h, "w": w,
        **{k: round(v, 3) for k, v in rec.items()},
        "total_s": round(total, 3),
        "fps": round(t_len / total, 4),
    }))


if __name__ == "__main__":
    main()
