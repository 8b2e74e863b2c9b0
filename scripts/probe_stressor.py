"""The robust-flow / occlusion-threshold decision probe (VERDICT r2 #5).

Runs the real-footage-class stressor (utils.stressor: moving occluder +
motion discontinuity + per-clip lighting drift, analytic ground truth)
at 480p and measures, for flow_robust OFF vs ON:

- background flow EPE (isolates the lighting-drift failure mode),
- foreground (disk) flow EPE (large-displacement capture),
- occlusion detection F1 across an occlusion_thresh sweep,
- END-TO-END morph quality: SSIM of rendered blend-0.5 frames vs the
  analytic true mid frames (the metric that decides the default — flow
  only warm-starts/regularizes, so flow EPE alone can't justify a flip),
- wall clock of the flow phase and the full pipeline.

Run from /root/repo (TPU; CPU works too at reduced size):

    python scripts/probe_stressor.py [--h 480 --w 854 --frames 8] [--drift 0.12]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.utils.cache import enable_compile_cache
from videomorphing_tpu.utils.stressor import (
    flow_epe,
    make_stressor,
    midframe_ssim,
    occlusion_f1,
)
from videomorphing_tpu.video.flow import clip_flows
from videomorphing_tpu.video.occlusion import occlusion_confidence
from videomorphing_tpu.video.pipeline import morph_video


def fetch(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--drift", type=float, default=0.12)
    ap.add_argument("--threshes", type=float, nargs="*", default=[0.5, 1.0, 2.0])
    ap.add_argument("--median", action="store_true",
                    help="relin_median on (the solver's outlier-rejection "
                    "knob) — lets the same probe decide THAT default too")
    ap.add_argument("--platform", default=None,
                    help="cpu/tpu — the axon plugin ignores JAX_PLATFORMS; "
                    "this is the only reliable off-chip switch")
    ap.add_argument("--set", action="append", default=[],
                    metavar="SEC.FIELD=VAL",
                    help="config override(s), same syntax as the CLI — the "
                    "stressor's analytic mid-frame gate then referees the "
                    "overridden config (quality vs ground truth, not vs "
                    "the default output)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    enable_compile_cache()
    print("backend:", jax.default_backend(), jax.devices())
    case = make_stressor(args.frames, args.h, args.w, seed=11, drift=args.drift)
    fetch(case.clip_a)
    times = jnp.full((args.frames,), 0.5, jnp.float32)
    mp, sp = MorphParams(), SynthParams()
    if args.median:
        mp = dataclasses.replace(mp, relin_median=True)
    vp_base = VideoParams()
    if getattr(args, "set"):
        from videomorphing_tpu.cli import _apply_set_overrides

        if any(s.startswith("video.flow_robust=") for s in getattr(args, "set")):
            # the probe loop sweeps flow_robust over BOTH values itself; a
            # user-supplied override would be silently clobbered (ADVICE r4)
            ap.error("--set video.flow_robust is swept by this probe; drop it")
        mp, sp, vp_base = _apply_set_overrides(getattr(args, "set"), mp, sp, vp_base)

    report = {"h": args.h, "w": args.w, "frames": args.frames,
              "drift": args.drift, "median": args.median,
              "set": getattr(args, "set"), "configs": {}}
    for robust in (False, True):
        vp = dataclasses.replace(vp_base, flow_robust=robust)
        tag = "robust" if robust else "hs_default"

        # flow phase alone (jitted; timed on the second call)
        flows_j = jax.jit(lambda c: clip_flows(c, vp))
        fwd_a, bwd_a = flows_j(case.clip_a)
        fetch(fwd_a)
        t0 = time.perf_counter()
        fwd_a, bwd_a = flows_j(case.clip_a)
        fwd_b, bwd_b = flows_j(case.clip_b)
        fetch(fwd_a); fetch(fwd_b)
        t_flow = time.perf_counter() - t0

        bg_a = case.valid_a & ~case.disk_a
        fg_a = case.valid_a & case.disk_a
        epe_bg = flow_epe(fwd_a, case.flow_a_true, bg_a)
        epe_fg = flow_epe(fwd_a, case.flow_a_true, fg_a)

        occ = {}
        for th in args.threshes:
            vpo = dataclasses.replace(vp, occlusion_thresh=th)
            conf = jax.jit(
                jax.vmap(lambda f, b: occlusion_confidence(f, b, vpo))
            )(fwd_a, bwd_a)
            occ[str(th)] = {
                k: round(v, 4)
                for k, v in occlusion_f1(conf, case.occ_a).items()
            }

        # end-to-end: full pipeline at blend 0.5, compile pass then timed
        def run():
            res = morph_video(
                case.clip_a, case.clip_b, points={0: case.points},
                times=times, mp=mp, sp=sp, vp=vp, render=True,
            )
            fetch(res.frames[-1])
            return res

        res = run()
        t0 = time.perf_counter()
        res = run()
        t_e2e = time.perf_counter() - t0
        quality = midframe_ssim(res.frames, case)

        report["configs"][tag] = {
            "flow_wall_s": round(t_flow, 3),
            "e2e_wall_s": round(t_e2e, 3),
            "epe_bg": {k: round(v, 4) for k, v in epe_bg.items()},
            "epe_fg": {k: round(v, 4) for k, v in epe_fg.items()},
            "occlusion_by_thresh": occ,
            "ssim_mid_mean": round(quality["ssim_mid_mean"], 5),
            "ssim_mid_min": round(quality["ssim_mid_min"], 5),
        }
        print(json.dumps({"config": tag, **report["configs"][tag]}))

    # cross-dissolve baseline for scale
    from videomorphing_tpu.utils.golden import ssim

    dis = 0.5 * (case.clip_a + case.clip_b)
    base = float(np.mean([
        ssim(dis[t], case.mid_true[t], crop=case.crop)
        for t in range(args.frames)
    ]))
    report["cross_dissolve_ssim"] = round(base, 5)
    print(json.dumps({"metric": "stressor_probe", **report}))


if __name__ == "__main__":
    main()
