"""The video morphing pipeline: flows once, frame 0 cold, then one
``lax.scan`` over frames carrying the converged field [EGSR14; SURVEY.md
section 4 stack C].

Frame 0 solves the full coarse-to-fine pyramid. Every later frame is
warm-started from the temporally advected field and only needs the finest
levels with few iterations — the source of the reference's big per-frame
speedup on video, kept here as a STATIC two-level warm solve so the whole
T-1 frame loop compiles to one device-resident scan (no host round-trips
between frames, unlike the reference which crosses H<->D once per frame).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.ops.pyramid import downsample_2x, pyramid_shapes
from videomorphing_tpu.solver.constraints import (
    rasterize_point_constraints,
    scale_points,
)
from videomorphing_tpu.solver.ctf import optimize_pair, resample_field
from videomorphing_tpu.solver.descent import make_level_solver
from videomorphing_tpu.solver.energy import make_level_data
from videomorphing_tpu.synth.paths import bulge_field
from videomorphing_tpu.synth.render import render_frame
from videomorphing_tpu.video.flow import clip_flows
from videomorphing_tpu.video.occlusion import occlusion_confidence
from videomorphing_tpu.video.temporal import (
    advect_halfway_field,
    track_keyframe_points,
)


class VideoResult(NamedTuple):
    fields: jnp.ndarray            # (T, H, W, 2) converged halfway fields
    bulges: Optional[jnp.ndarray]  # (T, H, W, 2) quadratic-path bulges
    frames: Optional[jnp.ndarray]  # (T, H, W, C) rendered morph frames
    tracked_points: Optional[jnp.ndarray]  # (T, N, 2, 2) tracked UI pairs
    solve_iters: Optional[jnp.ndarray] = None  # scalar: total optimizer
    # iterations across the cold solve + warm scan (the blocked multi-
    # device path psums per-block counts, padded repeat-frames included);
    # feeds the BASELINE "iters/sec/Mpixel" metric in bench.py


def warm_level_count(hw: Tuple[int, int], vp: VideoParams) -> int:
    """Resolve ``vp.warm_levels`` (0 = auto) for a frame size.

    Auto: 1 level (full res only) up to ~1080p, 3 above. The half-res
    "mid" safety level was the round-1..3 default; round 4 measured it
    against the stressor's analytic ground truth (fast occluder + motion
    discontinuity + lighting drift — exactly the advect-failure content
    the level existed for) and the single-level warm solve holds the gate
    (robust mid-SSIM 0.9091 vs 0.9091, hs -0.001; PERF.md round 4) while
    cutting the 1080p warm scan 5.96 -> ~3.8-4.4 s (no per-frame a/b/tc_w
    pyramids, no mid solve, no tc_v resample). 4K keeps the 3-level net:
    its advect confidence was never probed at 1 level and a bad warm
    start there has no coarse recovery (VERDICT round 1 weak #8). Always
    clamped so the coarsest level stays >= 8 px.
    """
    h, w = hw
    n = vp.warm_levels or (1 if h * w <= 2_400_000 else 3)
    n = max(1, n)
    while n > 1 and min(pyramid_shapes(h, w, n)[n - 1]) < 8:
        n -= 1
    return n


def _make_warm_solver(mp: MorphParams, hw: Tuple[int, int], vp: VideoParams = VideoParams()):
    """Static coarse-to-fine warm solve used inside the frame scan.

    ``warm_level_count`` levels (auto since round 4: full res only up to
    ~1080p, 3 levels above — see :func:`warm_level_count`); iteration
    caps come from ``vp.warm_iters_mid`` (every non-finest level) and
    ``vp.warm_iters_fine`` (finest) — warm-started frames need far fewer
    iterations than a cold start [EGSR14 s4].
    """
    h, w = hw
    n = warm_level_count(hw, vp)
    shapes = pyramid_shapes(h, w, n)
    if vp.warm_relin_every:
        import dataclasses

        mp = dataclasses.replace(mp, relin_every=vp.warm_relin_every)
    solvers = [
        make_level_solver(mp, vp.warm_iters_fine if lv == 0 else vp.warm_iters_mid)
        for lv in range(n)
    ]

    def warm_solve(a, b, points, v_init, tc_v, tc_w):
        pyr_a, pyr_b, pyr_tcw = [a], [b], [tc_w]
        for _ in range(n - 1):
            pyr_a.append(downsample_2x(pyr_a[-1]))
            pyr_b.append(downsample_2x(pyr_b[-1]))
            pyr_tcw.append(downsample_2x(pyr_tcw[-1]))

        v = v_init
        e_coarse = e_fine = None
        iters_total = 0
        for lv in range(n - 1, -1, -1):
            lhw = shapes[lv]
            pts_l = scale_points(points, (h, w), lhw)
            ui_w_l, ui_v_l = rasterize_point_constraints(pts_l, lhw, mp.ui_sigma, a.dtype)
            tc_v_l = tc_v if lhw == (h, w) else resample_field(tc_v, lhw)
            v = v if v.shape[:2] == lhw else resample_field(v, lhw)
            data_l = make_level_data(pyr_a[lv], pyr_b[lv], ui_w_l, ui_v_l, pyr_tcw[lv], tc_v_l)
            v, st = solvers[lv](v, data_l)
            e_coarse = st.e_final if e_coarse is None else e_coarse
            e_fine = st.e_final
            iters_total = iters_total + st.iters
        return v, (e_coarse, e_fine, iters_total)

    return warm_solve


@functools.lru_cache(maxsize=None)
def _jitted_clip_flows_sharded(vp: VideoParams, mesh, axis: str):
    from videomorphing_tpu.video.flow import clip_flows_sharded

    return jax.jit(lambda clip: clip_flows_sharded(clip, vp, mesh, axis))


@functools.lru_cache(maxsize=None)
def _jitted_clip_flows(vp: VideoParams):
    """One jitted computation for both flow directions of one clip.

    Everything between host calls must live under jit: this TPU is behind a
    remote tunnel, so each eager op pays a full round trip — the unjitted
    flow phase was ~100x slower than the same math under one jit.
    """
    return jax.jit(lambda clip: clip_flows(clip, vp))


@functools.lru_cache(maxsize=None)
def _jitted_frame_scan(mp: MorphParams, vp: VideoParams, hw: Tuple[int, int]):
    """The warm-started per-frame scan as ONE jitted device program."""
    h, w = hw
    warm_solve = _make_warm_solver(mp, hw, vp)

    def run(clip_a_rest, clip_b_rest, v0, ptss_rest, fa_fwd, fb_fwd):
        dtype = clip_a_rest.dtype

        def scan_body(v_prev, xs):
            a_t, b_t, pts_t, fa_t, fb_t = xs
            if vp.propagate:
                tc_v, tc_w = advect_halfway_field(v_prev, fa_t, fb_t, vp)
            else:
                tc_v = jnp.zeros_like(v_prev)
                tc_w = jnp.zeros((h, w, 1), dtype)
            v_t, aux = warm_solve(
                a_t, b_t, pts_t,
                tc_v if vp.propagate else jnp.zeros_like(v_prev), tc_v, tc_w,
            )
            return v_t, (v_t, aux[2])

        xs = (clip_a_rest, clip_b_rest, ptss_rest, fa_fwd, fb_fwd)
        _vf, (vs, iters) = jax.lax.scan(scan_body, v0, xs)
        return vs, jnp.sum(iters)

    return jax.jit(run)


def solve_clip_fields(
    clip_a: jnp.ndarray,
    clip_b: jnp.ndarray,
    points: Optional[jnp.ndarray] = None,
    mp: MorphParams = MorphParams(),
    vp: VideoParams = VideoParams(),
    mesh=None,
    mesh_axis: str = "batch",
    return_stats: bool = False,
):
    """Solve halfway fields for every frame pair of two clips (T, H, W, C).

    ``points`` may be a single (N, 2, 2) array (correspondences on frame 0,
    tracked forward — the simple case) or a mapping ``{frame_idx: (N,2,2)}``
    of KEYFRAME point sets [EGSR14 s3]: the same N point identities placed
    by the user on several frames, flow-tracked to the frames between and
    re-anchored at each keyframe (drift correction).

    Returns ``(fields (T,H,W,2), tracked (T,N,2,2), flows)`` where flows is
    the dict of per-clip fwd/bwd flows (reused for occlusion weighting).
    With ``return_stats=True`` a 4th element is appended: total optimizer
    iterations (scalar; on the blocked multi-device path it is the psum of
    per-block cold + warm counts).
    """
    t_len, h, w = clip_a.shape[0], clip_a.shape[1], clip_a.shape[2]
    dtype = clip_a.dtype

    # per-clip flows, once, mapped over frame pairs [EGSR14]; with a mesh
    # the pairs shard across devices (the blocked path of round 1 computed
    # flows replicated — every device solved every pair)
    if mesh is not None and int(mesh.shape[mesh_axis]) > 1 and t_len > 2:
        flows_fn = _jitted_clip_flows_sharded(vp, mesh, mesh_axis)
    else:
        flows_fn = _jitted_clip_flows(vp)
    fa_fwd, fa_bwd = flows_fn(clip_a)
    fb_fwd, fb_bwd = flows_fn(clip_b)
    flows = dict(fa_fwd=fa_fwd, fa_bwd=fa_bwd, fb_fwd=fb_fwd, fb_bwd=fb_bwd)

    # normalize points to keyframe form and track to every frame
    if points is None:
        key_idx, key_pts = [0], jnp.zeros((1, 0, 2, 2), dtype)
    elif isinstance(points, dict):
        key_idx = sorted(int(k) for k in points)
        key_pts = jnp.stack([jnp.asarray(points[k], dtype) for k in key_idx])
    else:
        key_idx, key_pts = [0], jnp.asarray(points, dtype)[None]
    tracked = _jitted_track(t_len, tuple(key_idx), mp, vp)(
        key_pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd
    )

    # frame blocks across the mesh (config 4: "frames batched across TPU
    # cores") when a mesh is provided; clips that don't divide evenly are
    # padded by repeating the last frame (zero flow between the repeats is
    # the true flow) and the padded fields trimmed — no silent sequential
    # fallback (VERDICT round 1 weak #7)
    if mesh is not None and t_len > 1:
        n_dev = int(mesh.shape[mesh_axis])
        if n_dev > 1:
            from videomorphing_tpu.parallel.video_blocks import (
                solve_clip_fields_blocked,
            )

            pad = (-t_len) % n_dev

            def _pad_frames(x):
                if pad == 0:
                    return x
                return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0)

            def _pad_flows(f):
                if pad == 0:
                    return f
                z = jnp.zeros((pad,) + f.shape[1:], f.dtype)
                return jnp.concatenate([f, z], 0)

            flows_p = dict(
                fa_fwd=_pad_flows(fa_fwd), fb_fwd=_pad_flows(fb_fwd),
                fa_bwd=_pad_flows(flows["fa_bwd"]), fb_bwd=_pad_flows(flows["fb_bwd"]),
            )
            fields, blk_iters = solve_clip_fields_blocked(
                _pad_frames(clip_a), _pad_frames(clip_b), _pad_frames(tracked),
                flows_p, mesh, mp, vp, mesh_axis,
            )
            fields = fields[:t_len]
            if return_stats:
                return fields, tracked, flows, blk_iters
            return fields, tracked, flows

    # frame 0: cold full-pyramid solve
    res0 = optimize_pair(clip_a[0], clip_b[0], points=tracked[0], params=mp)
    v0 = res0.v
    cold_iters = sum(s.iters for s in res0.level_stats)

    if t_len == 1:
        if return_stats:
            return v0[None], tracked, flows, cold_iters
        return v0[None], tracked, flows

    vs, warm_iters = _jitted_frame_scan(mp, vp, (h, w))(
        clip_a[1:], clip_b[1:], v0, tracked[1:], fa_fwd, fb_fwd
    )

    fields = jnp.concatenate([v0[None], vs], axis=0)
    if return_stats:
        return fields, tracked, flows, cold_iters + warm_iters
    return fields, tracked, flows


@functools.lru_cache(maxsize=None)
def _jitted_track(t_len: int, key_idx: Tuple[int, ...], mp: MorphParams, vp: VideoParams):
    def run(key_pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd):
        return track_keyframe_points(
            t_len, key_idx, key_pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _jitted_confidences(vp: VideoParams):
    def run(fwd, bwd):
        # lax.map, NOT vmap: occlusion_confidence rides the fused sampler
        # on TPU, whose per-band fast/fallback lax.conds a vmap would
        # flatten into run-both-branches selects (the same regression the
        # renderer hit — synth/render.py lax.map note). Sequential over
        # frames also keeps peak memory single-frame.
        conf_mid = jax.lax.map(
            lambda fb: occlusion_confidence(fb[0], fb[1], vp), (fwd, bwd)
        )
        # last frame: reuse the final pair's reverse direction
        conf_last = occlusion_confidence(bwd[-1], fwd[-1], vp)[None]
        return jnp.concatenate([conf_mid, conf_last], axis=0)

    return jax.jit(run)


def _clip_confidences(fwd, bwd, t_len, vp):
    """Per-frame visibility confidence (T, H, W): frame t vs its neighbor."""
    return _jitted_confidences(vp)(fwd, bwd)


@functools.lru_cache(maxsize=None)
def _jitted_bulges(sp: SynthParams):
    # lax.map (sequential scan), NOT vmap: vmapping the DCT solves over a
    # whole 1080p clip materializes every frame's spectral intermediates at
    # once and OOMs 16 GB HBM; per-frame synthesis is milliseconds, so a
    # scan is just as fast and peak memory stays single-frame.
    return jax.jit(lambda fields: jax.lax.map(lambda v: bulge_field(v, sp), fields))


@functools.lru_cache(maxsize=None)
def _jitted_video_render(sp: SynthParams):
    def run(clip_a, clip_b, fields, bulges, times, conf_a, conf_b):
        def render_one(args):
            a, b, v, bl, t, ca, cb = args
            return render_frame(a, b, v, bl, t, sp, conf0=ca, conf1=cb)

        # sequential over frames for the same memory reason as _jitted_bulges
        return jax.lax.map(
            render_one, (clip_a, clip_b, fields, bulges, times, conf_a, conf_b)
        )

    return jax.jit(run)


def morph_video(
    clip_a: jnp.ndarray,
    clip_b: jnp.ndarray,
    points: Optional[jnp.ndarray] = None,
    times: Optional[jnp.ndarray] = None,
    mp: MorphParams = MorphParams(),
    sp: SynthParams = SynthParams(),
    vp: VideoParams = VideoParams(),
    render: bool = True,
    mesh=None,
) -> VideoResult:
    """Full video morph: solve fields, bend paths, render the transition.

    ``times``: per-frame morph time t_k (default: linear 0 -> 1 A-to-B
    transition across the clip [EGSR14 s5]). Pass a 1-D ``mesh`` to solve
    frame BLOCKS across devices (config 4) when the clip length divides.
    """
    t_len = clip_a.shape[0]
    fields, tracked, flows, iters = solve_clip_fields(
        clip_a, clip_b, points, mp, vp, mesh=mesh, return_stats=True
    )
    res = render_video(
        clip_a, clip_b, fields, times=times, sp=sp, vp=vp,
        flows=flows, render=render, mesh=mesh,
    )
    return res._replace(tracked_points=tracked, solve_iters=iters)


def render_video(
    clip_a: jnp.ndarray,
    clip_b: jnp.ndarray,
    fields: jnp.ndarray,
    times: Optional[jnp.ndarray] = None,
    sp: SynthParams = SynthParams(),
    vp: VideoParams = VideoParams(),
    bulges: Optional[jnp.ndarray] = None,
    flows: Optional[dict] = None,
    render: bool = True,
    mesh=None,
    mesh_axis: str = "batch",
) -> VideoResult:
    """Synthesis half of the pipeline: paths + occlusion-aware render.

    Separated from the solve so a run can re-render from a checkpointed
    field store without re-optimizing (SURVEY.md section 6 checkpoint/
    resume — the reference caches converged fields for exactly this).
    ``flows`` (from :func:`solve_clip_fields`) are recomputed if absent and
    occlusion weighting is on. With a ``mesh``, frames shard across
    devices (synthesis is embarrassingly parallel — the config-4 story's
    other half).
    """
    t_len = clip_a.shape[0]
    use_sharded = (
        render and mesh is not None and int(mesh.shape[mesh_axis]) > 1 and t_len > 1
    )
    if bulges is None and sp.quadratic_paths and not use_sharded:
        bulges = _jitted_bulges(sp)(fields)

    frames = None
    if render:
        if times is None:
            times = jnp.linspace(0.0, 1.0, t_len, dtype=clip_a.dtype)
        need_occl = sp.occlusion_weighting and t_len > 1
        if need_occl and flows is None:
            flows_fn = _jitted_clip_flows(vp)
            fa_fwd, fa_bwd = flows_fn(clip_a)
            fb_fwd, fb_bwd = flows_fn(clip_b)
            flows = dict(fa_fwd=fa_fwd, fa_bwd=fa_bwd, fb_fwd=fb_fwd, fb_bwd=fb_bwd)

        if use_sharded:
            from videomorphing_tpu.parallel.frames import render_video_frames_sharded

            # per-frame occlusion-flow inputs, computed IN the sharded
            # program (no serial full-clip confidence pass between the
            # sharded solve and the sharded render): frame t uses
            # (fwd_t, bwd_t); the last frame reuses the final pair's
            # reverse direction — same convention as _jitted_confidences
            conf_flows = None
            if need_occl:
                conf_flows = (
                    jnp.concatenate([flows["fa_fwd"], flows["fa_bwd"][-1:]], 0),
                    jnp.concatenate([flows["fa_bwd"], flows["fa_fwd"][-1:]], 0),
                    jnp.concatenate([flows["fb_fwd"], flows["fb_bwd"][-1:]], 0),
                    jnp.concatenate([flows["fb_bwd"], flows["fb_fwd"][-1:]], 0),
                )
            sh_bulges, frames = render_video_frames_sharded(
                clip_a, clip_b, fields, times, mesh, sp, vp, mesh_axis,
                bulges=bulges, conf_flows=conf_flows,
            )
            if bulges is None and sp.quadratic_paths:
                bulges = sh_bulges
        else:
            if need_occl:
                conf_a = _clip_confidences(flows["fa_fwd"], flows["fa_bwd"], t_len, vp)
                conf_b = _clip_confidences(flows["fb_fwd"], flows["fb_bwd"], t_len, vp)
            else:
                conf_a = jnp.ones(clip_a.shape[:3], clip_a.dtype)
                conf_b = conf_a
            bl_arg = bulges if bulges is not None else jnp.zeros_like(fields)
            frames = _jitted_video_render(sp)(
                clip_a, clip_b, fields, bl_arg, times, conf_a, conf_b
            )

    return VideoResult(fields=fields, bulges=bulges, frames=frames, tracked_points=None)


def resume_clip_fields(
    clip_a: jnp.ndarray,
    clip_b: jnp.ndarray,
    v_prev,
    start: int,
    points: Optional[jnp.ndarray] = None,
    mp: MorphParams = MorphParams(),
    vp: VideoParams = VideoParams(),
) -> jnp.ndarray:
    """Continue a partially solved clip from frame ``start``.

    ``v_prev`` is the converged field of frame ``start - 1`` (from a
    :class:`videomorphing_tpu.utils.checkpoint.FieldStore`). Returns the
    fields of frames [start, T) — the same warm-started scan the full solve
    runs, entered mid-clip.
    """
    t_len, h, w = clip_a.shape[0], clip_a.shape[1], clip_a.shape[2]
    assert 1 <= start < t_len
    dtype = clip_a.dtype

    flows_fn = _jitted_clip_flows(vp)
    fa_fwd, fa_bwd = flows_fn(clip_a)
    fb_fwd, fb_bwd = flows_fn(clip_b)

    if points is None:
        key_idx, key_pts = [0], jnp.zeros((1, 0, 2, 2), dtype)
    elif isinstance(points, dict):
        key_idx = sorted(int(k) for k in points)
        key_pts = jnp.stack([jnp.asarray(points[k], dtype) for k in key_idx])
    else:
        key_idx, key_pts = [0], jnp.asarray(points, dtype)[None]
    tracked = _jitted_track(t_len, tuple(key_idx), mp, vp)(
        key_pts, fa_fwd, fa_bwd, fb_fwd, fb_bwd
    )

    vs, _iters = _jitted_frame_scan(mp, vp, (h, w))(
        clip_a[start:], clip_b[start:],
        jnp.asarray(v_prev, dtype),
        tracked[start:], fa_fwd[start - 1:], fb_fwd[start - 1:],
    )
    return vs
