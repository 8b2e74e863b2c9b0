"""Temporal propagation of the halfway field [EGSR14 s4].

Given the converged field v_{t-1}, advect its two endpoints by the per-clip
flows and re-form a predicted field for frame t:

    x0 = p - v,   x1 = p + v
    x0' = x0 + flowA_{t-1->t}(x0),   x1' = x1 + flowB_{t-1->t}(x1)
    p'  = (x0' + x1')/2,             v'(p') = (x1' - x0')/2

The prediction lands at scattered positions p' -> bilinear SPLAT back onto
the grid (scatter-add + normalize; grids are per-frame so XLA's sort-based
scatter is cheap), holes filled by pull-push. The result both warm-starts
frame t and anchors its E_TC term — this is why warm frames converge in far
fewer iterations than frame 0 (SURVEY.md section 1.2 E_TC).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.config import VideoParams
from videomorphing_tpu.ops.poisson import pull_push_extend
from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords
from videomorphing_tpu.solver.ctf import resample_field as _resize_field


def bilinear_splat(
    values: jnp.ndarray, coords: jnp.ndarray, hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter ``values`` (..., C) at float ``coords`` (..., 2) onto (H, W).

    Returns (accumulated (H, W, C), weight (H, W)). Out-of-domain samples are
    dropped.
    """
    h, w = hw
    c = values.shape[-1]
    vals = values.reshape(-1, c)
    co = coords.reshape(-1, 2)

    y = co[:, 0]
    x = co[:, 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    acc = jnp.zeros((h * w, c), values.dtype)
    wacc = jnp.zeros((h * w,), values.dtype)

    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        yy = y0i + dy
        xx = x0i + dx
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.where(ok, yy * w + xx, 0)
        wv = jnp.where(ok, wgt, 0.0)
        acc = acc.at[idx].add(vals * wv[:, None])
        wacc = wacc.at[idx].add(wv)

    return acc.reshape(h, w, c), wacc.reshape(h, w)


def advect_halfway_field(
    v_prev: jnp.ndarray,
    flow_a: jnp.ndarray,
    flow_b: jnp.ndarray,
    vp: VideoParams = VideoParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict (tc_v, tc_w) for frame t from frame t-1's converged field.

    ``flow_a``/``flow_b``: (H, W, 2) flows of clip A / clip B from frame t-1
    to t (sampled on frame t-1's grid). Returns the propagated field
    (H, W, 2) and a confidence weight map (H, W, 1) — low where the forward
    map has no preimage (disocclusions), so E_TC backs off exactly where
    the prediction is untrustworthy.

    TPU-native scheme: instead of forward-SPLATTING the advected samples
    (scatter-adds are ~6x slower than gathers on this hardware — measured
    0.9 s vs 0.15 s per 1080p field), the forward map ``p' = p + s(p)``
    (``s`` = mean of the two endpoint flows, a smooth field) is INVERTED by
    fixed-point iteration on gathers, exactly like the quadratic-path
    inversion in ``synth.render.invert_path``. Where the fixed point fails
    to contract there is no preimage — the same regions the splat left as
    holes — and the confidence drops to zero, preserving the semantics of
    the splat-based oracle (:func:`advect_halfway_field_splat`).
    """
    h, w = v_prev.shape[0], v_prev.shape[1]
    if vp.advect_scale < 1.0 and min(h, w) >= 128:
        # the field and flows are smooth and the prediction is only a soft
        # prior (warm start + E_TC anchor), so the whole inversion runs at
        # reduced resolution — same rationale and factor as flow_scale
        hh = max(int(round(h * vp.advect_scale)), 1)
        ww = max(int(round(w * vp.advect_scale)), 1)
        v_h = _resize_field(v_prev, (hh, ww))
        fa_h = _resize_field(flow_a, (hh, ww))
        fb_h = _resize_field(flow_b, (hh, ww))
        # advect_residual is documented in FULL-resolution pixels; the
        # recursive call measures its fixed-point residual in reduced-res
        # pixels, so convert the threshold (r full px = r*scale low px) —
        # without this the confidence was ~2x too permissive at the
        # default advect_scale=0.5, anchoring E_TC to invalid predictions
        # exactly where it promises to back off
        vp_full = dataclasses.replace(
            vp, advect_scale=1.0, advect_residual=vp.advect_residual * (hh / h)
        )
        tc_h, conf_h = advect_halfway_field(v_h, fa_h, fb_h, vp_full)
        tc_v = _resize_field(tc_h, (h, w))
        conf = jax.image.resize(conf_h, (h, w, 1), method="bilinear")
        return tc_v, conf

    g = grid_coords(h, w, dtype=v_prev.dtype)
    x0 = g - v_prev
    x1 = g + v_prev
    # All six samples here read SMOOTH 2-channel planes (flows, the mean
    # shift, the carried field) at smooth coordinate maps — the fused
    # sampler's contract — and the XLA gather they replace was, with the
    # occlusion round-trip, the warm scan's hidden tax: gathers are
    # index-count bound on this hardware (~0.17 s per 1080p 2-ch gather,
    # scripts/profile_northstar.py round 3). Exact twin either way
    # (fused_sample falls back to bilinear_sample per band).
    use_fused = vp.fused_advect and jax.default_backend() == "tpu"
    if use_fused:
        from videomorphing_tpu.pallas.warp import fused_sample

        fa, fb = fused_sample([flow_a, flow_b], [x0, x1])
    else:
        fa = bilinear_sample(flow_a, x0)
        fb = bilinear_sample(flow_b, x1)
    # per-source-point halfway-point displacement and carried new vector
    shift = 0.5 * (fa + fb)            # s(p) = p' - p
    u = v_prev + 0.5 * (fb - fa)       # v'(p') as a function of p

    if use_fused:
        from videomorphing_tpu.pallas.warp import fused_sample, make_warp_source

        src_shift = make_warp_source(shift)
        sample_shift = lambda p_: fused_sample([src_shift], [p_])[0]
        sample_u = lambda p_: fused_sample([u], [p_])[0]
    else:
        sample_shift = lambda p_: bilinear_sample(shift, p_)
        sample_u = lambda p_: bilinear_sample(u, p_)

    p = g - shift                      # first guess: s varies slowly
    delta = jnp.zeros((h, w), v_prev.dtype)
    for _ in range(max(int(vp.advect_invert_iters), 1)):
        p_new = g - sample_shift(p)
        delta = jnp.linalg.norm(p_new - p, axis=-1)
        p = p_new
    tc_v = sample_u(p)

    inside = (
        (p[..., 0] >= 0.0) & (p[..., 0] <= h - 1.0)
        & (p[..., 1] >= 0.0) & (p[..., 1] <= w - 1.0)
    )
    conf = jnp.clip(1.0 - delta / vp.advect_residual, 0.0, 1.0) * inside
    return tc_v, conf[..., None].astype(v_prev.dtype)


def advect_halfway_field_splat(
    v_prev: jnp.ndarray,
    flow_a: jnp.ndarray,
    flow_b: jnp.ndarray,
    vp: VideoParams = VideoParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-splat oracle for :func:`advect_halfway_field` (slow on TPU;
    kept as the reference semantics the gather-based inversion is tested
    against)."""
    h, w = v_prev.shape[0], v_prev.shape[1]
    g = grid_coords(h, w, dtype=v_prev.dtype)
    x0 = g - v_prev
    x1 = g + v_prev
    x0n = x0 + bilinear_sample(flow_a, x0)
    x1n = x1 + bilinear_sample(flow_b, x1)
    p_new = 0.5 * (x0n + x1n)
    v_new = 0.5 * (x1n - x0n)

    acc, wgt = bilinear_splat(v_new, p_new, (h, w))
    filled = pull_push_extend(
        acc / jnp.maximum(wgt, 1e-6)[..., None], jnp.clip(wgt, 0.0, 1.0)
    )
    conf = jnp.clip(wgt, 0.0, 1.0) * (wgt > vp.tc_fill_thresh)
    return filled, conf[..., None].astype(v_prev.dtype)


def track_keyframe_points(
    t_len: int,
    key_idx,
    key_pts: jnp.ndarray,
    fa_fwd: jnp.ndarray,
    fa_bwd: jnp.ndarray,
    fb_fwd: jnp.ndarray,
    fb_bwd: jnp.ndarray,
) -> jnp.ndarray:
    """Track UI point pairs from KEYFRAMES to every frame [EGSR14 s3].

    The reference workflow: the user places correspondences on a few
    keyframes; optical flow carries them to the in-between frames (with the
    user correcting drift by adding more keyframes). ``key_idx`` is a
    host-side sorted list of K frame indices, ``key_pts`` (K, N, 2, 2) the
    user's point pairs at those frames (same N point identities per
    keyframe). Frames after the first keyframe track forward from the most
    recent keyframe; frames before it track backward from it. At a keyframe
    the user's values are authoritative (tracking re-anchors there).

    Returns (T, N, 2, 2). Runs as two jitted scans over the flow stacks
    (``fa_*``/``fb_*``: (T-1, H, W, 2) per clip) — per-frame point tracking
    is a handful of samples, so the scan exists to avoid T host dispatches,
    not for FLOPs.
    """
    key_idx = [int(k) for k in key_idx]
    n = key_pts.shape[1]
    dtype = key_pts.dtype
    if n == 0 or t_len == 1:
        return jnp.broadcast_to(key_pts[:1], (t_len, n, 2, 2))

    is_key = np.zeros((t_len,), bool)
    pts_at = jnp.zeros((t_len, n, 2, 2), dtype)
    for k, idx in enumerate(key_idx):
        is_key[idx] = True
        pts_at = pts_at.at[idx].set(key_pts[k])
    is_key_dev = jnp.asarray(is_key)
    first = key_idx[0]

    def fwd_body(prev, xs):
        fa_t, fb_t, key_t, pts_t = xs
        cand = track_points(prev, fa_t, fb_t)
        cur = jnp.where(key_t, pts_t, cand)
        return cur, cur

    p0 = pts_at[first]
    if first < t_len - 1:
        _, fwd_out = jax.lax.scan(
            fwd_body,
            p0,
            (
                fa_fwd[first:], fb_fwd[first:],
                is_key_dev[first + 1:], pts_at[first + 1:],
            ),
        )
        tracked = jnp.concatenate([p0[None], fwd_out], axis=0)
    else:
        tracked = p0[None]

    if first > 0:
        # frames before the first keyframe: track backward with the reverse
        # flows (bwd[t] maps frame t+1 back to t, sampled at t+1)
        def bwd_body(nxt, xs):
            fa_t, fb_t = xs
            cur = track_points(nxt, fa_t, fb_t)
            return cur, cur

        _, bwd_out = jax.lax.scan(
            bwd_body, p0, (fa_bwd[:first], fb_bwd[:first]), reverse=True
        )
        tracked = jnp.concatenate([bwd_out, tracked], axis=0)
    return tracked


def track_points(
    points: jnp.ndarray, flow_a: jnp.ndarray, flow_b: jnp.ndarray
) -> jnp.ndarray:
    """Advance UI point pairs (N, 2, 2) one frame by each clip's flow.

    The reference tracks keyframe UI points to non-keyframes via optical flow
    ([EGSR14]; SURVEY.md section 1.5); q0 follows clip A, q1 follows clip B.
    """
    if points.shape[0] == 0:
        return points
    q0 = points[:, 0]
    q1 = points[:, 1]
    q0n = q0 + bilinear_sample(flow_a, q0)
    q1n = q1 + bilinear_sample(flow_b, q1)
    return jnp.stack([q0n, q1n], axis=1)
