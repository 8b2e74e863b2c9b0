"""The real-footage-class stressor (occluders + discontinuities + lighting
drift): ground-truth construction sanity + the flow/occlusion/morph stack
driven end-to-end at small size (VERDICT round 2 missing #3).

The full-size decision probe (480p, robust-flow on/off, occlusion_thresh
sweep) is scripts/probe_stressor.py; these tests pin the machinery.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.config import VideoParams
from videomorphing_tpu.utils.stressor import (
    flow_epe,
    make_stressor,
    midframe_ssim,
    occlusion_f1,
    make_stressor as _mk,
)

T, H, W = 4, 72, 104


@pytest.fixture(scope="module")
def case():
    return make_stressor(T, H, W, seed=3)


def test_scene_shapes_and_ranges(case):
    assert case.clip_a.shape == (T, H, W, 3)
    assert case.mid_true.shape == (T, H, W, 3)
    assert case.flow_a_true.shape == (T - 1, H, W, 2)
    a = np.asarray(case.clip_a)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # lighting drift is real: frame means differ across time and clips
    ma = a.mean(axis=(1, 2, 3))
    assert np.ptp(ma) > 0.01
    # occlusion band is non-empty every frame (the disk moves fast enough)
    assert all(int(np.asarray(case.occ_a[t]).sum()) > 10 for t in range(T - 1))
    # valid mask excludes the occlusions and boundary band but keeps most px
    frac = float(np.asarray(case.valid_a).mean())
    assert 0.5 < frac < 0.999


def test_true_flow_is_consistent_with_frames(case):
    """Warping frame t+1 back by the true flow reproduces frame t up to the
    lighting drift (gain-only), on the valid mask — i.e. the ground truth
    actually describes the rendered clips."""
    from videomorphing_tpu.ops.resample import bilinear_sample, grid_coords

    t = 1
    g = grid_coords(H, W, jnp.float32)
    warped = bilinear_sample(case.clip_a[t + 1], g + case.flow_a_true[t])
    a_t = case.clip_a[t]
    v = np.asarray(case.valid_a[t])
    # gain-compensate: the drift is global, fit one scalar
    wa, aa = np.asarray(warped)[v], np.asarray(a_t)[v]
    gain = float((wa * aa).sum() / max((wa * wa).sum(), 1e-9))
    resid = np.abs(gain * wa - aa)
    assert resid.mean() < 0.02, resid.mean()


def test_hs_flow_tracks_background_without_drift():
    """Sanity on the ground truth itself: with the lighting drift OFF, the
    default Horn-Schunck flow matches the analytic background flow to
    sub-0.5 px — i.e. large EPE under drift (next test) is the drift's
    doing, not a broken ground-truth convention."""
    from videomorphing_tpu.video.flow import flow_pair_bidir
    from videomorphing_tpu.video.occlusion import occlusion_confidence

    import dataclasses

    nodrift = make_stressor(T, H, W, seed=3, drift=0.0)
    # occlusion_thresh 0.5 at this tiny size: at the default 1.0 px the
    # smooth small-frame flows rarely build 1 px of round-trip error
    # (measured: recall 0.08 at 1.0, 0.61 at 0.5) — the 480p probe
    # (scripts/probe_stressor.py) sweeps the threshold at real size
    vp = dataclasses.replace(VideoParams(), occlusion_thresh=0.5)
    fwd, bwd = flow_pair_bidir(nodrift.clip_a[1], nodrift.clip_a[2], vp)
    bg = nodrift.valid_a[1] & ~nodrift.disk_a[1]
    m = flow_epe(fwd[None], nodrift.flow_a_true[1][None], bg[None])
    assert m["epe_mean"] < 0.5, m
    conf = occlusion_confidence(fwd, bwd, vp)
    det = occlusion_f1(conf[None], nodrift.occ_a[1][None])
    assert det["recall"] > 0.3, det  # the occlusion band is seen


def test_robust_flow_rescues_lighting_drift(case):
    """THE decision datum behind the robust-flow default for video: under
    a 12% global gain drift, default Horn-Schunck's background EPE blows
    past several px (brightness constancy violated everywhere) while the
    Brox-class robust flow (gradient constancy + Charbonnier) stays
    sub-0.5 px. Measured here at (4, 72, 104): 6.02 px vs 0.11 px."""
    import dataclasses

    from videomorphing_tpu.video.flow import flow_pair_bidir

    bg = case.valid_a[1] & ~case.disk_a[1]
    epe = {}
    for robust in (False, True):
        vp = dataclasses.replace(VideoParams(), flow_robust=robust)
        fwd, _ = flow_pair_bidir(case.clip_a[1], case.clip_a[2], vp)
        epe[robust] = flow_epe(
            fwd[None], case.flow_a_true[1][None], bg[None]
        )["epe_mean"]
    assert epe[True] < 0.5, epe
    assert epe[False] > 2.0 * epe[True], epe  # HS must stay visibly worse


def test_end_to_end_morph_beats_cross_dissolve(case):
    """The full pipeline (points on the disk, tracked; warm scan; render
    at blend 0.5) vs the no-correspondence cross-dissolve baseline, on the
    analytic true mid frames — under the lighting drift.

    Measured at (4, 72, 104): dissolve 0.917; morph with the DEFAULT
    Horn-Schunck flow 0.883 (the drift-wrecked flows pollute tracking +
    advection and the morph LOSES to a dissolve); morph with flow_robust
    0.935. This is the end-to-end decision datum for the video robust-flow
    default — the 480p probe (scripts/probe_stressor.py) confirms at real
    size and decides the flip."""
    import dataclasses

    from videomorphing_tpu.utils.golden import ssim
    from videomorphing_tpu.video.pipeline import morph_video

    times = jnp.full((T,), 0.5, jnp.float32)
    got = {}
    for robust in (False, True):
        vp = dataclasses.replace(VideoParams(), flow_robust=robust)
        res = morph_video(
            case.clip_a, case.clip_b, points={0: case.points},
            times=times, vp=vp, render=True,
        )
        got[robust] = midframe_ssim(res.frames, case)["ssim_mid_mean"]

    dissolve = 0.5 * (case.clip_a + case.clip_b)
    base = float(np.mean([
        ssim(dissolve[t], case.mid_true[t], crop=case.crop) for t in range(T)
    ]))
    assert got[True] > base + 0.01, (got, base)
    assert got[True] > got[False] + 0.01, got
    assert got[True] > 0.9, got
