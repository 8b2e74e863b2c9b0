"""Real-footage-class stressor: moving occluders + motion discontinuities
+ lighting drift, with analytic ground truth.

VERDICT round 2 missing #3: the Brox-class robust flow option's constants
were probed on a single synthetic translation with a brightness shift;
nothing stressed the flow/occlusion/morph stack on the failure modes real
footage combines. This module builds that stressor WITH ground truth —
every quantity the pipeline estimates (per-clip optical flow, occlusion
masks, the blend-0.5 morph frames) has a closed-form true value, because
the scene is a pure function of coordinates and time:

- a band-limited background texture panning at a slow constant velocity
  (non-zero flow everywhere, so EPE isn't trivially zero);
- a textured foreground disk moving FAST over it (a motion discontinuity
  at the disk boundary, and a genuine occlusion band every frame where
  the disk's new position covers background);
- global lighting drift per frame (gain oscillation, different phase per
  clip) — the brightness-constancy violation that motivates the robust
  flow's gradient-constancy term [EGSR14 uses Brox flow for exactly this
  robustness class].

Clip B is the same scene with the disk path displaced by a constant
offset and its own lighting phase, so the morph between the clips has a
known geometry: background corresponds identically, the disk by the
offset, and the true blend-0.5 frame is the scene rendered at the
midpoint disk position with averaged lighting.

Everything is evaluated with the same trick as utils.golden._texture:
textures are closed-form sums of sinusoids, so "the frame at time t" and
"the true mid frame" are exact evaluations, never resampled images.

Used by scripts/probe_stressor.py (the on-chip decision probe for the
``flow_robust`` / ``occlusion_thresh`` defaults) and tests/test_stressor.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videomorphing_tpu.utils.golden import _texture


class StressorCase(NamedTuple):
    clip_a: jnp.ndarray       # (T, H, W, 3)
    clip_b: jnp.ndarray       # (T, H, W, 3)
    mid_true: jnp.ndarray     # (T, H, W, 3) true blend-0.5 morph frames
    flow_a_true: jnp.ndarray  # (T-1, H, W, 2) true fwd flow of clip A (dy, dx)
    flow_b_true: jnp.ndarray  # (T-1, H, W, 2)
    valid_a: jnp.ndarray      # (T-1, H, W) bool: flow well-defined (visible
    #                            both frames, off the discontinuity band)
    valid_b: jnp.ndarray      # (T-1, H, W) bool
    occ_a: jnp.ndarray        # (T-1, H, W) bool: frame-t pixel occluded at t+1
    occ_b: jnp.ndarray        # (T-1, H, W) bool
    disk_a: jnp.ndarray       # (T-1, H, W) bool: frame-t pixel on the disk
    disk_b: jnp.ndarray       # (T-1, H, W) bool (fg/bg split for metrics:
    #                            bg EPE isolates the lighting-drift stress;
    #                            fg EPE isolates large-displacement capture)
    points: np.ndarray        # (1, 2, 2) frame-0 disk-center correspondence
    crop: int                 # interior crop for frame metrics
    disk_offset: Tuple[float, float]  # B-vs-A disk displacement (dy, dx)


def make_stressor(
    t_len: int = 8,
    h: int = 480,
    w: int = 854,
    seed: int = 0,
    drift: float = 0.12,
    edge: float = 1.5,
) -> StressorCase:
    """Build the stressor clips + ground truth at (t_len, h, w).

    ``drift``: lighting gain oscillation amplitude (0.12 = ±12% per clip —
    strong for 8-bit footage). ``edge``: soft anti-aliasing width of the
    disk boundary in px (ground-truth masks exclude a 3*edge band around
    the boundary where fg/bg flow is genuinely ambiguous).
    """
    key = jax.random.PRNGKey(seed)
    k_bg, k_fg = jax.random.split(key)
    scale = min(h, w)

    # geometry: background pans slowly; the disk crosses ~40% of the width
    # over the clip (fast relative motion => discontinuity + occlusion)
    vb = jnp.asarray([0.12, -0.30]) * (scale / 480.0)  # bg px/frame
    # fg: the disk crosses ~40% of the width over the clip, whatever T is
    vf = jnp.asarray([0.6 * scale / 480.0, 0.40 * w / max(t_len - 1, 1)])
    r = 0.16 * scale
    c0_a = jnp.asarray([0.52 * h, 0.28 * w])                    # A path start
    # B's disk path is displaced enough that a cross-dissolve visibly
    # ghosts (halfway displacement d/2 ~ 5% of the frame)
    d_off = (0.10 * h, -0.04 * w)                               # B minus A
    d = jnp.asarray(d_off)
    # B's background is also displaced (two takes never share a camera):
    # the morph field is non-zero EVERYWHERE, so a cross-dissolve ghosts
    # globally, not just on the disk annulus
    bd = jnp.asarray([0.020 * h, 0.015 * w])

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.ones((h, 1), jnp.float32) * jnp.arange(w, dtype=jnp.float32)[None, :]

    def center(t, off):
        return c0_a + vf * t + off

    def gain(t, phase):
        return 1.0 + drift * jnp.sin(2.0 * np.pi * t / max(t_len, 2) * 0.9 + phase)

    def disk_mask_soft(t, off):
        c = center(t, off)
        dist = jnp.sqrt((ys - c[0]) ** 2 + (xs - c[1]) ** 2)
        return jax.nn.sigmoid((r - dist) / edge)

    def disk_mask_hard(t, off, pad: float = 0.0):
        c = center(t, off)
        dist = jnp.sqrt((ys - c[0]) ** 2 + (xs - c[1]) ** 2)
        return dist < (r + pad)

    def frame(t, off, bg_off, phase, mid_of=None):
        """Scene at time t; ``mid_of=(off_b, bg_off_b, phase_b)`` renders
        the TRUE blend-0.5 morph frame instead (midpoint geometry +
        photometry)."""
        if mid_of is None:
            off_g, bg_g, g = off, bg_off, gain(t, phase)
        else:
            off_b, bg_off_b, phase_b = mid_of
            off_g = 0.5 * (off + off_b)
            bg_g = 0.5 * (bg_off + bg_off_b)
            g = 0.5 * (gain(t, phase) + gain(t, phase_b))
        bg = _texture(
            k_bg, ys - vb[0] * t - bg_g[0], xs - vb[1] * t - bg_g[1], 3
        )
        c = center(t, off_g)
        fg = _texture(k_fg, ys - c[0], xs - c[1], 3, 16, 6.0, 40.0)
        m = disk_mask_soft(t, off_g)[..., None]
        out = (0.25 + 0.5 * bg) * (1.0 - m) + (0.2 + 0.6 * fg) * m
        return jnp.clip(g * out, 0.0, 1.0)

    zero = jnp.zeros(2)
    phase_a, phase_b = 0.3, 1.5

    @jax.jit
    def build():
        clip_a = jnp.stack(
            [frame(t, zero, zero, phase_a) for t in range(t_len)]
        )
        clip_b = jnp.stack([frame(t, d, bd, phase_b) for t in range(t_len)])
        mid = jnp.stack(
            [
                frame(t, zero, zero, phase_a, mid_of=(d, bd, phase_b))
                for t in range(t_len)
            ]
        )

        fa, fb, va, vbm, oa, ob, da, db = [], [], [], [], [], [], [], []
        for t in range(t_len - 1):
            for (off, acc_f, acc_v, acc_o, acc_d) in (
                (zero, fa, va, oa, da), (d, fb, vbm, ob, db),
            ):
                in_t = disk_mask_hard(t, off)
                acc_d.append(in_t)
                in_t1 = disk_mask_hard(t + 1, off)
                # fg pixels move with vf, bg with vb
                flow = jnp.where(in_t[..., None], vf, vb)
                acc_f.append(jnp.broadcast_to(flow, (h, w, 2)))
                # occluded: bg pixel whose bg-advected position lands
                # inside the disk at t+1
                c1 = center(t + 1, off)
                py, px = ys + vb[0], xs + vb[1]
                cov = ((py - c1[0]) ** 2 + (px - c1[1]) ** 2) < r**2
                occ = (~in_t) & cov
                acc_o.append(occ)
                # valid: not occluded, off the ambiguity band at t and at
                # the corresponding t+1 location, and lands in frame
                band_t = disk_mask_hard(t, off, 3 * edge) & ~disk_mask_hard(
                    t, off, -3 * edge
                )
                band_t1 = (
                    ((py - c1[0]) ** 2 + (px - c1[1]) ** 2) < (r + 3 * edge) ** 2
                ) & (((py - c1[0]) ** 2 + (px - c1[1]) ** 2) > (r - 3 * edge) ** 2)
                ty, tx = ys + flow[..., 0], xs + flow[..., 1]
                inb = (ty >= 1) & (ty <= h - 2) & (tx >= 1) & (tx <= w - 2)
                acc_v.append(~occ & ~band_t & ~band_t1 & inb)
        return (
            clip_a, clip_b, mid,
            jnp.stack(fa), jnp.stack(fb),
            jnp.stack(va), jnp.stack(vbm),
            jnp.stack(oa), jnp.stack(ob),
            jnp.stack(da), jnp.stack(db),
        )

    clip_a, clip_b, mid, fa, fb, va, vbm, oa, ob, da, db = build()
    pts = np.asarray(
        [[list(np.asarray(c0_a)), list(np.asarray(c0_a + d))]], np.float32
    )
    # interior crop: soft-edge band + pan drift + the boundary-locked
    # solve's disagreement with the global bd/2 halfway displacement
    # (cf. utils.golden translation_case crop = 2*max_disp + margin)
    crop = int(
        np.ceil(
            3 * edge
            + float(jnp.max(jnp.abs(vb))) * t_len
            + 2.0 * float(jnp.max(jnp.abs(bd)))
        )
    ) + 12
    return StressorCase(
        clip_a=clip_a, clip_b=clip_b, mid_true=mid,
        flow_a_true=fa, flow_b_true=fb, valid_a=va, valid_b=vbm,
        occ_a=oa, occ_b=ob, disk_a=da, disk_b=db, points=pts, crop=crop,
        disk_offset=(float(d[0]), float(d[1])),
    )


# ---------------------------------------------------------------- metrics


def flow_epe(flow: jnp.ndarray, true: jnp.ndarray, valid: jnp.ndarray) -> dict:
    """Endpoint error of estimated vs true flow over the valid mask.

    ``flow``/``true``: (T-1, H, W, 2); ``valid``: (T-1, H, W) bool.
    """
    err = jnp.linalg.norm(flow - true, axis=-1)
    v = valid.astype(err.dtype)
    n = jnp.maximum(jnp.sum(v), 1.0)
    mean = jnp.sum(err * v) / n
    big = jnp.where(valid, err, 0.0)
    return {
        "epe_mean": float(mean),
        "epe_p95": float(jnp.percentile(big[valid], 95.0)) if bool(jnp.any(valid)) else float("nan"),
        "frac_gt1px": float(jnp.sum((err > 1.0) * v) / n),
    }


def occlusion_f1(conf: jnp.ndarray, occ_true: jnp.ndarray, thresh: float = 0.5) -> dict:
    """Occlusion detection quality: predicted occluded = confidence < thresh.

    ``conf``: (T-1, H, W) visibility confidence in [0,1] (1 = visible);
    ``occ_true``: (T-1, H, W) bool ground truth.
    """
    pred = conf < thresh
    tp = float(jnp.sum(pred & occ_true))
    fp = float(jnp.sum(pred & ~occ_true))
    fn = float(jnp.sum(~pred & occ_true))
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"precision": prec, "recall": rec, "f1": f1}


def midframe_ssim(frames: jnp.ndarray, case: StressorCase) -> dict:
    """SSIM of rendered blend-0.5 frames vs the analytic true mid frames."""
    from videomorphing_tpu.utils.golden import ssim

    vals = [
        ssim(frames[t], case.mid_true[t], crop=case.crop)
        for t in range(frames.shape[0])
    ]
    return {
        "ssim_mid_mean": float(np.mean(vals)),
        "ssim_mid_min": float(np.min(vals)),
        "per_frame": [round(float(v), 5) for v in vals],
    }
