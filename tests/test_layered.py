"""Layered morphing tests: crossing motions that a single field cannot
represent resolve correctly with per-layer fields + alpha compositing."""

import numpy as np
import pytest
import jax.numpy as jnp

from videomorphing_tpu.config import MorphParams, SynthParams


def _scene(rng, h=48, w=64, blob_x=20.0):
    """Textured background + a bright blob at x=blob_x; returns (img, mask)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = rng.random((h, w, 3), dtype=np.float32)
    for _ in range(2):
        tex = 0.25 * (
            np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
            + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
        )
    bg = 0.2 + 0.3 * tex
    d2 = (yy - h / 2) ** 2 + (xx - blob_x) ** 2
    blob = np.exp(-0.5 * d2 / 5.0**2)
    img = np.clip(bg + np.stack([0.8 * blob, 0.7 * blob, 0.2 * blob], -1), 0, 1)
    mask = (blob > 0.05).astype(np.float32)
    return img.astype(np.float32), mask


@pytest.fixture(scope="module")
def params():
    return MorphParams(n_levels=2, iters_coarse=30, iters_fine=15), SynthParams(
        quadratic_paths=False, blend_mode="linear"
    )


class TestNeutralize:
    def test_outside_mask_is_flat(self, rng):
        from videomorphing_tpu.models.layered import neutralize

        img, mask = _scene(rng)
        out = np.asarray(neutralize(jnp.asarray(img), jnp.asarray(mask)))
        outside = out[mask < 0.5]
        assert outside.std(axis=0).max() < 1e-4  # constant outside (f32 sum noise)
        inside = np.abs(out[mask > 0.5] - img[mask > 0.5])
        assert inside.max() < 1e-4               # untouched inside


class TestLayeredMorph:
    def test_layer_follows_its_own_motion(self, rng, params):
        """Foreground blob moves +12 px while the background is static: the
        layered morph must carry the blob smoothly and keep the background
        fixed — a shared single field would have to tear between the two."""
        from videomorphing_tpu import api

        mp, sp = params
        h, w = 48, 64
        i0, m0 = _scene(rng, h, w, blob_x=20.0)
        rng2 = np.random.default_rng(0)  # same background texture
        i1, m1 = _scene(rng2, h, w, blob_x=32.0)

        pts = np.asarray([[[h / 2, 20.0], [h / 2, 32.0]]], np.float32)
        frames = np.asarray(
            api.morph_pair_layered(
                i0, i1,
                [dict(mask0=m0, mask1=m1, points=pts)],
                n_frames=5, mp=mp, sp=sp,
            )
        )
        assert frames.shape == (5, h, w, 3)

        # blob centroid (red-dominant content) sweeps 20 -> 32
        cxs = []
        for f in frames:
            sal = np.maximum(f[..., 0] - f[..., 2] - 0.1, 0)
            xx = np.mgrid[0:h, 0:w][1]
            cxs.append(float((xx * sal).sum() / max(sal.sum(), 1e-6)))
        assert abs(cxs[0] - 20.0) < 2.5, cxs
        assert abs(cxs[-1] - 32.0) < 2.5, cxs
        d = np.diff(cxs)
        assert (d > 0).all(), cxs

        # background (far from both blob positions) barely changes
        corner0 = frames[0][2:10, 44:62]
        corner1 = frames[-1][2:10, 44:62]
        assert np.abs(corner0 - corner1).mean() < 0.04

    def test_video_layers_track_opposite_motions(self, rng, params):
        """VERDICT round 1 item 7 done-criterion: two video layers moving
        OPPOSITELY across a 4-frame clip; the composite tracks both. A
        single field cannot represent the crossing motions."""
        from videomorphing_tpu import api
        from videomorphing_tpu.config import VideoParams

        mp, sp = params
        t_len, h, w = 4, 40, 56
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

        def blob(cy, cx, col):
            g = np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0**2)
            return np.stack([c * g for c in col], -1).astype(np.float32)

        def make_clip(x1_start, x2_start):
            """Layer 1 (red, top) moves +2 px/frame; layer 2 (blue,
            bottom) moves -2 px/frame over a textured static background."""
            rngb = np.random.default_rng(7)
            tex = rngb.random((h, w, 3), dtype=np.float32)
            for _ in range(2):
                tex = 0.25 * (
                    np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                    + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
                )
            bg = 0.15 + 0.2 * tex
            frames, m1s, m2s = [], [], []
            for k in range(t_len):
                x1 = x1_start + 2.0 * k
                x2 = x2_start - 2.0 * k
                f = np.clip(
                    bg + blob(10, x1, (0.9, 0.2, 0.1)) + blob(30, x2, (0.1, 0.2, 0.9)),
                    0, 1,
                )
                frames.append(f)
                m1s.append((np.hypot(yy - 10, xx - x1) < 8).astype(np.float32))
                m2s.append((np.hypot(yy - 30, xx - x2) < 8).astype(np.float32))
            return (
                np.stack(frames).astype(np.float32),
                np.stack(m1s),
                np.stack(m2s),
            )

        clip_a, m1a, m2a = make_clip(16.0, 40.0)
        clip_b, m1b, m2b = make_clip(22.0, 34.0)  # +6 / -6 px offsets

        res = api.morph_clips_layered(
            clip_a, clip_b,
            [dict(mask0=m1a, mask1=m1b), dict(mask0=m2a, mask1=m2b)],
            mp=mp, sp=sp, vp=VideoParams(flow_iters=20),
        )
        frames = np.asarray(res.frames)
        assert frames.shape == (t_len, h, w, 3)
        assert np.isfinite(frames).all()

        for k, t in enumerate(np.linspace(0, 1, t_len)):
            # expected centers: blend of the A/B positions at this frame
            e1 = (1 - t) * (16 + 2 * k) + t * (22 + 2 * k)
            e2 = (1 - t) * (40 - 2 * k) + t * (34 - 2 * k)
            red = np.maximum(frames[k, :20, :, 0] - frames[k, :20, :, 2] - 0.1, 0)
            blue = np.maximum(frames[k, 20:, :, 2] - frames[k, 20:, :, 0] - 0.1, 0)
            c1 = float((xx[:20] * red).sum() / max(red.sum(), 1e-6))
            c2 = float((xx[20:] * blue).sum() / max(blue.sum(), 1e-6))
            assert abs(c1 - e1) < 2.5, (k, c1, e1)
            assert abs(c2 - e2) < 2.5, (k, c2, e2)

    def test_endpoints_match_inputs(self, rng, params):
        from videomorphing_tpu import api

        mp, sp = params
        i0, m0 = _scene(rng, blob_x=22.0)
        i1, m1 = _scene(np.random.default_rng(0), blob_x=28.0)
        frames = np.asarray(
            api.morph_pair_layered(
                i0, i1, [dict(mask0=m0, mask1=m1)], n_frames=3, mp=mp, sp=sp
            )
        )
        # t=0 reproduces image 0, t=1 image 1 (away from the 1px border)
        assert np.abs(frames[0][2:-2, 2:-2] - i0[2:-2, 2:-2]).mean() < 0.02
        assert np.abs(frames[-1][2:-2, 2:-2] - i1[2:-2, 2:-2]).mean() < 0.02

    def test_video_layer_keyframed_points(self, rng, params):
        """Layer points in KEYFRAME-dict form flow through the layer solve
        (TODO feature-polish item): the same point identities are placed on
        the first and last frame, flow-tracked between, and the layer's
        motion still resolves. Exercises drift re-anchoring on the
        NEUTRALIZED clips that the layer solve actually sees."""
        from videomorphing_tpu import api
        from videomorphing_tpu.config import VideoParams

        mp, sp = params
        t_len, h, w = 4, 40, 56
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

        def blob(cy, cx, col):
            g = np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / 4.0**2)
            return np.stack([c * g for c in col], -1).astype(np.float32)

        def make_clip(x_start):
            rngb = np.random.default_rng(7)
            tex = rngb.random((h, w, 3), dtype=np.float32)
            for _ in range(2):
                tex = 0.25 * (
                    np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                    + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
                )
            bg = 0.15 + 0.2 * tex
            frames, ms = [], []
            for k in range(t_len):
                x = x_start + 2.0 * k
                frames.append(np.clip(bg + blob(20, x, (0.9, 0.2, 0.1)), 0, 1))
                ms.append((np.hypot(yy - 20, xx - x) < 8).astype(np.float32))
            return np.stack(frames).astype(np.float32), np.stack(ms)

        clip_a, ma = make_clip(16.0)
        clip_b, mb = make_clip(22.0)

        def kp(k):
            xa, xb = 16.0 + 2.0 * k, 22.0 + 2.0 * k
            return np.asarray([[[20.0, xa], [20.0, xb]]], np.float32)

        layer_points = {0: kp(0), t_len - 1: kp(t_len - 1)}
        res = api.morph_clips_layered(
            clip_a, clip_b,
            [dict(mask0=ma, mask1=mb, points=layer_points)],
            mp=mp, sp=sp, vp=VideoParams(flow_iters=20),
        )
        frames = np.asarray(res.frames)
        assert frames.shape == (t_len, h, w, 3)
        assert np.isfinite(frames).all()
        for k, t in enumerate(np.linspace(0, 1, t_len)):
            e = (1 - t) * (16 + 2 * k) + t * (22 + 2 * k)
            red = np.maximum(frames[k, ..., 0] - frames[k, ..., 2] - 0.1, 0)
            c = float((xx * red).sum() / max(red.sum(), 1e-6))
            assert abs(c - e) < 2.5, (k, c, e)
