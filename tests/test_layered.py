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
