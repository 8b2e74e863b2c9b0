"""Synthesis tests: path geometry, inversion, endpoint fidelity, blending."""

import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.config import SynthParams
from videomorphing_tpu.ops.resample import grid_coords
from videomorphing_tpu.synth.blend import blend_extended, blend_weights
from videomorphing_tpu.synth.paths import bulge_field, rotation_angle_map
from videomorphing_tpu.synth.render import (
    invert_path,
    path_displacement,
    render_clip,
    render_frame,
)


def _rotation_halfway_field(h, w, theta, cy, cx):
    """Exact halfway field of a rotation by theta about (cy, cx):
    chord midpoints carry v = sin(theta/2) R90 r with p = c + cos(theta/2) r."""
    g = grid_coords(h, w)
    r_of_p = (g - jnp.asarray([cy, cx])) / jnp.cos(theta / 2.0)
    r90 = jnp.stack([-r_of_p[..., 1], r_of_p[..., 0]], axis=-1)
    return jnp.sin(theta / 2.0) * r90


class TestPaths:
    def test_rotation_angle_recovered(self):
        theta = 0.5
        v = _rotation_halfway_field(33, 33, theta, 16.0, 16.0)
        ang = rotation_angle_map(v)
        inner = np.asarray(ang)[10:23, 10:23]
        np.testing.assert_allclose(inner, theta, atol=0.05)

    def test_bulge_hits_arc_midpoint(self):
        # at t=1/2 the quadratic path must pass through the rotating point
        theta = 0.6
        h = w = 33
        cy = cx = 16.0
        v = _rotation_halfway_field(h, w, theta, cy, cx)
        b = bulge_field(v, SynthParams(path_smooth_mu=0.0))
        g = grid_coords(h, w)
        r = (g - jnp.asarray([cy, cx])) / jnp.cos(theta / 2.0)
        arc_mid = jnp.asarray([cy, cx]) + r
        x_half = g + path_displacement(v, b, 0.5)
        err = np.linalg.norm(np.asarray(x_half - arc_mid), axis=-1)[12:21, 12:21]
        # without the bulge the chord midpoint misses by (1-cos(th/2))|r|
        miss = (1 - np.cos(theta / 2)) * np.linalg.norm(
            np.asarray(r), axis=-1
        )[12:21, 12:21]
        assert err.mean() < 0.25 * miss.mean() + 0.05

    def test_zero_field_zero_bulge(self):
        v = jnp.zeros((16, 16, 2))
        b = bulge_field(v)
        np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-5)


class TestInversion:
    def test_invert_constant_field(self):
        v = jnp.full((20, 20, 2), 1.5)
        t = 0.75
        p = invert_path(v, None, t, n_iters=8)
        g = grid_coords(20, 20)
        expect = g - (2 * t - 1) * 1.5
        # interior only: near edges the true p leaves the domain
        np.testing.assert_allclose(
            np.asarray(p)[4:-4, 4:-4], np.asarray(expect)[4:-4, 4:-4], atol=1e-3
        )

    def test_t_endpoints_are_sources(self, rng):
        h = w = 32
        i0 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
        v = jnp.zeros((h, w, 2))
        sp = SynthParams(blend_mode="linear")
        f0 = render_frame(i0, i1, v, None, 0.0, sp)
        f1 = render_frame(i0, i1, v, None, 1.0, sp)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(i0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(i1), atol=1e-4)

    def test_translation_midpoint(self):
        # I0 = blob at x=12, I1 = same blob at x=20: at t=.5 blob sits at x=16
        h = w = 32
        g = grid_coords(h, w)

        def blob(cx):
            d2 = (g[..., 0] - 16.0) ** 2 + (g[..., 1] - cx) ** 2
            return jnp.exp(-0.5 * d2 / 9.0)[..., None]

        i0, i1 = blob(12.0), blob(20.0)
        v = jnp.zeros((h, w, 2)).at[..., 1].set(4.0)  # vx = +4: phi0=x-4, phi1=x+4
        sp = SynthParams(blend_mode="linear")
        mid = render_frame(i0, i1, v, None, 0.5, sp)
        expect = blob(16.0)
        np.testing.assert_allclose(np.asarray(mid), np.asarray(expect), atol=5e-2)

    def test_render_clip_shape(self, rng):
        i0 = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        v = jnp.zeros((16, 16, 2))
        ts = jnp.linspace(0.0, 1.0, 5)
        out = render_clip(i0, i1, v, None, ts, SynthParams(blend_mode="linear"))
        assert out.shape == (5, 16, 16, 3)


class TestBlend:
    def test_weights_shift_to_valid_source(self):
        m0 = jnp.ones((8, 8)).at[:, 4:].set(0.0)
        m1 = jnp.ones((8, 8))
        w = blend_weights(jnp.asarray(0.3), m0, m1)
        np.testing.assert_allclose(np.asarray(w)[:, :4], 0.3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w)[:, 4:], 1.0, atol=1e-6)

    def test_poisson_blend_no_bleed(self):
        # I0 invalid on the right half; the blend there must come from I1,
        # not from I0's (zero) invalid content
        h = w = 32
        w0 = jnp.full((h, w, 1), 0.25).at[:, 16:].set(0.0)
        w1 = jnp.full((h, w, 1), 0.75)
        m0 = jnp.ones((h, w)).at[:, 16:].set(0.0)
        m1 = jnp.ones((h, w))
        out = blend_extended(w0, w1, m0, m1, jnp.asarray(0.5), SynthParams())
        right = np.asarray(out)[:, 20:, 0]
        assert abs(right.mean() - 0.75) < 0.08
        left = np.asarray(out)[:, :12, 0]
        assert abs(left.mean() - 0.5) < 0.08

    def test_occlusion_shifts_weight(self):
        m = jnp.ones((8, 8))
        conf0 = jnp.zeros((8, 8))  # source 0 fully occluded
        w = blend_weights(jnp.asarray(0.2), m, m, conf0, jnp.ones((8, 8)))
        np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)
