"""Solver tests: analytic gradient vs autodiff oracle, invariants, and a
small end-to-end convergence case (SURVEY.md section 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.ops.resample import (
    bilinear_sample,
    bilinear_sample_with_grad,
    grid_coords,
)
from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter
from videomorphing_tpu.solver.ctf import optimize_pair
from videomorphing_tpu.solver.descent import (
    boundary_mask,
    color_mask,
    energy_value_grad_precond,
    foldover_scale,
)
from videomorphing_tpu.solver.energy import (
    LevelData,
    make_level_data,
    total_energy,
    tps_energy_map,
    warp_pair,
)


def _smooth_image(rng, h, w, c=3):
    img = jnp.asarray(rng.random((h, w, c), dtype=np.float32))
    k = gaussian_kernel_1d(5, 1.5)
    return separable_filter(img, k, k, mode="same_edge")


def _blob(h, w, cy, cx, sigma=4.0):
    g = grid_coords(h, w)
    d2 = (g[..., 0] - cy) ** 2 + (g[..., 1] - cx) ** 2
    return jnp.exp(-0.5 * d2 / sigma**2)[..., None]


class TestSampleGrad:
    def test_matches_autodiff(self, rng):
        img = _smooth_image(rng, 16, 18, 2)
        coords = grid_coords(16, 18) + jnp.asarray(
            rng.uniform(0.05, 0.45, (16, 18, 2)).astype(np.float32)
        )

        val, dval = bilinear_sample_with_grad(img, coords)
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(bilinear_sample(img, coords)), atol=1e-6
        )

        def f(co):
            return jnp.sum(bilinear_sample(img, co) * weights)

        weights = jnp.asarray(rng.random((16, 18, 2), dtype=np.float32))
        auto = jax.grad(f)(coords)
        manual = jnp.einsum("hwc,hwck->hwk", weights, dval)
        np.testing.assert_allclose(np.asarray(manual), np.asarray(auto), atol=1e-5)


class TestEnergy:
    def test_tps_zero_on_affine(self):
        g = grid_coords(20, 24)
        # affine field: v = A p + b has zero second derivatives
        v = jnp.stack(
            [0.1 * g[..., 0] - 0.05 * g[..., 1] + 1.0,
             0.02 * g[..., 0] + 0.07 * g[..., 1] - 0.5],
            axis=-1,
        )
        np.testing.assert_allclose(np.asarray(tps_energy_map(v)), 0.0, atol=1e-4)

    def test_zero_field_identical_images(self, rng):
        img = _smooth_image(rng, 24, 24)
        data = make_level_data(img, img)
        p = MorphParams()
        v = jnp.zeros((24, 24, 2))
        e = total_energy(v, data, p)
        assert float(e) < 1e-4

    def test_analytic_grad_matches_autodiff(self, rng):
        p = MorphParams(lambda_tps=0.01, gamma_ui=10.0, beta_tc=2.0)
        i0 = _smooth_image(rng, 20, 22)
        i1 = _smooth_image(rng, 20, 22)
        h, w = 20, 22
        ui_w = jnp.asarray(rng.random((h, w, 1), dtype=np.float32))
        ui_v = jnp.asarray(rng.uniform(-1, 1, (h, w, 2)).astype(np.float32))
        tc_w = jnp.asarray(rng.random((h, w, 1), dtype=np.float32))
        tc_v = jnp.asarray(rng.uniform(-1, 1, (h, w, 2)).astype(np.float32))
        data = LevelData(i0, i1, ui_w, ui_v, tc_w, tc_v)
        v = jnp.asarray(rng.uniform(0.05, 0.45, (h, w, 2)).astype(np.float32))

        e, g, precond = energy_value_grad_precond(v, data, p)
        e_ref = total_energy(v, data, p)
        g_ref = jax.grad(total_energy)(v, data, p)
        np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-6)
        assert float(precond.min()) > 0.0


class TestDescentInvariants:
    def test_color_masks_partition(self):
        for n in (1, 2, 4):
            total = sum(
                np.asarray(color_mask(8, 8, jnp.int32(c), n)) for c in range(n)
            )
            np.testing.assert_array_equal(total, np.ones((8, 8, 1)))

    def test_boundary_mask(self):
        m = np.asarray(boundary_mask(6, 7))
        assert m[0, 3, 0] == 0 and m[5, 3, 0] == 0     # vy locked top/bottom
        assert m[3, 0, 1] == 0 and m[3, 6, 1] == 0     # vx locked left/right
        assert m[3, 3].tolist() == [1.0, 1.0]

    def test_foldover_clamp_prevents_folds(self, rng):
        h, w = 16, 16
        v = jnp.zeros((h, w, 2))
        # aggressive random steps, clamped; warp grids must stay monotone
        for i in range(5):
            d = jnp.asarray(rng.uniform(-3, 3, (h, w, 2)).astype(np.float32))
            d = foldover_scale(v, d, margin=0.45)
            v = v + d
        g = grid_coords(h, w)
        for warp in (g - v, g + v):
            dx = np.diff(np.asarray(warp[..., 1]), axis=1)
            dy = np.diff(np.asarray(warp[..., 0]), axis=0)
            assert dx.min() > 0.0, "x-fold in warp"
            assert dy.min() > 0.0, "y-fold in warp"


class TestEndToEnd:
    def test_recovers_translation(self, rng):
        # a blob translated by (0, 4): true halfway field is v = (0, 2)
        h, w = 48, 48
        bg = _smooth_image(rng, h, w, 1) * 0.1
        i0 = jnp.clip(bg + _blob(h, w, 24, 22), 0, 1)
        i1 = jnp.clip(bg + _blob(h, w, 24, 26), 0, 1)
        p = MorphParams(
            lambda_tps=0.01, n_levels=3, iters_coarse=80, iters_fine=40
        )
        res = optimize_pair(i0, i1, params=p)
        v = np.asarray(res.v)
        # near the blob the field should be ~(0, 2)
        center = v[20:29, 20:29]
        assert abs(center[..., 1].mean() - 2.0) < 0.5, center[..., 1].mean()
        assert abs(center[..., 0].mean()) < 0.5
        # energy decreased at every level
        for st in res.level_stats:
            assert float(st.e_final) <= float(st.e0) + 1e-7

    def test_ui_points_pin_field(self, rng):
        h, w = 32, 32
        i0 = _smooth_image(rng, h, w)
        i1 = _smooth_image(rng, h, w)
        # one pair: (10, 10) in I0 corresponds to (10, 14) in I1
        points = jnp.asarray([[[10.0, 10.0], [10.0, 14.0]]])
        p = MorphParams(n_levels=2, iters_coarse=60, iters_fine=30, gamma_ui=100.0)
        res = optimize_pair(i0, i1, points=points, params=p)
        v = np.asarray(res.v)
        # halfway anchor (10, 12) should carry v ~ (0, 2)
        assert abs(v[10, 12, 1] - 2.0) < 0.75
        assert abs(v[10, 12, 0]) < 0.75

    def test_warm_start_uses_fewer_levels(self, rng):
        h, w = 32, 32
        i0 = _smooth_image(rng, h, w)
        i1 = _smooth_image(rng, h, w)
        p = MorphParams(n_levels=3, iters_coarse=10, iters_fine=5)
        cold = optimize_pair(i0, i1, params=p)
        warm = optimize_pair(i0, i1, params=p, v0=cold.v)
        assert len(warm.level_stats) < len(cold.level_stats)


class TestRelinMedian:
    def test_rejects_planted_mislock_and_keeps_boundary(self, rng):
        """config.relin_median: a salt-and-pepper impulse planted in an
        otherwise-good field is removed at the first re-linearization
        (Sun-Roth-Black outlier rejection), the locked boundary components
        stay exactly locked, and energy still only decreases."""
        from videomorphing_tpu.solver.descent import make_level_solver

        h, w = 48, 48
        img = _smooth_image(rng, h, w)
        data = make_level_data(img, img)  # identical pair: true v == 0
        v0 = jnp.zeros((h, w, 2), jnp.float32)
        v0 = v0.at[20, 20].set(jnp.asarray([9.0, -9.0]))  # planted mislock
        p = MorphParams(relin_median=True, relin_every=2, backend="jnp")
        solve = jax.jit(make_level_solver(p, n_iters=6))
        v_f, stats = solve(v0, data)
        v_f = np.asarray(v_f)
        # the impulse is gone (descent alone at this scale cannot undo a
        # 9 px spike in 6 iterations; the median can and does)
        assert np.abs(v_f[20, 20]).max() < 1.0, v_f[20, 20]
        # boundary lock survives the filter: vy on top/bottom, vx on sides
        assert np.abs(v_f[0, :, 0]).max() == 0.0
        assert np.abs(v_f[-1, :, 0]).max() == 0.0
        assert np.abs(v_f[:, 0, 1]).max() == 0.0
        assert np.abs(v_f[:, -1, 1]).max() == 0.0
        assert float(stats.e_final) <= float(stats.e0) + 1e-7

    def test_default_is_median_and_explicit_flag_identical(self, rng):
        """relin_median defaults ON since round 4 (PERF.md round-4 A/B:
        quality up on every gate, north-star wall neutral); the default
        path is bit-identical to the explicit flag, and the exact oracle
        config pins it OFF."""
        from videomorphing_tpu.config import exact_configs
        from videomorphing_tpu.solver.descent import make_level_solver

        assert MorphParams().relin_median is True
        assert exact_configs()[0].relin_median is False

        h, w = 32, 32
        i0 = _smooth_image(rng, h, w)
        i1 = _smooth_image(rng, h, w)
        data = make_level_data(i0, i1)
        v0 = jnp.zeros((h, w, 2), jnp.float32)
        p0 = MorphParams(backend="jnp")
        p1 = MorphParams(backend="jnp", relin_median=True)
        a, _ = jax.jit(make_level_solver(p0, n_iters=5))(v0, data)
        b, _ = jax.jit(make_level_solver(p1, n_iters=5))(v0, data)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
