"""Unit tests for the L0 ops layer (SURVEY.md section 5, "Unit")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.ops import (
    bilinear_sample,
    grid_coords,
    image_gradients,
    inside_mask,
    gaussian_kernel_1d,
    separable_filter,
    downsample_2x,
    upsample_field_2x,
    gaussian_pyramid,
    pyramid_shapes,
    auto_n_levels,
    poisson_solve_dct,
    screened_poisson_dct,
    pull_push_extend,
)
from videomorphing_tpu.ops.poisson import divergence, forward_gradients


class TestResample:
    def test_identity_sample(self, rng):
        img = jnp.asarray(rng.random((13, 17, 3), dtype=np.float32))
        g = grid_coords(13, 17)
        out = bilinear_sample(img, g)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_integer_shift(self, rng):
        img = jnp.asarray(rng.random((16, 16, 1), dtype=np.float32))
        g = grid_coords(16, 16)
        shifted = bilinear_sample(img, g + jnp.array([0.0, 2.0]))
        np.testing.assert_allclose(shifted[:, :-2], img[:, 2:], atol=1e-6)

    def test_subpixel_linear_ramp(self):
        # a linear ramp is reproduced exactly by bilinear interpolation
        g = grid_coords(8, 8)
        img = (2.0 * g[..., 0] + 3.0 * g[..., 1])[..., None]
        coords = g + 0.3
        out = bilinear_sample(img, coords)
        expect = 2.0 * jnp.clip(coords[..., 0], 0, 7) + 3.0 * jnp.clip(coords[..., 1], 0, 7)
        np.testing.assert_allclose(out[..., 0], expect, atol=1e-4)

    def test_bicubic_identity_and_integer_shift(self, rng):
        from videomorphing_tpu.ops.resample import bicubic_sample

        img = jnp.asarray(rng.random((16, 16, 2), dtype=np.float32))
        g = grid_coords(16, 16)
        np.testing.assert_allclose(bicubic_sample(img, g), img, atol=1e-5)
        shifted = bicubic_sample(img, g + jnp.array([0.0, 2.0]))
        np.testing.assert_allclose(shifted[:, :-3], img[:, 2:-1], atol=1e-5)

    def test_bicubic_reproduces_linear_ramp(self):
        # cubic convolution with a=-0.5 reproduces polynomials up to degree 1
        from videomorphing_tpu.ops.resample import bicubic_sample

        g = grid_coords(12, 12)
        img = (2.0 * g[..., 0] + 3.0 * g[..., 1])[..., None]
        coords = g[3:-3, 3:-3] + jnp.array([0.4, 0.7])
        out = bicubic_sample(img, coords)
        expect = 2.0 * coords[..., 0] + 3.0 * coords[..., 1]
        np.testing.assert_allclose(out[..., 0], expect, atol=1e-4)

    def test_bicubic_sharper_than_bilinear_on_cosine(self):
        # on a band-limited signal at half-integer offsets, Catmull-Rom has
        # strictly lower interpolation error than the tent filter
        from videomorphing_tpu.ops.resample import bicubic_sample

        g = grid_coords(64, 64)
        f = lambda c: jnp.cos(0.9 * c[..., 1] + 0.4 * c[..., 0])
        img = f(g)[..., None]
        coords = g[8:-8, 8:-8] + 0.5
        true = f(coords)
        err_cub = float(jnp.abs(bicubic_sample(img, coords)[..., 0] - true).mean())
        err_lin = float(jnp.abs(bilinear_sample(img, coords)[..., 0] - true).mean())
        assert err_cub < 0.5 * err_lin, (err_cub, err_lin)

    def test_inside_mask(self):
        coords = jnp.array([[[0.0, 0.0], [-0.1, 3.0]], [[7.0, 7.0], [3.0, 7.2]]])
        m = inside_mask(coords, 8, 8)
        np.testing.assert_array_equal(np.asarray(m), [[1.0, 0.0], [1.0, 0.0]])

    def test_gradients_of_ramp(self):
        g = grid_coords(10, 12)
        img = (4.0 * g[..., 0] - 1.5 * g[..., 1])[..., None]
        gr = image_gradients(img)
        np.testing.assert_allclose(gr[..., 0, 0], 4.0, atol=1e-5)
        np.testing.assert_allclose(gr[..., 0, 1], -1.5, atol=1e-5)


class TestWindows:
    def test_gaussian_normalized(self):
        k = gaussian_kernel_1d(5, 1.0)
        assert np.isclose(float(jnp.sum(k)), 1.0, atol=1e-6)

    def test_separable_constant(self):
        x = jnp.ones((9, 9, 2))
        out = separable_filter(x, gaussian_kernel_1d(5, 1.0), mode="same_edge")
        np.testing.assert_allclose(out, 1.0, atol=1e-5)

    def test_matches_numpy_conv(self, rng):
        x = np.zeros((11, 11, 1), np.float32)
        x[5, 5, 0] = 1.0
        k = np.asarray(gaussian_kernel_1d(5, 1.2))
        out = separable_filter(jnp.asarray(x), jnp.asarray(k), mode="same_zero")
        expect = np.outer(k, k)
        np.testing.assert_allclose(np.asarray(out)[3:8, 3:8, 0], expect, atol=1e-6)


class TestPyramid:
    def test_shapes(self):
        shapes = pyramid_shapes(100, 61, 4)
        assert shapes == [(100, 61), (50, 31), (25, 16), (13, 8)]

    def test_auto_levels(self):
        # 1024 -> 512 -> 256 -> 128 -> 64 -> 32: the coarsest level lands in
        # [min_size, 2*min_size) — a 2*min_size coarsest proved one level too
        # shallow for unaided large-displacement capture (config.py
        # min_level_size rationale; golden gate probed 0.79 vs 0.9999 SSIM)
        assert auto_n_levels(1024, 1024, 32) == 6
        assert auto_n_levels(48, 48, 32) == 1       # already < 2*min_size
        assert auto_n_levels(256, 256, 16) == 5     # 256 .. 16

    def test_pyramid_list(self, rng):
        img = jnp.asarray(rng.random((64, 48, 3), dtype=np.float32))
        pyr = gaussian_pyramid(img, 3)
        assert [p.shape[:2] for p in pyr] == [(64, 48), (32, 24), (16, 12)]

    def test_downsample_constant(self):
        img = jnp.full((32, 32, 1), 0.7)
        d = downsample_2x(img)
        np.testing.assert_allclose(d, 0.7, atol=1e-5)

    def test_field_upsample_scales_values(self):
        v = jnp.ones((8, 8, 2))
        up = upsample_field_2x(v, (16, 16))
        np.testing.assert_allclose(up, 2.0, atol=1e-5)


class TestPoisson:
    def test_poisson_recovers_smooth_function(self):
        # x(y, x) = cos(pi y / H) has Neumann BCs; check Lap x -> solve -> x
        h, w = 32, 24
        ys = jnp.arange(h)[:, None] * jnp.ones((1, w))
        x = jnp.cos(jnp.pi * (ys + 0.5) / h)
        lap = (
            jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
            + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1) - 4 * x
        )
        # fix rolled edges to reflect Neumann (mirror) BCs
        lap = lap.at[0].set(x[1] + x[0] + 2 * x[0] - 4 * x[0] + (x[0] - x[0]))
        lap = lap.at[0].set(x[1] - x[0])
        lap = lap.at[-1].set(x[-2] - x[-1])
        sol = poisson_solve_dct(lap)
        sol = sol - sol.mean() + x.mean()
        np.testing.assert_allclose(np.asarray(sol), np.asarray(x), atol=2e-2)

    def test_screened_poisson_limits(self, rng):
        t = jnp.asarray(rng.random((16, 16), dtype=np.float32))
        # mu -> 0: identity
        out = screened_poisson_dct(t, alpha=1.0, mu=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-4)
        # mu -> huge: flat at the mean
        out2 = screened_poisson_dct(t, alpha=1.0, mu=1e8)
        np.testing.assert_allclose(np.asarray(out2), float(t.mean()), atol=1e-3)

    def test_divergence_adjoint(self, rng):
        # <grad x, g> = -<x, div g> up to boundary handling
        x = jnp.asarray(rng.random((12, 12), dtype=np.float32))
        gy, gx = forward_gradients(x)
        d = divergence(gy, gx)
        # Laplacian via div(grad) of a linear fn is ~0 in the interior
        lin = grid_coords(12, 12)[..., 0] * 2.0
        gy2, gx2 = forward_gradients(lin)
        lap = divergence(gy2, gx2)
        np.testing.assert_allclose(np.asarray(lap)[1:-1, 1:-1], 0.0, atol=1e-5)
        assert d.shape == x.shape

    def test_pull_push_fills_hole(self):
        img = jnp.ones((32, 32, 3)) * 0.5
        weight = jnp.ones((32, 32)).at[10:20, 10:20].set(0.0)
        img = img.at[10:20, 10:20].set(0.0)  # hole content should not matter
        out = pull_push_extend(img, weight)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)

    def test_pull_push_keeps_valid(self, rng):
        img = jnp.asarray(rng.random((16, 16, 1), dtype=np.float32))
        weight = jnp.ones((16, 16))
        out = pull_push_extend(img, weight)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_traced_dct_basis_matches_f64_reference():
    """The on-device exact-integer-phase DCT basis == the f64 numpy one."""
    from videomorphing_tpu.ops.poisson import _dct_mat, _dct_mat_np

    for n in [7, 64, 480, 1080]:
        ref = _dct_mat_np(n)
        got = np.asarray(_dct_mat(n, jnp.float32))
        assert np.abs(got - ref).max() < 3e-7, n


def test_median3x3_matches_numpy():
    """Paeth's 19-exchange network == np.median over the 9-neighborhood
    (edge-replicated), per channel."""
    from videomorphing_tpu.ops.windows import median3x3

    rng = np.random.default_rng(3)
    x = rng.standard_normal((17, 23, 2)).astype(np.float32)
    got = np.asarray(median3x3(jnp.asarray(x)))
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    want = np.stack(
        [
            np.median(
                np.stack(
                    [xp[dy : dy + 17, dx : dx + 23, c] for dy in range(3) for dx in range(3)],
                    0,
                ),
                0,
            )
            for c in range(2)
        ],
        -1,
    )
    np.testing.assert_array_equal(got, want)


def test_median3x3_rejects_impulse_keeps_smooth():
    """An isolated impulse vanishes (the spiked pixel returns to its local
    ramp value); away from the spike a linear ramp is a fixed point. The
    spike's 8 neighbors may legally shift by ONE order statistic (the
    outlier displaces one sample in their window), i.e. by at most one
    local ramp step — never toward the spike's magnitude."""
    from videomorphing_tpu.ops.windows import median3x3

    ramp = (jnp.arange(12.0)[:, None] + 2.0 * jnp.arange(9.0)[None, :])[..., None]
    spiked = ramp.at[5, 4, 0].add(100.0)
    out = np.asarray(median3x3(spiked))
    r = np.asarray(ramp)
    # spike removed: back to within one ramp step of the true value
    assert abs(out[5, 4, 0] - r[5, 4, 0]) <= 2.0 + 1e-6
    # neighbors move at most one step; the rest of the INTERIOR is exact
    # (the 1-px border ring legally shifts: edge replication biases the
    # window's order statistics on a ramp — which is why the solver holds
    # the locked boundary components out of the filter via bmask)
    err = np.abs(out - r)
    assert err[4:7, 3:6].max() <= 2.0 + 1e-6
    mask = np.zeros_like(err, bool)
    mask[1:-1, 1:-1] = True
    mask[4:7, 3:6] = False
    np.testing.assert_allclose(err[mask], 0.0, atol=1e-6)
