"""Distribution tests on the 8-virtual-device CPU mesh (SURVEY.md section 5
"Distributed without a cluster"). The key test pins the spatially sharded
solver to the single-device oracle to tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter
from videomorphing_tpu.parallel.frames import optimize_pairs_batched, render_clip_sharded
from videomorphing_tpu.parallel.halo import halo_exchange_rows
from videomorphing_tpu.parallel.mesh import make_mesh
from videomorphing_tpu.parallel.spatial import make_spatial_level_solver
from videomorphing_tpu.solver.descent import make_level_solver
from videomorphing_tpu.solver.energy import make_level_data
from videomorphing_tpu.synth.render import render_clip


def _smooth(rng, h, w, c=3):
    img = jnp.asarray(rng.random((h, w, c), dtype=np.float32))
    k = gaussian_kernel_1d(5, 1.5)
    return separable_filter(img, k, k, mode="same_edge")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_names=("y",))


class TestSpatialPairSolve:
    def test_full_ctf_matches_single_device(self, rng, mesh):
        """The full coarse-to-fine spatial solve (the --spatial-shards
        product path) pins to the plain optimize_pair oracle."""
        from videomorphing_tpu.parallel.spatial import optimize_pair_spatial
        from videomorphing_tpu.solver.ctf import optimize_pair

        n = len(jax.devices())
        h, w = 16 * n, 48  # levels 128 and 64: both divide 8
        i0 = _smooth(rng, h, w)
        i1 = jnp.roll(i0, 2, axis=1)
        mp = MorphParams(n_levels=2, iters_coarse=20, iters_fine=10, backend="jnp")

        ref = optimize_pair(i0, i1, params=mp)
        res = optimize_pair_spatial(i0, i1, params=mp, mesh=mesh)
        assert res.v.shape == (h, w, 2)
        err = np.abs(np.asarray(res.v) - np.asarray(ref.v))
        # Distribution-aware tolerances: XLA schedules elementwise chains
        # (FMA/reassociation) differently between the sharded and local
        # programs, so inputs to the iterative solve differ at the LSB and
        # an Armijo accept can flip at ISOLATED pixels (observed max ~0.02
        # from a 1e-7 pyramid seed). A real halo/sharding bug shifts whole
        # boundary bands instead — p99 catches that class tightly.
        assert np.percentile(err, 99) < 5e-3, np.percentile(err, 99)
        assert err.max() < 0.05, err.max()

    def test_coarse_levels_fall_back_locally(self, rng, mesh):
        """Heights that stop dividing the mesh at coarse levels still solve
        (single-device fallback for those levels only)."""
        from videomorphing_tpu.parallel.spatial import optimize_pair_spatial

        h, w = 8 * len(jax.devices()) + 8, 32  # 72 rows: 72 % 8 != 0
        i0 = _smooth(rng, h, w)
        i1 = jnp.roll(i0, 1, axis=1)
        mp = MorphParams(n_levels=2, iters_coarse=10, iters_fine=5, backend="jnp")
        res = optimize_pair_spatial(i0, i1, params=mp, mesh=mesh)
        assert res.v.shape == (h, w, 2)
        assert np.isfinite(np.asarray(res.v)).all()


class TestHalo:
    def test_halo_exchange_matches_global(self, mesh):
        n = len(jax.devices())
        h, w = 8 * n, 6
        x = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
        halo = 2

        def fn(blk):
            return halo_exchange_rows(blk, halo, "y")

        out = jax.shard_map(
            fn, mesh=mesh, in_specs=P("y"), out_specs=P("y"), check_vma=False
        )(x)
        # each device block of the output must equal the zero-padded global
        # slice [start-halo, end+halo)
        out = np.asarray(out).reshape(n, 8 + 2 * halo, w)
        xp = np.pad(np.asarray(x), ((halo, halo), (0, 0)))
        for i in range(n):
            np.testing.assert_array_equal(out[i], xp[i * 8 : i * 8 + 8 + 2 * halo])


class TestSpatialSolver:
    @pytest.mark.parametrize("n_colors", [1, 2])
    def test_matches_single_device(self, rng, mesh, n_colors):
        n = len(jax.devices())
        h, w = 8 * n, 48
        i0 = _smooth(rng, h, w)
        i1 = _smooth(rng, h, w)
        p = MorphParams(n_colors=n_colors, lambda_tps=0.01)
        n_iters = 6

        data = make_level_data(i0, i1)
        v0 = jnp.zeros((h, w, 2))

        ref_solve = jax.jit(make_level_solver(p, n_iters))
        v_ref, st_ref = ref_solve(v0, data)

        sp_solve = make_spatial_level_solver(p, n_iters, mesh, axis="y")
        v_sp, st_sp = sp_solve(v0, data)

        np.testing.assert_allclose(
            float(st_sp.e0), float(st_ref.e0), rtol=1e-5
        )
        # psum reduction order differs from the global sum -> tiny fp noise
        # accumulates over iterations; tolerance covers that, not semantics
        np.testing.assert_allclose(
            np.asarray(v_sp), np.asarray(v_ref), atol=2e-3, rtol=0
        )
        np.testing.assert_allclose(
            float(st_sp.e_final), float(st_ref.e_final), rtol=1e-4
        )

    def test_pallas_shard_matches_single_device(self, rng, mesh):
        """The fused-Pallas shard path (VERDICT round 3 missing #2): each
        device runs the sweep kernels on its row block with real neighbor
        halos in the pack; must match the single-device Pallas solve."""
        n = len(jax.devices())
        h, w = 8 * n, 48
        i0 = _smooth(rng, h, w)
        i1 = _smooth(rng, h, w)
        p = MorphParams(backend="pallas", lambda_tps=0.01)
        n_iters = 6

        data = make_level_data(i0, i1)
        v0 = jnp.zeros((h, w, 2))

        v_ref, st_ref = jax.jit(make_level_solver(p, n_iters))(v0, data)
        sp_solve = make_spatial_level_solver(p, n_iters, mesh, axis="y")
        v_sp, st_sp = sp_solve(v0, data)

        np.testing.assert_allclose(float(st_sp.e0), float(st_ref.e0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(v_sp), np.asarray(v_ref), atol=2e-3, rtol=0
        )
        np.testing.assert_allclose(
            float(st_sp.e_final), float(st_ref.e_final), rtol=1e-4
        )

    @pytest.mark.parametrize("backend", ["jnp", "pallas"])
    def test_relin_median_matches_single_device(self, rng, mesh, backend):
        """relin_median parity: the sharded median sees real neighbor rows
        at block seams and edge-replicates at the true domain edges,
        exactly like descent's single-device median3x3."""
        n = len(jax.devices())
        h, w = 8 * n, 48
        i0 = _smooth(rng, h, w)
        i1 = _smooth(rng, h, w)
        p = MorphParams(backend=backend, relin_median=True, relin_every=2)
        n_iters = 6

        data = make_level_data(i0, i1)
        v0 = jnp.zeros((h, w, 2))

        v_ref, st_ref = jax.jit(make_level_solver(p, n_iters))(v0, data)
        v_sp, st_sp = make_spatial_level_solver(p, n_iters, mesh, axis="y")(v0, data)
        np.testing.assert_allclose(
            np.asarray(v_sp), np.asarray(v_ref), atol=2e-3, rtol=0
        )
        np.testing.assert_allclose(
            float(st_sp.e_final), float(st_ref.e_final), rtol=1e-4
        )


class TestFrameDP:
    def test_render_clip_sharded_matches_local(self, rng, mesh):
        i0 = _smooth(rng, 24, 24)
        i1 = _smooth(rng, 24, 24)
        v = jnp.zeros((24, 24, 2)).at[..., 1].set(1.0)
        ts = jnp.linspace(0.0, 1.0, 11)  # not a multiple of 8: tests padding
        sp = SynthParams(blend_mode="linear")
        local = render_clip(i0, i1, v, None, ts, sp)
        sharded = render_clip_sharded(i0, i1, v, None, ts, mesh, sp, axis="y")
        assert sharded.shape == local.shape
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(local), atol=1e-5)

    def test_optimize_pairs_batched(self, rng, mesh):
        n = len(jax.devices())
        h = w = 32
        i0s = jnp.stack([_smooth(rng, h, w) for _ in range(n)])
        i1s = jnp.roll(i0s, 2, axis=2)  # shift each pair in x by 2
        p = MorphParams(n_levels=2, iters_coarse=30, iters_fine=15)
        v = optimize_pairs_batched(i0s, i1s, mesh, params=p, axis="y")
        assert v.shape == (n, h, w, 2)
        # each pair should find vx ~ +1 halfway shift in the interior
        center = np.asarray(v)[:, 12:20, 12:20, 1]
        assert abs(center.mean() - 1.0) < 0.5


@pytest.mark.slow
def test_spatial_solver_with_split_pack():
    """Spatial (halo-sharded) solve composed with the split-pack Pallas
    path (warp_into_pack): must trace, run, and agree with the
    single-device split-pack solve — insurance for flipping the
    warp_into_pack default after the on-chip A/B."""
    from videomorphing_tpu.parallel.mesh import make_mesh
    from videomorphing_tpu.parallel.spatial import make_spatial_level_solver
    from videomorphing_tpu.pallas.warp import packed_plane_geometry
    from videomorphing_tpu.solver.descent import make_level_solver
    from videomorphing_tpu.solver.energy import make_level_data

    h, w = 128, 512  # big enough that the packed geometry engages
    mp = MorphParams(backend="pallas", warp_into_pack=True)
    assert packed_plane_geometry(mp, h, w) is not None

    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    i1 = jnp.roll(i0, 2, axis=1)
    v0 = jnp.zeros((h, w, 2), jnp.float32)
    data = make_level_data(i0, i1)

    v_ref, st_ref = jax.jit(make_level_solver(mp, 4))(v0, data)
    mesh = make_mesh((2,), ("y",))
    v_sp, st_sp = make_spatial_level_solver(mp, 4, mesh=mesh, axis="y")(v0, data)
    np.testing.assert_allclose(np.asarray(v_sp), np.asarray(v_ref), atol=1e-4)
    assert abs(float(st_sp.e_final) - float(st_ref.e_final)) < 1e-4
