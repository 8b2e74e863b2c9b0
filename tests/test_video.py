"""Video pipeline tests: flow, occlusion, propagation, scan solve
(SURVEY.md section 5 "Temporal")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams
from videomorphing_tpu.ops.resample import grid_coords
from videomorphing_tpu.video.flow import clip_flows, flow_pair
from videomorphing_tpu.video.occlusion import occlusion_confidence
from videomorphing_tpu.video.pipeline import morph_video, solve_clip_fields
from videomorphing_tpu.video.temporal import advect_halfway_field, bilinear_splat, track_points


def _blob_frame(h, w, cy, cx, sigma=4.0, c=3):
    g = grid_coords(h, w)
    d2 = (g[..., 0] - cy) ** 2 + (g[..., 1] - cx) ** 2
    img = jnp.exp(-0.5 * d2 / sigma**2)
    return jnp.stack([img, 0.8 * img, 0.6 * img], -1)[..., :c]


def _moving_clip(t_len, h, w, start, vel):
    return jnp.stack(
        [_blob_frame(h, w, start[0] + k * vel[0], start[1] + k * vel[1]) for k in range(t_len)]
    )


class TestFlow:
    def test_translation_flow(self):
        h = w = 48
        a = _blob_frame(h, w, 24, 20)
        b = _blob_frame(h, w, 24, 23)
        vp = VideoParams(flow_alpha=12.0, flow_iters=80, flow_warps=4)
        u = flow_pair(a, b, vp)
        # HS flow maps a->b with b(p+u)=a(p): blob at x=20 in a corresponds
        # to x=23 in b -> u_x ~ +3 near the blob
        region = np.asarray(u)[20:29, 16:25]
        assert abs(region[..., 1].mean() - 3.0) < 0.5, region[..., 1].mean()
        assert abs(region[..., 0].mean()) < 0.3

    def test_robust_flow_survives_brightness_shift(self):
        """The robust mode (flow_robust) must recover flow under an additive
        lighting change that biases plain Horn-Schunck: the structure-texture
        prefilter removes the shift's frequency band, the coupled Charbonnier
        penalty keeps residual outliers from dominating (VERDICT r1 missing
        #6). Texture is multi-scale (periods ~9-64 px) so every pyramid
        level carries signal — a high-frequency-only texture leaves the
        coarse levels unconstrained and ANY solver diverges there."""
        h = w = 64
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

        def tex(y, x):
            val = (
                np.cos(0.10 * x + 0.03 * y)
                + np.cos(0.21 * y - 0.07 * x + 1.3)
                + np.cos(0.33 * x + 0.11 * y + 0.7)
                + np.cos(0.55 * y + 0.25 * x + 2.1)
            )
            return (0.45 + 0.06 * val).astype(np.float32)

        dy, dx = 1.5, 2.5
        a = jnp.asarray(np.stack([tex(yy, xx)] * 3, -1))
        # b(p + u) = a(p) with u=(dy,dx) => b(y,x) = a(y-dy, x-dx); +0.15
        # additive brightness shift (stays inside [0,1]; clipping would
        # destroy the constancy assumptions for both solvers)
        b = jnp.asarray(np.stack([tex(yy - dy, xx - dx) + 0.15] * 3, -1))

        interior = (slice(8, -8), slice(8, -8))
        truth = np.array([dy, dx], np.float32)

        def epe(u):
            return float(
                np.mean(np.linalg.norm(np.asarray(u)[interior] - truth, axis=-1))
            )

        base = dict(flow_iters=60, flow_warps=4, flow_clamp=1.5, flow_scale=1.0)
        e_plain = epe(flow_pair(a, b, VideoParams(**base)))
        e_robust = epe(flow_pair(a, b, VideoParams(flow_robust=True, **base)))
        # probed: plain ~8.2 px EPE, robust ~0.58 (the flow is a warm-start
        # prior — sub-pixel on a 2.9 px displacement is ample)
        assert e_robust < 0.75, (e_robust, e_plain)
        assert e_robust < 0.2 * e_plain, (e_robust, e_plain)

    def test_robust_flow_matches_plain_on_clean_translation(self):
        """Sanity: on clean constant translation the robust mode is at least
        as accurate as plain HS (no robustness penalty on easy input)."""
        h = w = 48
        a = _blob_frame(h, w, 24, 20)
        b = _blob_frame(h, w, 24, 23)
        base = dict(flow_iters=80, flow_warps=4, flow_scale=1.0)
        u = flow_pair(a, b, VideoParams(flow_robust=True, **base))
        region = np.asarray(u)[20:29, 16:25]
        assert abs(region[..., 1].mean() - 3.0) < 0.5, region[..., 1].mean()
        assert abs(region[..., 0].mean()) < 0.3

    def test_clip_flows_shapes(self):
        clip = _moving_clip(4, 24, 24, (12, 8), (0, 1))
        fwd, bwd = clip_flows(clip, VideoParams(flow_iters=20))
        assert fwd.shape == (3, 24, 24, 2)
        assert bwd.shape == (3, 24, 24, 2)


class TestOcclusion:
    def test_consistent_flows_confident(self):
        f = jnp.full((16, 16, 2), 1.0)
        conf = occlusion_confidence(f, -f, VideoParams())
        assert float(conf.mean()) > 0.85

    def test_inconsistent_flows_occluded(self):
        f = jnp.full((16, 16, 2), 3.0)
        conf = occlusion_confidence(f, f, VideoParams())  # round trip = 6px
        assert float(conf.mean()) < 0.15

    def test_fused_path_matches_gather_path(self, rng):
        """The TPU default routes the round-trip lookup through the Pallas
        fused sampler (config.fused_occlusion); forced on here (interpret
        mode off-TPU) it must match the plain-gather path to float
        tolerance on a realistic smooth-but-wiggly flow pair."""
        h, w = 72, 132  # off tile multiples: exercises the padded tail
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        fwd = np.stack(
            [1.5 * np.sin(xx / 17.0) + 0.3, 2.0 * np.cos(yy / 23.0)], -1
        ) + rng.standard_normal((h, w, 2)).astype(np.float32) * 0.05
        bwd = -np.stack(
            [1.5 * np.sin(xx / 19.0), 2.0 * np.cos(yy / 13.0) - 0.2], -1
        )
        fwd, bwd = jnp.asarray(fwd), jnp.asarray(bwd)
        ref = occlusion_confidence(fwd, bwd, VideoParams(), use_fused=False)
        got = occlusion_confidence(fwd, bwd, VideoParams(), use_fused=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestTemporal:
    def test_splat_roundtrip(self, rng):
        h = w = 16
        vals = jnp.asarray(rng.random((h, w, 2), dtype=np.float32))
        g = grid_coords(h, w)
        acc, wgt = bilinear_splat(vals, g, (h, w))
        np.testing.assert_allclose(np.asarray(wgt), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(vals), atol=1e-5)

    def test_advect_under_common_translation(self):
        # both clips translate by (0, 1): endpoints shift together, so the
        # halfway field is preserved (shifted by one pixel)
        h = w = 24
        v_prev = jnp.zeros((h, w, 2)).at[..., 1].set(1.5)
        flow = jnp.zeros((h, w, 2)).at[..., 1].set(1.0)
        tc_v, tc_w = advect_halfway_field(v_prev, flow, flow, VideoParams())
        inner = np.asarray(tc_v)[4:-4, 4:-4]
        np.testing.assert_allclose(inner[..., 1], 1.5, atol=1e-2)
        assert float(np.asarray(tc_w)[4:-4, 4:-4].mean()) > 0.9

    def test_gather_advect_matches_splat_oracle(self, rng):
        """The gather-based inversion must agree with the forward-splat
        oracle on a smooth deformation (where both are well-defined)."""
        from videomorphing_tpu.video.temporal import advect_halfway_field_splat

        h = w = 48
        g = grid_coords(h, w)
        # smooth low-frequency field and flows
        ph = 2 * np.pi * g[..., 0] / h
        pw = 2 * np.pi * g[..., 1] / w
        v_prev = jnp.stack([0.8 * jnp.sin(ph), 1.2 * jnp.cos(pw)], -1)
        flow_a = jnp.stack([0.5 * jnp.cos(pw), 1.0 + 0.4 * jnp.sin(ph)], -1)
        flow_b = jnp.stack([-0.3 * jnp.sin(pw), 0.8 - 0.4 * jnp.cos(ph)], -1)
        vp = VideoParams()
        tc_v, tc_w = advect_halfway_field(v_prev, flow_a, flow_b, vp)
        sp_v, sp_w = advect_halfway_field_splat(v_prev, flow_a, flow_b, vp)
        both = (np.asarray(tc_w)[..., 0] > 0.5) & (np.asarray(sp_w)[..., 0] > 0.5)
        inner = np.zeros((h, w), bool)
        inner[6:-6, 6:-6] = True
        m = both & inner
        assert m.mean() > 0.5  # the valid regions overlap substantially
        diff = np.abs(np.asarray(tc_v) - np.asarray(sp_v))[m]
        assert diff.max() < 0.15, diff.max()

    def test_track_points(self):
        flow = jnp.zeros((16, 16, 2)).at[..., 1].set(2.0)
        pts = jnp.asarray([[[8.0, 4.0], [8.0, 6.0]]])
        out = track_points(pts, flow, flow)
        np.testing.assert_allclose(np.asarray(out), [[[8, 6], [8, 8]]], atol=1e-5)

    def test_track_keyframe_points(self):
        """Keyframe points track forward/backward by flow and re-anchor at
        keyframes (drift correction, EGSR14 s3)."""
        from videomorphing_tpu.video.temporal import track_keyframe_points

        t_len, h, w = 6, 16, 16
        # uniform +1 px/frame x-translation in both clips
        fwd = jnp.zeros((t_len - 1, h, w, 2)).at[..., 1].set(1.0)
        bwd = jnp.zeros((t_len - 1, h, w, 2)).at[..., 1].set(-1.0)
        # keyframes at 2 and 4; the frame-4 value deliberately disagrees
        # with pure tracking (user corrected +0.5 of drift)
        key_idx = [2, 4]
        key_pts = jnp.asarray(
            [
                [[[8.0, 4.0], [8.0, 6.0]]],
                [[[8.0, 6.5], [8.0, 8.5]]],
            ]
        )
        out = np.asarray(
            track_keyframe_points(t_len, key_idx, key_pts, fwd, bwd, fwd, bwd)
        )
        assert out.shape == (t_len, 1, 2, 2)
        # keyframes are authoritative
        np.testing.assert_allclose(out[2], np.asarray(key_pts[0]), atol=1e-5)
        np.testing.assert_allclose(out[4], np.asarray(key_pts[1]), atol=1e-5)
        # forward tracking from keyframe 2: frame 3 = keyframe2 + 1px
        np.testing.assert_allclose(out[3, 0, 0], [8.0, 5.0], atol=1e-5)
        # after keyframe 4: continues from the CORRECTED value
        np.testing.assert_allclose(out[5, 0, 0], [8.0, 7.5], atol=1e-5)
        # before the first keyframe: tracked backward (x decreases)
        np.testing.assert_allclose(out[1, 0, 0], [8.0, 3.0], atol=1e-5)
        np.testing.assert_allclose(out[0, 0, 0], [8.0, 2.0], atol=1e-5)

    def test_pipeline_accepts_keyframe_dict(self):
        t_len, h, w = 4, 32, 32
        clip_a = _moving_clip(t_len, h, w, (16, 10), (0, 1))
        clip_b = _moving_clip(t_len, h, w, (16, 14), (0, 1))
        mp = MorphParams(n_levels=2, iters_coarse=20, iters_fine=10)
        vp = VideoParams(flow_iters=20)
        pts = {
            0: np.asarray([[[16.0, 10.0], [16.0, 14.0]]], np.float32),
            3: np.asarray([[[16.0, 13.0], [16.0, 17.0]]], np.float32),
        }
        fields, tracked, _ = solve_clip_fields(clip_a, clip_b, pts, mp, vp)
        assert fields.shape == (t_len, h, w, 2)
        assert tracked.shape == (t_len, 1, 2, 2)
        np.testing.assert_allclose(
            np.asarray(tracked[3]), pts[3], atol=1e-5
        )


class TestPipeline:
    def test_moving_blob_video(self):
        # clip A: blob moving right from x=10; clip B: same blob offset +4 in x
        t_len, h, w = 4, 32, 32
        clip_a = _moving_clip(t_len, h, w, (16, 10), (0, 1))
        clip_b = _moving_clip(t_len, h, w, (16, 14), (0, 1))
        mp = MorphParams(n_levels=2, iters_coarse=40, iters_fine=20)
        vp = VideoParams(flow_iters=30)
        fields, tracked, _flows = solve_clip_fields(clip_a, clip_b, None, mp, vp)
        assert fields.shape == (t_len, h, w, 2)
        # every frame's halfway field should be ~(0, +2) near the blob
        for k in range(t_len):
            cx = 12 + k  # halfway blob center x
            reg = np.asarray(fields)[k, 12:21, cx - 3 : cx + 4]
            assert abs(reg[..., 1].mean() - 2.0) < 0.8, (k, reg[..., 1].mean())

    def test_morph_video_renders(self):
        t_len, h, w = 3, 24, 24
        clip_a = _moving_clip(t_len, h, w, (12, 8), (0, 1))
        clip_b = _moving_clip(t_len, h, w, (12, 12), (0, 1))
        mp = MorphParams(n_levels=2, iters_coarse=20, iters_fine=10)
        res = morph_video(
            clip_a, clip_b,
            mp=mp,
            sp=SynthParams(blend_mode="linear"),
            vp=VideoParams(flow_iters=20),
        )
        assert res.frames.shape == clip_a.shape
        assert res.fields.shape == (t_len, h, w, 2)
        # first output frame is ~clip A frame 0, last ~clip B frame 2
        np.testing.assert_allclose(
            np.asarray(res.frames[0]), np.asarray(clip_a[0]), atol=0.12
        )
        np.testing.assert_allclose(
            np.asarray(res.frames[-1]), np.asarray(clip_b[-1]), atol=0.12
        )


class TestWarmStartContract:
    def test_propagated_start_needs_fewer_iterations(self):
        """SURVEY.md section 5 "Temporal": the propagated field must converge
        in >= 2x fewer iterations than a cold start, and land on ~the same
        field. Measured with the solver's own tol-based early stop — the
        iteration counts are convergence data, not output-diff probes."""
        from videomorphing_tpu.solver.constraints import rasterize_point_constraints
        from videomorphing_tpu.solver.ctf import optimize_pair
        from videomorphing_tpu.solver.descent import make_level_solver
        from videomorphing_tpu.solver.energy import make_level_data

        h = w = 48
        clip_a = _moving_clip(2, h, w, (24, 18), (0, 1))
        clip_b = _moving_clip(2, h, w, (24, 22), (0, 1))
        mp = MorphParams(n_levels=3, iters_coarse=300, iters_fine=300, tol=1e-6)

        # cold: frame 1 from scratch, full pyramid, tol-stopped
        res_cold = optimize_pair(clip_a[1], clip_b[1], params=mp)
        cold_iters = sum(int(s.iters) for s in res_cold.level_stats)

        # warm: frame 0 solved, field advected by the two flows, finest
        # level only, SAME energy (no TC term — isolates the init benefit)
        res0 = optimize_pair(clip_a[0], clip_b[0], params=mp)
        vp = VideoParams(flow_iters=40)
        fa = flow_pair(clip_a[0], clip_a[1], vp)
        fb = flow_pair(clip_b[0], clip_b[1], vp)
        tc_v, _tc_w = advect_halfway_field(res0.v, fa, fb, vp)

        ui_w, ui_v = rasterize_point_constraints(
            jnp.zeros((0, 2, 2), jnp.float32), (h, w), mp.ui_sigma, jnp.float32
        )
        data = make_level_data(clip_a[1], clip_b[1], ui_w, ui_v)
        v_warm, st = make_level_solver(mp, 300)(tc_v, data)
        warm_iters = int(st.iters)

        assert warm_iters * 2 <= cold_iters, (warm_iters, cold_iters)
        # propagated-then-polished field ~ cold field near the blob
        reg = np.s_[16:33, 16:33]
        diff = np.abs(np.asarray(v_warm)[reg] - np.asarray(res_cold.v)[reg])
        assert diff.mean() < 0.25, diff.mean()


class TestResume:
    def test_resume_matches_full_solve(self):
        """Entering the warm scan mid-clip (checkpoint resume) reproduces
        the full solve's remaining fields."""
        from videomorphing_tpu.video.pipeline import resume_clip_fields

        t_len, h, w = 5, 32, 32
        clip_a = _moving_clip(t_len, h, w, (16, 10), (0, 1))
        clip_b = _moving_clip(t_len, h, w, (16, 14), (0, 1))
        mp = MorphParams(n_levels=2, iters_coarse=20, iters_fine=10)
        vp = VideoParams(flow_iters=20)
        fields, _, _ = solve_clip_fields(clip_a, clip_b, None, mp, vp)

        start = 3
        vs = resume_clip_fields(clip_a, clip_b, fields[start - 1], start, None, mp, vp)
        assert vs.shape == (t_len - start, h, w, 2)
        # same math entered mid-scan; only cross-executable fp noise differs
        err = np.abs(np.asarray(vs) - np.asarray(fields[start:]))
        assert err.mean() < 2e-2, err.mean()

    def test_cli_resume_skips_solved_frames(self, tmp_path):
        from videomorphing_tpu import cli
        from videomorphing_tpu.io.clips import write_vmc, read_vmc_header
        from videomorphing_tpu.utils.checkpoint import FieldStore

        t_len, h, w = 3, 32, 32
        clip_a = np.asarray(_moving_clip(t_len, h, w, (16, 10), (0, 1)))
        clip_b = np.asarray(_moving_clip(t_len, h, w, (16, 14), (0, 1)))
        pa, pb = str(tmp_path / "a.vmc"), str(tmp_path / "b.vmc")
        write_vmc(pa, clip_a)
        write_vmc(pb, clip_b)
        fields_path = str(tmp_path / "fields.npz")
        out = str(tmp_path / "m.vmc")
        common = ["video", pa, pb, "--out", out, "--fields", fields_path,
                  "--levels", "2", "--iters", "10", "--no-quadratic-paths",
                  "--blend", "linear"]
        assert cli.main(common) == 0
        store = FieldStore(fields_path)
        assert store.first_pending() == t_len  # all frames checkpointed
        # second run resumes: all frames skipped, output still written
        out2 = str(tmp_path / "m2.vmc")
        assert cli.main(common[:4] + [out2] + common[5:]) == 0
        assert read_vmc_header(out2)[0] == t_len


class TestWarmLevels:
    """Configurable warm-solve schedule (VERDICT r1 weak #8: the 2-level
    schedule had no coarse safety net when the warm start is poor)."""

    def test_auto_level_count(self):
        from videomorphing_tpu.video.pipeline import warm_level_count

        vp = VideoParams()
        assert warm_level_count((480, 854), vp) == 1       # round-4 default
        assert warm_level_count((1080, 1920), vp) == 1     # (stressor-gated)
        assert warm_level_count((2160, 3840), vp) == 3     # 4K safety net
        assert warm_level_count((1080, 1920), VideoParams(warm_levels=3)) == 3
        # clamp: coarsest level must stay >= 8 px
        assert warm_level_count((24, 24), VideoParams(warm_levels=4)) == 2

    def test_warm_relin_every_overrides_solver_cadence(self):
        """video.warm_relin_every must reach the warm solver: cadence 1
        (exact re-warp every iteration) and the default 12 (one initial
        warp per level) give DIFFERENT fields on content where the
        linearization drifts, and cadence == morph.relin_every when 0."""
        import dataclasses

        from videomorphing_tpu.video.pipeline import _make_warm_solver

        h, w = 64, 64
        u = 3.0
        a = _blob_frame(h, w, 32, 32 - u, sigma=6.0)
        b = _blob_frame(h, w, 32, 32 + u, sigma=6.0)
        mp = MorphParams(backend="jnp")
        pts = jnp.zeros((0, 2, 2), jnp.float32)
        z2 = jnp.zeros((h, w, 2), jnp.float32)
        tc_w = jnp.zeros((h, w, 1), jnp.float32)

        def run(vp):
            warm = _make_warm_solver(mp, (h, w), vp)
            v, _aux = jax.jit(warm)(a, b, pts, z2, z2, tc_w)
            return np.asarray(v)

        v_exact = run(VideoParams(warm_relin_every=1, warm_levels=1))
        v_lazy = run(VideoParams(warm_relin_every=12, warm_levels=1))
        v_inherit = run(VideoParams(warm_relin_every=0, warm_levels=1))
        v_mp = run(
            VideoParams(warm_relin_every=mp.relin_every, warm_levels=1)
        )
        # the knob is live (cadences differ on drifting content) ...
        assert float(np.abs(v_exact - v_lazy).max()) > 1e-6
        # ... and 0 = inherit morph.relin_every exactly
        np.testing.assert_array_equal(v_inherit, v_mp)

    def test_three_levels_recover_from_bad_warm_start(self):
        """With a ~12 px displacement and a ZERO warm start (the bad-
        advection regime), the half-res mid level sees 6 px — beyond the
        SSIM window's capture range — so the 2-level warm solve stalls;
        the 3-level schedule recovers substantially through its coarse
        level (probed: err 3.96 px -> 1.99 px at these settings)."""
        from videomorphing_tpu.video.pipeline import _make_warm_solver

        h, w = 96, 96
        u = 6.0  # halfway displacement: images are 2u = 12 px apart
        a = _blob_frame(h, w, 48, 48 - u, sigma=7.0)
        b = _blob_frame(h, w, 48, 48 + u, sigma=7.0)
        mp = MorphParams()
        pts = jnp.zeros((0, 2, 2), jnp.float32)
        v0 = jnp.zeros((h, w, 2), jnp.float32)
        tc_v = jnp.zeros((h, w, 2), jnp.float32)
        tc_w = jnp.zeros((h, w, 1), jnp.float32)

        errs = {}
        for n in (2, 3):
            warm = _make_warm_solver(mp, (h, w), VideoParams(warm_levels=n))
            v, _aux = jax.jit(warm)(a, b, pts, v0, tc_v, tc_w)
            reg = np.asarray(v)[40:57, 40:57, 1]  # x-component near the blob
            errs[n] = abs(float(reg.mean()) - u)
        assert errs[3] < 2.5, errs
        assert errs[3] < 0.65 * errs[2], errs


class TestAdvectResidualUnits:
    def test_reduced_scale_confidence_matches_fullres_semantics(self):
        """advect_residual is documented in FULL-res pixels; the reduced-
        resolution inversion (advect_scale=0.5, engages at >=128 px)
        measures its residual in low-res pixels, so the threshold must be
        converted — the unconverted form was ~2x too permissive (round-2
        review). Pin: half-res confidence agrees with full-res semantics,
        and the old (unconverted) semantics is measurably more permissive."""
        from videomorphing_tpu.ops.windows import gaussian_kernel_1d, separable_filter
        from videomorphing_tpu.video.temporal import advect_halfway_field

        h = w = 128
        xx = jnp.arange(w)[None, :] * jnp.ones((h, 1))
        # colliding flow (left half +6 px, right half -6, smoothed): the
        # inversion residual lands in the sensitive band near the fold
        step = jnp.where(xx < w // 2, 6.0, -6.0).astype(jnp.float32)
        k = gaussian_kernel_1d(9, 2.0, jnp.float32)
        step = separable_filter(step[..., None], k)[..., 0]
        fa = jnp.stack([jnp.zeros_like(step), step], -1)
        v = jnp.zeros((h, w, 2), jnp.float32) + 0.5

        _, conf_full = advect_halfway_field(v, fa, fa, VideoParams(advect_scale=1.0))
        _, conf_half = advect_halfway_field(v, fa, fa, VideoParams(advect_scale=0.5))
        # the OLD unconverted semantics == half-res with the residual doubled
        _, conf_old = advect_halfway_field(
            v, fa, fa, VideoParams(advect_scale=0.5, advect_residual=1.5)
        )
        mf = float(conf_full.mean())
        mh = float(conf_half.mean())
        mo = float(conf_old.mean())
        assert mo - mf > 0.005, (mo, mf)          # old form: more permissive
        assert abs(mh - mf) < 0.5 * (mo - mf), (mh, mf, mo)  # fixed: agrees
