"""Driver entry points, IO round trips, project files, checkpoint store."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.io.clips import load_clip, read_vmc, save_clip, write_vmc
from videomorphing_tpu.io.images import to_float, to_uint8
from videomorphing_tpu.io.project import Project, load_project, save_project
from videomorphing_tpu.utils.checkpoint import FieldStore


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = graft.entry()
        out_v, out_e = jax.jit(fn)(*args)
        assert out_v.shape == args[0].shape
        assert np.isfinite(float(out_e))

    def test_dryrun_multichip(self):
        graft.dryrun_multichip(8)


class TestClipIO:
    def test_vmc_roundtrip(self, rng, tmp_path):
        frames = rng.integers(0, 255, (5, 16, 24, 3), dtype=np.uint8)
        p = str(tmp_path / "c.vmc")
        write_vmc(p, frames)
        back = read_vmc(p)
        np.testing.assert_allclose(back, to_float(frames), atol=1e-7)
        part = read_vmc(p, start=2, count=2)
        np.testing.assert_allclose(part, to_float(frames[2:4]), atol=1e-7)

    def test_npz_roundtrip(self, rng, tmp_path):
        frames = rng.random((3, 8, 8, 3)).astype(np.float32)
        p = str(tmp_path / "c.npz")
        save_clip(p, frames)
        back = load_clip(p)
        np.testing.assert_allclose(back, to_float(to_uint8(frames)), atol=1e-7)

    def test_frame_dir_roundtrip(self, rng, tmp_path):
        frames = rng.random((3, 8, 8, 3)).astype(np.float32)
        d = str(tmp_path / "frames")
        save_clip(d, frames)
        back = load_clip(d)
        assert back.shape == frames.shape

    def test_native_stream_matches_numpy(self, rng, tmp_path):
        pytest.importorskip("videomorphing_tpu.utils.native")
        from videomorphing_tpu.utils.native import VmcStream, ensure_built

        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        frames = rng.integers(0, 255, (7, 12, 20, 3), dtype=np.uint8)
        p = str(tmp_path / "c.vmc")
        write_vmc(p, frames)
        got = np.zeros((7, 12, 20, 3), np.float32)
        s = VmcStream(p, block=3)
        for start, blk in s:
            got[start : start + blk.shape[0]] = blk
        s.close()
        np.testing.assert_allclose(got, to_float(frames), atol=1e-7)


class TestProject:
    def test_roundtrip(self, tmp_path):
        proj = Project(
            source_a="a.png",
            source_b="b.png",
            points=np.asarray([[[1.0, 2.0], [3.0, 4.0]]], np.float32),
            n_frames=8,
            morph=MorphParams(lambda_tps=0.123),
            output="out",
        )
        p = str(tmp_path / "job.json")
        save_project(p, proj)
        back = load_project(p)
        assert back.n_frames == 8
        assert back.morph.lambda_tps == pytest.approx(0.123)
        # untouched defaults survive
        assert back.morph.gamma_ui == MorphParams().gamma_ui
        np.testing.assert_allclose(back.points, proj.points)


class TestFieldStore:
    def test_resume_cycle(self, tmp_path, rng):
        p = str(tmp_path / "fields.npz")
        st = FieldStore(p)
        st.init(5, 8, 8)
        assert st.first_pending() == 0
        v = rng.random((2, 8, 8, 2)).astype(np.float32)
        st.put([0, 1], v, v)
        st.save()

        st2 = FieldStore(p)
        assert st2.first_pending() == 2
        got_v, got_b = st2.fields()
        np.testing.assert_allclose(got_v[:2], v, atol=1e-6)


def test_endpoint_ssim_metric(rng):
    from videomorphing_tpu.utils.logging import endpoint_ssim

    a = rng.random((24, 32, 3)).astype(np.float32)
    b = rng.random((24, 32, 3)).astype(np.float32)
    frames = np.stack([a, 0.5 * (a + b), b])
    m = endpoint_ssim(frames, a, b)
    assert m["ssim_t0_vs_a"] > 0.999
    assert m["ssim_t1_vs_b"] > 0.999
    m2 = endpoint_ssim(np.stack([b, a]), a, b)  # wrong endpoints -> low
    assert m2["ssim_t0_vs_a"] < 0.9


def test_cli_set_overrides():
    """--set section.field=value reaches every config field; --flow-robust
    and --sampling map to their dataclass fields (the ergonomic aliases)."""
    from videomorphing_tpu.cli import _params_from_args, build_parser

    ap = build_parser()
    args = ap.parse_args(
        ["pair", "a.png", "b.png", "--sampling", "bicubic",
         "--set", "morph.ssim_window=7", "--set", "video.flow_gamma=20",
         "--set", "synth.invert_iters=4", "--set", "video.flow_robust=true"]
    )
    mp, sp, vp = _params_from_args(args)
    assert mp.ssim_window == 7
    assert sp.sampling == "bicubic"
    assert sp.invert_iters == 4
    assert vp.flow_gamma == 20.0 and isinstance(vp.flow_gamma, float)
    assert vp.flow_robust is True

    import pytest

    with pytest.raises(SystemExit):
        _params_from_args(ap.parse_args(["pair", "a", "b", "--set", "morph.nope=1"]))
    with pytest.raises(SystemExit):
        _params_from_args(ap.parse_args(["pair", "a", "b", "--set", "bogus.x=1"]))
