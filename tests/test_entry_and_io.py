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

    def test_y4m_roundtrip_444(self, rng, tmp_path):
        """C444 .y4m survives a write/read cycle to BT.601 rounding error."""
        frames = rng.random((4, 17, 23, 3)).astype(np.float32)
        p = str(tmp_path / "c.y4m")
        save_clip(p, frames, fps=24)
        from videomorphing_tpu.io.y4m import read_y4m_header

        t, h, w, chroma, fps = read_y4m_header(p)
        assert (t, h, w, chroma, fps) == (4, 17, 23, "444", (24, 1))
        back = load_clip(p)
        assert back.shape == frames.shape
        # limited-range quantization: ~1/219 max step in Y, small matrix mix
        assert np.abs(back - frames).max() < 0.02

    def test_y4m_roundtrip_420(self, rng, tmp_path):
        """C420jpeg: even dims required, chroma subsampled but luma tight."""
        from videomorphing_tpu.io.y4m import read_y4m, write_y4m

        # grayscale content: chroma is constant (128), so the 2x2 chroma
        # subsampling is exact and the roundtrip is quantization-tight.
        # (Random per-pixel chroma genuinely loses ~0.05 through any 4:2:0
        # encode — box-averaged chroma leaves gamut and the RGB clamp
        # shifts luma — so it would test the colorspace, not the codec.)
        gray = rng.random((3, 16, 24, 1)).astype(np.float32)
        frames = np.repeat(gray, 3, axis=-1)
        p = str(tmp_path / "c420.y4m")
        write_y4m(p, frames, chroma="420jpeg")
        back = read_y4m(p)
        assert back.shape == frames.shape
        assert np.abs(back - frames).max() < 0.02
        with pytest.raises(ValueError):
            write_y4m(str(tmp_path / "odd.y4m"), frames[:, :15], chroma="420jpeg")

    def test_y4m_empty_clip_and_foreign_markers(self, rng, tmp_path):
        """Zero-frame clips round-trip (valid header, T=0), and frame
        counting survives spec-legal per-frame parameter strings
        ('FRAME Ixxx') from third-party tools (review findings)."""
        from videomorphing_tpu.io.y4m import read_y4m, read_y4m_header, write_y4m

        p = str(tmp_path / "empty.y4m")
        write_y4m(p, np.zeros((0, 8, 10, 3), np.float32))
        t, h, w, *_ = read_y4m_header(p)
        assert (t, h, w) == (0, 8, 10)
        assert read_y4m(p).shape == (0, 8, 10, 3)

        frames = rng.random((3, 8, 10, 3)).astype(np.float32)
        q = str(tmp_path / "param.y4m")
        write_y4m(q, frames)
        raw = open(q, "rb").read().replace(b"FRAME\n", b"FRAME Ip X7\n")
        with open(q, "wb") as f:
            f.write(raw)
        assert read_y4m_header(q)[0] == 3
        assert read_y4m(q).shape == frames.shape

    def test_y4m_incremental_writer_and_blocks(self, rng, tmp_path):
        """Streaming writer == one-shot writer; block reader re-chunks."""
        from videomorphing_tpu.io.clips import open_clip_reader
        from videomorphing_tpu.io.y4m import Y4mWriter, read_y4m

        frames = rng.random((5, 12, 20, 3)).astype(np.float32)
        p = str(tmp_path / "inc.y4m")
        with Y4mWriter(p) as wr:
            wr.append(frames[:2])
            wr.append(frames[2])      # single (H, W, C) frame
            wr.append(frames[3:])
        back = read_y4m(p)
        assert back.shape == frames.shape
        got = np.zeros_like(frames)
        for s, blk in open_clip_reader(p, block=2):
            got[s : s + blk.shape[0]] = blk
        np.testing.assert_array_equal(got, back)

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


class TestXmlImport:
    """Reference-style XML project import (io/project_xml.py — best-effort,
    the reference schema itself is [RECON]-unverified)."""

    def test_image_project(self, tmp_path):
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<?xml version="1.0"?>
        <project>
          <image0>a.png</image0>
          <image1>b.png</image1>
          <settings w_tps="0.02" weight_ui="80" frames="12" output="res.npz"/>
          <points>
            <pair x0="10" y0="20" x1="14" y1="26"/>
            <pair x0="40" y0="50" x1="44" y1="56"/>
          </points>
        </project>"""
        p = str(tmp_path / "job.xml")
        with open(p, "w") as f:
            f.write(xml)
        proj, report = import_xml_project(p)
        assert proj.source_a.endswith("a.png")
        assert proj.source_b.endswith("b.png")
        assert proj.n_frames == 12
        assert proj.output.endswith("res.npz")
        assert proj.morph.lambda_tps == pytest.approx(0.02)
        assert proj.morph.gamma_ui == pytest.approx(80.0)
        # XML (x, y) -> Project (y, x)
        np.testing.assert_allclose(
            proj.points, [[[20, 10], [26, 14]], [[50, 40], [56, 44]]]
        )
        assert report["mapped"]

    def test_keyframes_and_single_point_pairs(self, tmp_path):
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<project>
          <videoA>clips/a.vmc</videoA>
          <videoB>clips/b.vmc</videoB>
          <correspondences frame="0">
            <point x="1" y="2"/> <point x="3" y="4"/>
            <point x="5" y="6"/> <point x="7" y="8"/>
          </correspondences>
          <correspondences frame="12">
            <point x="9" y="10"/> <point x="11" y="12"/>
          </correspondences>
        </project>"""
        p = str(tmp_path / "vid.xml")
        with open(p, "w") as f:
            f.write(xml)
        proj, _ = import_xml_project(p)
        assert isinstance(proj.points, dict) and set(proj.points) == {0, 12}
        np.testing.assert_allclose(
            proj.points[0], [[[2, 1], [4, 3]], [[6, 5], [8, 7]]]
        )
        np.testing.assert_allclose(proj.points[12], [[[10, 9], [12, 11]]])

    def test_layers_and_skip_report(self, tmp_path):
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<project>
          <source_left>a.png</source_left>
          <source_right>b.png</source_right>
          <layer0 mask_a="m0.png" mask_b="m1.png">
            <pair x0="1" y0="1" x1="2" y1="2"/>
          </layer0>
          <mystery_knob>42</mystery_knob>
        </project>"""
        p = str(tmp_path / "lay.xml")
        with open(p, "w") as f:
            f.write(xml)
        proj, report = import_xml_project(p)
        assert proj.layers and proj.layers[0]["mask_a"].endswith("m0.png")
        assert proj.layers[0]["points"] == [[[1.0, 1.0], [2.0, 2.0]]]
        assert any("mystery_knob" in s for s in report["skipped"])

    def test_output_name_not_taken_as_source(self, tmp_path):
        """'outputfile' contains the source keyword 'file' but is a
        destination; it must not displace a real source (review finding)."""
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<project>
          <outputfile>res.y4m</outputfile>
          <image0>a.png</image0><image1>b.png</image1>
        </project>"""
        p = str(tmp_path / "o.xml")
        with open(p, "w") as f:
            f.write(xml)
        proj, _ = import_xml_project(p)
        assert proj.source_a.endswith("a.png")
        assert proj.source_b.endswith("b.png")
        assert proj.output.endswith("res.y4m")

    def test_unconsumed_group_attrs_reported(self, tmp_path):
        """Attributes inside a claimed layer/points group that the import
        did not consume must appear in the skipped report (review finding)."""
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<project>
          <image0>a.png</image0><image1>b.png</image1>
          <layer0 mask_a="m0.png" mask_b="m1.png" opacity="0.5">
            <pair x0="1" y0="1" x1="2" y1="2"/>
          </layer0>
        </project>"""
        p = str(tmp_path / "u.xml")
        with open(p, "w") as f:
            f.write(xml)
        _, report = import_xml_project(p)
        assert any("opacity" in s for s in report["skipped"])

    def test_needs_two_sources(self, tmp_path):
        from videomorphing_tpu.io.project_xml import import_xml_project

        p = str(tmp_path / "bad.xml")
        with open(p, "w") as f:
            f.write("<project><image0>a.png</image0></project>")
        with pytest.raises(ValueError):
            import_xml_project(p)

    def test_import_then_save_roundtrips(self, tmp_path):
        """Imported project survives the JSON save/load cycle (the CLI
        `vmorph import` path)."""
        from videomorphing_tpu.io.project_xml import import_xml_project

        xml = """<project>
          <fileA>x.png</fileA><fileB>y.png</fileB>
          <points><pair x0="0" y0="0" x1="4" y1="4"/></points>
        </project>"""
        p = str(tmp_path / "r.xml")
        with open(p, "w") as f:
            f.write(xml)
        proj, _ = import_xml_project(p)
        j = str(tmp_path / "r.json")
        save_project(j, proj)
        back = load_project(j)
        assert back.source_a == proj.source_a
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
