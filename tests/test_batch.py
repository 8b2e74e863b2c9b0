"""Config-5 batch pipeline tests on the 8-virtual-device CPU mesh.

Equivalence contract: a pair solved through the sharded batch step must
match the same pair solved alone through the single-pair driver (the batch
path is pure DP — no cross-pair coupling exists to change the math).
"""

import json
import os

import numpy as np
import pytest

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.parallel.mesh import make_mesh


def _pair(rng, h=40, w=48, shift=2.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = rng.random((h, w, 3), dtype=np.float32)
    for _ in range(2):
        tex = 0.25 * (
            np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
            + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
        )

    def img(cx):
        blob = np.exp(-0.5 * ((yy - h / 2) ** 2 + (xx - cx) ** 2) / (h * 0.15) ** 2)
        return np.clip(0.3 + 0.4 * tex + 0.5 * blob[..., None], 0, 1).astype(np.float32)

    return img(w / 2 - shift), img(w / 2 + shift)


@pytest.fixture(scope="module")
def fast_params():
    return MorphParams(iters_coarse=12, n_levels=2), SynthParams(
        quadratic_paths=False, blend_mode="linear"
    )


class TestRunManifest:
    def test_matches_single_pair(self, rng, fast_params):
        from videomorphing_tpu import api
        from videomorphing_tpu.parallel.batch import run_manifest

        mp, sp = fast_params
        mesh = make_mesh()
        jobs = []
        for k in range(3):
            i0, i1 = _pair(rng, shift=1.5 + k)
            pts = (
                np.asarray([[[20.0, 22.0], [20.0, 26.0]]], np.float32)
                if k == 1 else None
            )
            jobs.append(dict(i0=i0, i1=i1, points=pts, n_frames=3 + k))

        outs = run_manifest(jobs, mesh, mp, sp)
        assert len(outs) == 3
        for k, (job, frames) in enumerate(zip(jobs, outs)):
            nf = job["n_frames"]
            assert frames.shape == (nf, 40, 48, 3)
            ref = np.asarray(
                api.morph_pair(job["i0"], job["i1"], job["points"], nf, mp, sp)
            )
            # exact equality across jit boundaries is not attainable: the
            # line search's discrete accept/reject amplifies fusion-order
            # float noise; the contract is matching morph quality
            err = np.abs(frames - ref)
            assert err.mean() < 5e-3 and np.quantile(err, 0.99) < 0.05, (
                f"job {k}: mean {err.mean():.4g} p99 {np.quantile(err, 0.99):.4g}"
            )

    def test_point_padding_is_inert(self):
        """Far-off-domain pad points rasterize to exactly zero constraint
        maps — identical to the N=0 fast path, so padded jobs solve the
        same energy as their unpadded form."""
        import jax.numpy as jnp

        from videomorphing_tpu.solver.constraints import rasterize_point_constraints

        hw = (40, 48)
        pad = jnp.full((3, 2, 2), -1e6, jnp.float32)
        w_pad, vt_pad = rasterize_point_constraints(pad, hw, sigma=8.0)
        w0, vt0 = rasterize_point_constraints(jnp.zeros((0, 2, 2), jnp.float32), hw, 8.0)
        np.testing.assert_array_equal(np.asarray(w_pad), np.asarray(w0))
        np.testing.assert_array_equal(np.asarray(vt_pad), np.asarray(vt0))

        # mixed real+pad == real alone, exactly
        real = jnp.asarray([[[20.0, 22.0], [20.0, 26.0]]], jnp.float32)
        w_m, vt_m = rasterize_point_constraints(jnp.concatenate([real, pad]), hw, 8.0)
        w_r, vt_r = rasterize_point_constraints(real, hw, 8.0)
        np.testing.assert_allclose(np.asarray(w_m), np.asarray(w_r), atol=0)
        np.testing.assert_allclose(np.asarray(vt_m), np.asarray(vt_r), atol=0)


class TestStreamingClipBatch:
    def test_streamed_matches_per_pair(self, rng, tmp_path, fast_params):
        from videomorphing_tpu import api
        from videomorphing_tpu.io.clips import open_clip_reader, write_vmc
        from videomorphing_tpu.parallel.batch import StreamingBatchRunner

        mp, sp = fast_params
        mesh = make_mesh()
        t_len, h, w = 11, 40, 48  # not a multiple of 8: exercises padding
        clip_a = np.stack([_pair(rng, h, w, shift=1 + 0.2 * k)[0] for k in range(t_len)])
        clip_b = np.stack([_pair(rng, h, w, shift=1 + 0.2 * k)[1] for k in range(t_len)])
        pa, pb = str(tmp_path / "a.vmc"), str(tmp_path / "b.vmc")
        write_vmc(pa, clip_a)
        write_vmc(pb, clip_b)
        # .vmc stores quantize to uint8: compare against the quantized clips
        from videomorphing_tpu.io.clips import read_vmc

        clip_a, clip_b = read_vmc(pa), read_vmc(pb)

        runner = StreamingBatchRunner(mesh, mp, sp)
        got = {}
        for s, frames in runner.run_clip_pair(
            open_clip_reader(pa, block=8), open_clip_reader(pb, block=8),
            t_len, (h, w),
        ):
            got[s] = frames
        out = np.concatenate([got[s] for s in sorted(got)], axis=0)
        assert out.shape == (t_len, h, w, 3)

        times = np.linspace(0.0, 1.0, t_len, dtype=np.float32)
        for k in [0, 5, 10]:
            art = api.solve_pair(clip_a[k], clip_b[k], None, mp, sp)
            ref = np.asarray(
                api.ImageMorpher(mp, sp).render(
                    api._dev(clip_a[k]), api._dev(clip_b[k]), art,
                    np.asarray([times[k]], np.float32),
                )
            )[0]
            err = np.abs(out[k] - ref)
            assert err.mean() < 5e-3 and np.quantile(err, 0.99) < 0.05, (
                f"frame {k}: mean {err.mean():.4g} p99 {np.quantile(err, 0.99):.4g}"
            )


class TestVmcWriter:
    def test_incremental_roundtrip(self, rng, tmp_path):
        from videomorphing_tpu.io.clips import VmcWriter, read_vmc, read_vmc_header

        frames = rng.random((7, 12, 16, 3)).astype(np.float32)
        path = str(tmp_path / "out.vmc")
        with VmcWriter(path) as wr:
            wr.append(frames[:3])
            wr.append(frames[3:6])
            wr.append(frames[6])  # single frame, 3-D
        assert read_vmc_header(path) == (7, 12, 16, 3)
        got = read_vmc(path)
        np.testing.assert_allclose(got, frames, atol=1 / 255.0 + 1e-6)


class TestBatchCli:
    def test_manifest_cli(self, rng, tmp_path, fast_params):
        from videomorphing_tpu import cli
        from videomorphing_tpu.io.clips import read_vmc_header
        from videomorphing_tpu.io.images import save_image

        i0, i1 = _pair(rng)
        a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
        save_image(a, i0)
        save_image(b, i1)
        out = str(tmp_path / "m.vmc")
        manifest = str(tmp_path / "jobs.json")
        with open(manifest, "w") as f:
            json.dump({"jobs": [{"a": a, "b": b, "n_frames": 2, "out": out}]}, f)
        rc = cli.main(
            ["batch", "--manifest", manifest, "--levels", "2", "--iters", "8",
             "--no-quadratic-paths", "--blend", "linear"]
        )
        assert rc == 0
        assert read_vmc_header(out)[0] == 2

    def test_clip_cli(self, rng, tmp_path):
        from videomorphing_tpu import cli
        from videomorphing_tpu.io.clips import read_vmc_header, write_vmc

        t_len, h, w = 5, 40, 48
        clip_a = np.stack([_pair(rng, h, w)[0] for _ in range(t_len)])
        clip_b = np.stack([_pair(rng, h, w)[1] for _ in range(t_len)])
        pa, pb = str(tmp_path / "a.vmc"), str(tmp_path / "b.vmc")
        write_vmc(pa, clip_a)
        write_vmc(pb, clip_b)
        out = str(tmp_path / "out.vmc")
        rc = cli.main(
            ["batch", "--clip-a", pa, "--clip-b", pb, "--out", out,
             "--levels", "2", "--iters", "8", "--no-quadratic-paths",
             "--blend", "linear"]
        )
        assert rc == 0
        assert read_vmc_header(out) == (t_len, h, w, 3)


def test_stream_blocks_larger_than_mesh_rechunk(rng, tmp_path, fast_params):
    """Reader block size > mesh block size used to crash in _pad_block
    (negative np.repeat); the runner now re-chunks the stream (round-2
    review). 6-frame clips read in blocks of 8 over a 4-device mesh."""
    from videomorphing_tpu import api
    from videomorphing_tpu.io.clips import open_clip_reader, write_vmc
    from videomorphing_tpu.parallel.batch import StreamingBatchRunner
    from videomorphing_tpu.parallel.mesh import make_mesh

    mp, sp = fast_params
    mesh = make_mesh((4,), ("batch",))
    t_len, h, w = 6, 40, 48
    clip_a = np.stack([_pair(rng, h, w, shift=1 + 0.2 * k)[0] for k in range(t_len)])
    clip_b = np.stack([_pair(rng, h, w, shift=1 + 0.2 * k)[1] for k in range(t_len)])
    pa, pb = str(tmp_path / "a.vmc"), str(tmp_path / "b.vmc")
    write_vmc(pa, clip_a)
    write_vmc(pb, clip_b)

    runner = StreamingBatchRunner(mesh, mp, sp)
    got = {}
    for s, frames in runner.run_clip_pair(
        open_clip_reader(pa, block=8), open_clip_reader(pb, block=8),
        t_len, (h, w),
    ):
        got[s] = frames
    out = np.concatenate([got[s] for s in sorted(got)], axis=0)
    assert out.shape == (t_len, h, w, 3)
    assert np.isfinite(out).all()
