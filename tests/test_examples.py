"""Smoke tests for the examples/ demos (SURVEY.md section 4 stacks C/E:
the user surface must actually run)."""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_demo(script: str, outdir: str, env_extra: dict) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), outdir,
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_demo_video_smoke(tmp_path):
    out = _run_demo(
        "demo_video.py", str(tmp_path),
        {"VMORPH_DEMO_SHAPE": "4x72x104"},
    )
    assert "morph.y4m" in out
    for f in ("morph.y4m", "layered.y4m", "strip.png", "fields.png",
              "frames/frame_0000.png"):
        assert (tmp_path / f).exists(), f
    # playable y4m: starts with the YUV4MPEG2 magic
    with open(tmp_path / "morph.y4m", "rb") as fh:
        assert fh.read(9) == b"YUV4MPEG2"
