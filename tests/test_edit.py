"""The GUI-free interactive loop (SURVEY.md section 4 stack E): a scripted
edit -> warm re-solve -> preview round trip through the terminal editor."""

import io
import json

import numpy as np
import pytest

from videomorphing_tpu.config import MorphParams, SynthParams
from videomorphing_tpu.edit import PointEditor, ansi_image
from videomorphing_tpu.ops.resample import grid_coords


def _blob(h, w, cy, cx, sigma=4.0):
    import jax.numpy as jnp

    g = grid_coords(h, w)
    d2 = (g[..., 0] - cy) ** 2 + (g[..., 1] - cx) ** 2
    img = jnp.exp(-0.5 * d2 / sigma**2)
    return jnp.stack([img, 0.8 * img, 0.6 * img], -1)


class TestAnsiImage:
    def test_renders_halfblocks(self):
        img = np.zeros((8, 8, 3), np.float32)
        img[:, :4] = [1.0, 0.0, 0.0]
        s = ansi_image(img, max_cols=8)
        assert "▀" in s
        assert "38;2;255;0;0" in s  # red foreground present
        assert s.count("\n") == 3  # 8 rows -> 4 half-block lines


class TestEditorLoop:
    def test_scripted_round_trip(self, tmp_path):
        """add -> solve -> move -> solve (warm) -> preview -> save."""
        h = w = 48
        i0 = _blob(h, w, 24, 20)
        i1 = _blob(h, w, 24, 28)
        out = io.StringIO()
        pts_path = str(tmp_path / "pts.json")
        ed = PointEditor(
            i0, i1,
            mp=MorphParams(n_levels=2, iters_coarse=30, iters_fine=15),
            sp=SynthParams(blend_mode="linear", quadratic_paths=False),
            out_path=pts_path,
            stream=out,
            show_images=False,
        )
        script = [
            "add 24 20 24 28",
            "list",
            "solve",
            "move 0 24.0 20.0 24.0 28.0",
            "solve",            # second solve is warm-started
            "preview 0.5",
            "save",
            "quit",
        ]
        assert ed.run(script) == 0
        assert ed.solves == 2
        text = out.getvalue()
        assert "solved in" in text and "warm=True" in text
        # the saved JSON round-trips through the CLI points loader
        with open(pts_path) as f:
            d = json.load(f)
        assert np.asarray(d["points"]).shape == (1, 2, 2)
        # the session produced a usable field: halfway blob sits near x=24
        v = np.asarray(ed.session.art.v)
        assert abs(v[20:29, 21:28, 1].mean() - 4.0) < 1.5

    def test_bad_commands_do_not_crash(self):
        i0 = _blob(16, 16, 8, 8)
        out = io.StringIO()
        ed = PointEditor(i0, i0, stream=out, show_images=False)
        assert ed.run(["bogus", "del 5", "move x", "", "# comment", "quit"]) == 0
        assert "unknown command" in out.getvalue()

    def test_render_writes_frames(self, tmp_path):
        import os

        i0 = _blob(24, 24, 12, 10)
        i1 = _blob(24, 24, 12, 14)
        out = io.StringIO()
        ed = PointEditor(
            i0, i1,
            mp=MorphParams(n_levels=2, iters_coarse=15, iters_fine=8),
            sp=SynthParams(blend_mode="linear", quadratic_paths=False),
            stream=out,
            show_images=False,
        )
        clip = str(tmp_path / "frames.npz")
        ed.run([f"render {clip} 4", "quit"])
        assert os.path.exists(clip)
        assert np.load(clip)["frames"].shape == (4, 24, 24, 3)


class TestCursorMode:
    def test_decode_keys(self):
        from videomorphing_tpu.edit import decode_keys

        data = b"\x1b[A\x1b[B\x1b[C\x1b[D wWSad us q"
        evs = list(decode_keys(data))
        assert evs == [
            "up", "down", "right", "left", "place", "UP", "UP", "DOWN",
            "LEFT", "RIGHT", "place", "undo", "solve", "place", "quit",
        ]
        # bare ESC and Ctrl-C both quit
        assert list(decode_keys(b"\x1b")) == ["quit"]
        assert list(decode_keys(b"\x03")) == ["quit"]

    def test_cursor_places_pairs_and_solves(self):
        """Event-driven cursor session: move, place A, place B, undo, solve."""
        h = w = 48
        i0 = _blob(h, w, 24, 20)
        i1 = _blob(h, w, 24, 28)
        out = io.StringIO()
        ed = PointEditor(
            i0, i1,
            mp=MorphParams(n_levels=2, iters_coarse=20, iters_fine=10),
            sp=SynthParams(blend_mode="linear", quadratic_paths=False),
            stream=out,
            show_images=False,
        )
        events = [
            "LEFT", "up", "place",          # A point at (23, 14)
            "RIGHT", "RIGHT", "place",      # B point at (23, 34) -> pair 0
            "place", "undo",                # pending A dropped
            "solve",
            "quit",
        ]
        ed.cmd_cursor(events)
        assert len(ed.pairs) == 1
        (a, b) = ed.pairs[0]
        assert a == [23.0, 14.0] and b == [23.0, 34.0]
        assert ed.solves == 1
        assert "pending A point dropped" in out.getvalue()
