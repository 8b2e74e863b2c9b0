"""Kernel-equivalence tests: fused Pallas sweep kernels vs their jnp twins.

SURVEY.md section 5 "Kernel equivalence": every Pallas kernel is validated
against a plain-jnp oracle. On CPU the kernels run in Pallas interpret mode
(same kernel code, interpreted), which is what CI exercises; on TPU the
compiled Mosaic path takes over with identical semantics (checked manually
on hardware; tolerances hold there too).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videomorphing_tpu.config import MorphParams
from videomorphing_tpu.solver.descent import (
    energy_value_grad_precond,
    linearized_warps,
    make_level_solver,
    total_energy_planes,
    value_grad_precond_planes,
    warp_bundle,
)
from videomorphing_tpu.solver.energy import make_level_data, total_energy
from videomorphing_tpu.pallas.sweep import (
    fused_total_energy,
    fused_total_energy_planes,
    fused_value_grad_precond,
    fused_value_grad_precond_planes,
)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12))


def _case(h, w, seed=0, with_maps=True):
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    v = jnp.asarray(0.8 * rng.standard_normal((h, w, 2)).astype(np.float32))
    if with_maps:
        data = make_level_data(
            i0, i1,
            jnp.asarray(rng.random((h, w, 1), dtype=np.float32)),
            jnp.asarray(rng.standard_normal((h, w, 2)).astype(np.float32)),
            jnp.asarray(rng.random((h, w, 1), dtype=np.float32)),
            jnp.asarray(rng.standard_normal((h, w, 2)).astype(np.float32)),
        )
    else:
        data = make_level_data(i0, i1)
    return v, data


# odd size (masking/padding), multi-row-tile, multi-column-tile
SHAPES = [(33, 47), (96, 130), (130, 300)]


@pytest.mark.parametrize("hw", SHAPES)
def test_fused_energy_matches_oracle(hw):
    v, data = _case(*hw)
    p = MorphParams()
    e_ref = total_energy(v, data, p)
    e_pl = fused_total_energy(v, data, p, interpret=True)
    assert _rel(e_ref, e_pl) < 1e-5


@pytest.mark.parametrize("hw", SHAPES)
def test_fused_grad_precond_matches_oracle(hw):
    v, data = _case(*hw)
    p = MorphParams()
    e_ref, g_ref, pc_ref = energy_value_grad_precond(v, data, p)
    e_pl, g_pl, pc_pl = fused_value_grad_precond(v, data, p, interpret=True)
    assert _rel(e_ref, e_pl) < 1e-5
    assert _rel(g_ref, g_pl) < 1e-5
    assert _rel(pc_ref, pc_pl) < 1e-5


def test_fused_linearized_planes_match_oracle():
    """The warping-scheme path: linearized planes away from the warp point."""
    h, w = 48, 80
    v, data = _case(h, w, seed=3)
    p = MorphParams()
    wb = warp_bundle(v, data)
    rng = np.random.default_rng(7)
    v2 = v + jnp.asarray(0.3 * rng.standard_normal((h, w, 2)).astype(np.float32))
    w0e, w1e = linearized_warps(wb, v2)

    e_ref = total_energy_planes(w0e, w1e, v2, data, p)
    e_pl = fused_total_energy_planes(w0e, w1e, v2, data, p, interpret=True)
    assert _rel(e_ref, e_pl) < 1e-5

    e2_ref, g_ref, pc_ref = value_grad_precond_planes(w0e, wb.dw0, w1e, wb.dw1, v2, data, p)
    e2_pl, g_pl, pc_pl = fused_value_grad_precond_planes(
        w0e, wb.dw0, w1e, wb.dw1, v2, data, p, interpret=True
    )
    assert _rel(e2_ref, e2_pl) < 1e-5
    assert _rel(g_ref, g_pl) < 1e-5
    assert _rel(pc_ref, pc_pl) < 1e-5


def test_linearization_exact_at_warp_point():
    v, data = _case(40, 56, seed=5)
    wb = warp_bundle(v, data)
    w0e, w1e = linearized_warps(wb, v)
    np.testing.assert_allclose(np.asarray(w0e), np.asarray(wb.w0), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1e), np.asarray(wb.w1), rtol=0, atol=1e-6)


def test_level_solver_backends_agree():
    """Same trajectory through the level solve on both backends.

    Both paths implement identical math (pallas in interpret mode on CPU),
    so the converged fields must agree tightly.
    """
    rng = np.random.default_rng(11)
    h, w = 40, 64
    base = rng.random((h + 8, w + 8, 3), dtype=np.float32)
    for _ in range(3):
        base = 0.25 * (
            np.roll(base, 1, 0) + np.roll(base, -1, 0)
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
        )
    i0 = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
    i1 = jnp.asarray(base[4 : 4 + h, 2 : 2 + w])  # 2px shift
    data = make_level_data(i0, i1)
    v0 = jnp.zeros((h, w, 2), jnp.float32)

    p_jnp = MorphParams(backend="jnp", n_colors=2, relin_every=4)
    p_pl = MorphParams(backend="pallas", n_colors=2, relin_every=4)
    v_jnp, st_jnp = make_level_solver(p_jnp, 12)(v0, data)
    v_pl, st_pl = make_level_solver(p_pl, 12)(v0, data)

    assert _rel(v_jnp, v_pl) < 1e-4
    assert _rel(st_jnp.e_final, st_pl.e_final) < 1e-5


def test_warping_scheme_converges_on_translation():
    """relin_every > 1 still recovers a known translation (quality guard)."""
    rng = np.random.default_rng(2)
    h, w = 48, 48
    base = rng.random((h, w + 8, 3), dtype=np.float32)
    for _ in range(4):
        base = 0.25 * (
            np.roll(base, 1, 0) + np.roll(base, -1, 0)
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
        )
    i0 = jnp.asarray(base[:, 4 : 4 + w])
    # i0(p - v) = base(p - v + 4), i1(p + v) = base(p + v + 2): equal at vx = +1
    i1 = jnp.asarray(base[:, 2 : 2 + w])
    data = make_level_data(i0, i1)
    v0 = jnp.zeros((h, w, 2), jnp.float32)

    results = {}
    for k in (1, 4):
        # relin_median OFF: this test isolates the WARPING-SCHEME cadence,
        # and at relin_every=1 the (default-on) median would re-filter the
        # field every single iteration — 60 filter passes flatten the
        # sub-pixel descent signal on this 48^2 case
        p = MorphParams(backend="jnp", relin_every=k, relin_median=False)
        v_f, st = make_level_solver(p, 60)(v0, data)
        results[k] = (v_f, float(st.e0), float(st.e_final))
        # energy must decrease substantially
        assert results[k][2] < 0.7 * results[k][1]
        # descent must move the field in the true direction (vx > 0)
        assert float(np.median(np.asarray(v_f)[8:-8, 8:-8, 1])) > 0.1
    # the lazy-rewarp scheme must not cost solution quality
    assert results[4][2] < 1.1 * results[1][2]


# ---------------------------------------------------------------------------
# fused warp kernel (pallas.warp)
# ---------------------------------------------------------------------------

from videomorphing_tpu.ops.resample import bilinear_sample_with_grad, grid_coords
from videomorphing_tpu.pallas.warp import fused_warp_pair, make_warp_source


def _warp_case(h, w, kind, seed=0):
    rng = np.random.default_rng(seed)
    i0 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    if kind == "zero":
        v = np.zeros((h, w, 2), np.float32)
    elif kind == "const":
        v = np.full((h, w, 2), 7.3, np.float32)
    elif kind == "smooth":
        v = np.stack([1.5 * np.sin(yy / 40), 2 * np.cos(xx / 50)], -1).astype(np.float32)
    else:  # wild: exceeds the kernel budget -> exercises the XLA fallback
        v = 30 * rng.standard_normal((h, w, 2)).astype(np.float32)
    return i0, i1, jnp.asarray(v)


@pytest.mark.parametrize("kind", ["zero", "const", "smooth", "wild"])
@pytest.mark.parametrize("hw", [(48, 64), (70, 300)])
def test_fused_warp_matches_gather(hw, kind):
    h, w = hw
    i0, i1, v = _warp_case(h, w, kind)
    g = grid_coords(h, w, jnp.float32)
    w0r, dw0r = bilinear_sample_with_grad(i0, g - v)
    w1r, dw1r = bilinear_sample_with_grad(i1, g + v)
    w0, dw0, w1, dw1 = fused_warp_pair(i0, i1, v, interpret=True)
    assert _rel(w0r, w0) < 1e-5
    assert _rel(dw0r, dw0) < 1e-5
    assert _rel(w1r, w1) < 1e-5
    assert _rel(dw1r, dw1) < 1e-5


def test_fused_warp_source_reuse():
    """Prebuilt WarpSource gives identical results to on-the-fly arrays."""
    i0, i1, v = _warp_case(40, 80, "smooth", seed=3)
    s0, s1 = make_warp_source(i0), make_warp_source(i1)
    a = fused_warp_pair(s0, s1, v, interpret=True)
    b = fused_warp_pair(i0, i1, v, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0, rtol=0)


@pytest.mark.parametrize("kind", ["smooth", "wild"])
def test_fused_sample_matches_gather(kind):
    """General-coordinate fused sampler == XLA bilinear_sample (edge-clamp
    semantics), including the fallback path on budget-busting coords."""
    from videomorphing_tpu.ops.resample import bilinear_sample
    from videomorphing_tpu.pallas.warp import fused_sample

    h, w = 70, 300
    i0, i1, v = _warp_case(h, w, kind)
    g = grid_coords(h, w, jnp.float32)
    c0 = g - v
    c1 = g + 0.5 * v + 1.7
    s0, s1 = fused_sample([i0, i1], [c0, c1], interpret=True)
    assert _rel(bilinear_sample(i0, c0), s0) < 1e-5
    assert _rel(bilinear_sample(i1, c1), s1) < 1e-5


@pytest.mark.parametrize(
    "bands", [1, 4, 16, "map", "mixed", "mixed_cap", "mixed_cap_site"]
)
def test_fused_sample_band_count_invariant(bands, monkeypatch):
    """Dispatch granularity (VMORPH_FALLBACK_BANDS band count, the
    VMORPH_SAMPLE_DISPATCH=map per-tile-row path, or the round-5 mixed
    per-tile kernel+compact-gather path) never changes values: a
    mixed field (wild stripe inside smooth surroundings) must match the
    XLA gather at every granularity — finer dispatch routes less of the
    frame to the fallback but both paths are exact. ``mixed_cap`` pins
    the compact budget below the busted count, forcing the full-frame
    fallback branch of the mixed path."""
    from videomorphing_tpu.ops.resample import bilinear_sample
    from videomorphing_tpu.pallas.warp import fused_sample

    if bands == "map":
        monkeypatch.setenv("VMORPH_SAMPLE_DISPATCH", "map")
    elif bands == "mixed":
        monkeypatch.setenv("VMORPH_SAMPLE_DISPATCH", "mixed")
    elif bands == "mixed_cap":
        monkeypatch.setenv("VMORPH_SAMPLE_DISPATCH", "mixed")
        monkeypatch.setenv("VMORPH_MIXED_CAP", "0.03")
    elif bands == "mixed_cap_site":
        # the per-site override (round 5: the sampler default cap is
        # 0.3125 while the warp keeps 7/16) must behave identically
        monkeypatch.setenv("VMORPH_SAMPLE_DISPATCH", "mixed")
        monkeypatch.setenv("VMORPH_MIXED_CAP_SAMPLE", "0.03")
    else:
        monkeypatch.setenv("VMORPH_FALLBACK_BANDS", str(bands))
    h, w = 256, 160  # 4 sampler tile rows
    i0, _i1, v = _warp_case(h, w, "smooth", seed=7)
    rng = np.random.default_rng(8)
    v = np.array(v)  # writable copy (np.asarray of a jnp array is read-only)
    v[96:128] = 40 * rng.standard_normal((32, w, 2)).astype(np.float32)
    g = grid_coords(h, w, jnp.float32)
    coords = g + jnp.asarray(v)
    (out,) = fused_sample([i0], [coords], interpret=True)
    assert _rel(bilinear_sample(i0, coords), out) < 1e-5


@pytest.mark.parametrize("dispatch", ["band", "map", "mixed"])
@pytest.mark.parametrize("kind", ["smooth", "wild", "mixed"])
def test_fused_warp_dispatch_invariant(dispatch, kind, monkeypatch):
    """VMORPH_WARP_DISPATCH (unrolled bands, per-tile-row lax.map, or the
    round-5 mixed per-tile kernel+compact-gather path) never changes warp
    values: smooth (all-fast), wild (all-fallback / over-cap full-gather
    for mixed) and mixed (a wild stripe inside smooth surroundings — the
    realistic converged-field shape, round-4 diag_bands) all match the
    XLA gather exactly."""
    monkeypatch.setenv("VMORPH_WARP_DISPATCH", dispatch)
    h, w = 200, 160  # >1 warp tile row so the map path engages
    if kind == "mixed":
        i0, i1, v = _warp_case(h, w, "smooth", seed=9)
        rng = np.random.default_rng(10)
        v = np.array(v)
        v[64:128] = 25 * rng.standard_normal((64, w, 2)).astype(np.float32)
        v = jnp.asarray(v)
    else:
        i0, i1, v = _warp_case(h, w, kind, seed=9)
    g = grid_coords(h, w, jnp.float32)
    w0r, dw0r = bilinear_sample_with_grad(i0, g - v)
    w1r, dw1r = bilinear_sample_with_grad(i1, g + v)
    w0, dw0, w1, dw1 = fused_warp_pair(i0, i1, v, interpret=True)
    assert _rel(w0r, w0) < 1e-5
    assert _rel(dw0r, dw0) < 1e-5
    assert _rel(w1r, w1) < 1e-5
    assert _rel(dw1r, dw1) < 1e-5


def test_fused_sample_single_2ch():
    """n_imgs=1, C=2 variant (field sampling in the renderer)."""
    from videomorphing_tpu.ops.resample import bilinear_sample
    from videomorphing_tpu.pallas.warp import fused_sample

    h, w = 48, 64
    _i0, _i1, v = _warp_case(h, w, "smooth")
    g = grid_coords(h, w, jnp.float32)
    coords = g + 0.3 * v
    (out,) = fused_sample([v], [coords], interpret=True)
    assert _rel(bilinear_sample(v, coords), out) < 1e-5


def test_fused_sample_c4_channel_blocks():
    """C=4 runs in channel blocks (the conf-stacked render case)."""
    from videomorphing_tpu.ops.resample import bilinear_sample
    from videomorphing_tpu.pallas.warp import fused_sample

    h, w = 48, 64
    i0, i1, v = _warp_case(h, w, "smooth")
    i0c = jnp.concatenate([i0, i0[..., :1] * 0.5], -1)
    i1c = jnp.concatenate([i1, i1[..., :1] * 0.7], -1)
    g = grid_coords(h, w, jnp.float32)
    s0, s1 = fused_sample([i0c, i1c], [g - v, g + v], interpret=True)
    assert _rel(bilinear_sample(i0c, g - v), s0) < 1e-5
    assert _rel(bilinear_sample(i1c, g + v), s1) < 1e-5


def test_fused_warp_planes_layout():
    """fused_warp_planes == fused_warp_pair reshaped to plane order."""
    from videomorphing_tpu.pallas.warp import fused_warp_pair, fused_warp_planes

    h, w = 48, 64
    i0, i1, v = _warp_case(h, w, "smooth")
    w0, dw0, w1, dw1 = fused_warp_pair(i0, i1, v, interpret=True)
    planes = np.asarray(fused_warp_planes(i0, i1, v, interpret=True))
    C = 3
    for c in range(C):
        np.testing.assert_array_equal(planes[c], np.asarray(w0[..., c]))
        np.testing.assert_array_equal(planes[C + c], np.asarray(w1[..., c]))
        np.testing.assert_array_equal(planes[2 * C + 2 * c], np.asarray(dw0[..., c, 0]))
        np.testing.assert_array_equal(planes[2 * C + 2 * c + 1], np.asarray(dw0[..., c, 1]))
        np.testing.assert_array_equal(planes[4 * C + 2 * c], np.asarray(dw1[..., c, 0]))
        np.testing.assert_array_equal(planes[4 * C + 2 * c + 1], np.asarray(dw1[..., c, 1]))


@pytest.mark.parametrize("kind", ["smooth", "wild", "offedge"])
def test_warp_prescreen_output_invariant(kind):
    """``warp_prescreen`` changes DISPATCH only, never values: raw and
    packed warp planes are identical with the screen on and off. A tame
    band keeps the kernel path (or is conservatively screened to the
    bit-equivalent XLA fallback); a wild band reaches the same fallback
    with or without paying the per-tile prep first."""
    import dataclasses

    from videomorphing_tpu.pallas.warp import (
        fused_warp_planes,
        fused_warp_planes_packed,
        make_warp_source,
        packed_plane_geometry,
    )

    h, w = 130, 300
    i0, i1, v = _warp_case(h, w, "wild" if kind == "wild" else "smooth", seed=11)
    if kind == "offedge":
        v = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].set(60.5)
    s0, s1 = make_warp_source(i0), make_warp_source(i1)

    a = fused_warp_planes(s0, s1, v, interpret=True, prescreen=False)
    b = fused_warp_planes(s0, s1, v, interpret=True, prescreen=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p0 = MorphParams()
    p1 = dataclasses.replace(p0, warp_prescreen=True)
    assert packed_plane_geometry(p0, h, w) is not None
    pa = fused_warp_planes_packed(s0, s1, v, p0, interpret=True)
    pb = fused_warp_planes_packed(s0, s1, v, p1, interpret=True)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_warp_prescreen_single_row_band():
    """h = 65 makes the last row band a single pixel row; the screen's
    diffs are empty there and must be skipped, not reduced (jnp.max of a
    zero-size array raises — review finding)."""
    from videomorphing_tpu.pallas.warp import fused_warp_planes, make_warp_source

    i0, i1, v = _warp_case(65, 300, "smooth", seed=5)
    s0, s1 = make_warp_source(i0), make_warp_source(i1)
    a = fused_warp_planes(s0, s1, v, interpret=True, prescreen=False)
    b = fused_warp_planes(s0, s1, v, interpret=True, prescreen=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_variation_screen_classifies():
    """The shared screen passes near-constant displacements and rejects
    budget-busting noise (it is conservative: a False does not imply the
    exact ``fits`` would fail, but a True must never precede a fallback
    for variation reasons — verified implicitly by the sampler fast-path
    tests that rely on it)."""
    from videomorphing_tpu.pallas.warp import _variation_screen, D, DX, TH, TW

    h, w = 128, 512
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # gentle: total slope-bound well under the budget
    dy = jnp.asarray(0.002 * yy)
    dx = jnp.asarray(0.002 * xx)
    assert bool(_variation_screen(dy, dx, TH, TW, D, DX))
    wild = 30 * np.random.default_rng(0).standard_normal((h, w, 2)).astype(np.float32)
    assert not bool(
        _variation_screen(jnp.asarray(wild[..., 0]), jnp.asarray(wild[..., 1]), TH, TW, D, DX)
    )


@pytest.mark.parametrize("shift", [(20.0, 0.0), (0.0, 40.0), (-30.0, -90.0), (9.5, 130.5)])
def test_fused_sample_offframe_fast_path(shift):
    """Smooth maps running OFF-FRAME must stay on the Pallas fast path.

    The sources are edge-replicated by (MY, MX); a uniform shift pushes a
    border strip outside the image, which under the old hard [0, h-1] clamp
    made ``dev`` grow 1/row along the strip and busted every band touching a
    border (measured: the sampler never engaged on real morphs at 4K).
    Checks (a) exact clamp-semantics equivalence and (b) that the budget
    check actually passes, i.e. the off-frame map takes the kernel path.
    """
    from videomorphing_tpu.ops.resample import bilinear_sample
    from videomorphing_tpu.pallas.warp import (
        DX_SAMPLE, TH_S, TW_S, _cdiv, _prep_image, fused_sample,
    )

    h, w = 70, 300
    i0, i1, _v = _warp_case(h, w, "smooth")
    g = grid_coords(h, w, jnp.float32)
    dy, dx = shift
    smooth = 0.8 * jnp.sin(g[..., :1] / 37.0) + 0.6 * jnp.cos(g[..., 1:] / 53.0)
    c0 = g + jnp.asarray([dy, dx], jnp.float32) + jnp.concatenate([smooth, -smooth], -1)

    gy, gx = _cdiv(h, TH_S), _cdiv(w, TW_S)
    fits = _prep_image(
        c0[..., 0], c0[..., 1], h, w, gy, gx,
        dx_budget=DX_SAMPLE, th=TH_S, tw=TW_S,
    )[-1]
    if max(abs(dy), 0.0) <= 56 - 2 and abs(dx) <= 128 - 2:
        assert bool(fits), "off-frame smooth map should fit the residual budget"

    (out,) = fused_sample([i0], [c0], interpret=True)
    assert _rel(bilinear_sample(i0, c0), out) < 1e-5


def test_fused_warp_offframe_fast_path():
    """Halfway warps whose content moves off-frame keep the fast path and
    match the clamp-based gather exactly (field smooth, |v| ~ 25 px)."""
    from videomorphing_tpu.pallas.warp import _cdiv, _prep_image, fused_warp_pair, TH, TW

    h, w = 70, 300
    i0, i1, _ = _warp_case(h, w, "smooth")
    g = grid_coords(h, w, jnp.float32)
    v = jnp.stack(
        [12.0 + 0.5 * jnp.sin(g[..., 1] / 60.0), -25.0 + 0.4 * jnp.cos(g[..., 0] / 45.0)],
        -1,
    )
    gy, gx = _cdiv(h, TH), _cdiv(w, TW)
    c0 = g - v
    fits = _prep_image(c0[..., 0], c0[..., 1], h, w, gy, gx)[-1]
    assert bool(fits)

    w0r, dw0r = bilinear_sample_with_grad(i0, g - v)
    w1r, dw1r = bilinear_sample_with_grad(i1, g + v)
    w0, dw0, w1, dw1 = fused_warp_pair(i0, i1, v, interpret=True)
    assert _rel(w0r, w0) < 1e-5
    assert _rel(dw0r, dw0) < 1e-5
    assert _rel(w1r, w1) < 1e-5
    assert _rel(dw1r, dw1) < 1e-5


class TestBf16Pack:
    """``MorphParams.pack_dtype='bfloat16'``: the static pack stores bf16,
    all arithmetic stays f32 (upcast after DMA), per-call v planes stay f32.
    The result is a slightly perturbed — not restructured — computation."""

    def test_grad_close_to_f32(self):
        import dataclasses

        v, data = _case(96, 130, seed=2)
        p32 = MorphParams()
        p16 = dataclasses.replace(p32, pack_dtype="bfloat16")
        e32, g32, pc32 = fused_value_grad_precond(v, data, p32, interpret=True)
        from videomorphing_tpu.pallas.sweep import quantize_v_lin

        # evaluate the bf16 pack at ITS linearization point for a clean
        # apples-to-apples energy comparison
        vq = quantize_v_lin(v, p16)
        e16, g16, pc16 = fused_value_grad_precond(vq, data, p16, interpret=True)
        e32q, g32q, pc32q = fused_value_grad_precond(vq, data, p32, interpret=True)
        assert abs(float(e16) - float(e32q)) < 2e-2 * max(abs(float(e32q)), 1.0)
        # gradient direction must be preserved (cosine similarity)
        a, b = np.asarray(g16).ravel(), np.asarray(g32q).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.98, cos
        assert _rel(pc32q, pc16) < 5e-2

    def test_level_solver_converges_bf16(self):
        """Translation recovery still converges with the bf16 pack (the
        solver-level guarantee the perf knob must preserve)."""
        import dataclasses

        rng = np.random.default_rng(5)
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        tex = np.zeros((h, w), np.float32)
        for per in (9.0, 17.0, 31.0):
            tex += np.sin(2 * np.pi * xx / per + rng.uniform(0, 6)) * np.cos(
                2 * np.pi * yy / per + rng.uniform(0, 6)
            )
        tex = 0.5 + tex / 6.0
        img = np.stack([tex, 0.9 * tex, 0.8 * tex], -1)
        d = 1.5  # halfway shift: i0 at -d, i1 at +d -> v should converge to (0, d)

        def shift(img, dx):
            out = np.empty_like(img)
            xs = np.clip(xx + dx, 0, w - 1).astype(np.int32)
            out[:] = img[np.arange(h)[:, None], xs]
            return out

        # out(x) = img(x + dx); i0 = img(x - d), i1 = img(x + d), so the
        # halfway constraint img(p - v - d) = img(p + v + d) gives v_x = -d
        i0 = jnp.asarray(shift(img, -d))
        i1 = jnp.asarray(shift(img, +d))
        v0 = jnp.zeros((h, w, 2), jnp.float32)
        meds = {}
        for pd in ("float32", "bfloat16"):
            p = dataclasses.replace(
                MorphParams(), pack_dtype=pd, backend="pallas",
                pallas_min_pixels=0,
            )
            v_f, stats = make_level_solver(p, n_iters=60)(
                v0, make_level_data(i0, i1)
            )
            assert float(stats.e_final) < float(stats.e0)
            meds[pd] = float(np.median(np.asarray(v_f)[8:-8, 8:-8, 1]))
        # single-level solve moves well toward v_x = -d...
        assert meds["float32"] < -0.5, meds
        # ...and the bf16 pack tracks the f32 solver tightly
        assert abs(meds["bfloat16"] - meds["float32"]) < 0.05, meds


class TestSplitPack:
    """warp_into_pack mode: the warp kernel emits the sweep pack directly
    (pallas.warp.fused_warp_planes_packed) and the sweep kernels read the
    split warp/v_lin/const refs. Everything must match the combined-pack
    path exactly — same sampling math, different data routing."""

    H, W = 130, 300  # multi row/column tiles, gx = 2 column groups

    def _smooth_v(self, h, w, scale=1.0):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        return jnp.asarray(
            scale * np.stack([1.5 * np.sin(yy / 40), 2 * np.cos(xx / 50)], -1)
        )

    @pytest.mark.parametrize("kind", ["smooth", "wild", "offedge"])
    def test_packed_warp_planes_match_combined_pack(self, kind):
        """x_warp == combined pack's first 6C planes (kernel AND fallback
        bands), zeros in the extra tail rows.

        ``offedge``: content displaced ~60 px past the top edge passes the
        residual budget yet used to land a NEGATIVE DMA row offset in the
        packed layout (row_start = -8 — the packed top halo breaks the
        OFFY margin proof's row_in = 0 assumption); such bands must route
        to the XLA fallback (round-2 review finding)."""
        from videomorphing_tpu.pallas.sweep import make_sweep_pack_planes
        from videomorphing_tpu.pallas.warp import (
            fused_warp_planes,
            fused_warp_planes_packed,
            make_warp_source,
            packed_plane_geometry,
        )

        h, w = self.H, self.W
        v, data = _case(h, w, seed=7)
        if kind == "smooth":
            v = self._smooth_v(h, w)
        elif kind == "offedge":
            v = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].set(60.5)
        else:
            v = 30.0 * v  # busts the residual budget -> XLA fallback bands
        p = MorphParams()
        geom = packed_plane_geometry(p, h, w)
        assert geom is not None
        halo, th, tw, gy, gx, rows, cols = geom
        s0, s1 = make_warp_source(data.i0), make_warp_source(data.i1)
        x_comb = make_sweep_pack_planes(
            fused_warp_planes(s0, s1, v, interpret=True), v, data, p
        )
        x_warp = fused_warp_planes_packed(s0, s1, v, p, interpret=True)
        assert x_warp.shape == (18, rows, cols)
        np.testing.assert_allclose(
            np.asarray(x_warp[:, : gy * th + 2 * halo]),
            np.asarray(x_comb[:18]),
            rtol=0, atol=1e-6,
        )
        tail = np.asarray(x_warp[:, gy * th + 2 * halo :])
        assert tail.size == 0 or np.abs(tail).max() == 0.0

    def test_split_grad_energy_match_combined_and_oracle(self):
        from videomorphing_tpu.pallas.sweep import (
            fused_total_energy_pack,
            fused_total_energy_split,
            fused_value_grad_precond_pack,
            fused_value_grad_precond_split,
            make_const_pack,
            make_sweep_pack_planes,
            pack_v,
        )
        from videomorphing_tpu.pallas.warp import (
            fused_warp_planes,
            fused_warp_planes_packed,
            make_warp_source,
        )

        h, w = self.H, self.W
        _v, data = _case(h, w, seed=9)
        v_lin = self._smooth_v(h, w)
        # evaluate AWAY from the linearization point: exercises the in-VMEM
        # dv correction against both twins
        v = v_lin + 0.3 * self._smooth_v(h, w)[::-1]
        p = MorphParams()
        s0, s1 = make_warp_source(data.i0), make_warp_source(data.i1)

        x_comb = make_sweep_pack_planes(
            fused_warp_planes(s0, s1, v_lin, interpret=True), v_lin, data, p
        )
        x_warp = fused_warp_planes_packed(s0, s1, v_lin, p, interpret=True)
        x_vlin = pack_v(v_lin, p)
        x_const = make_const_pack(data, p)

        e1, g1, pc1 = fused_value_grad_precond_pack(
            x_comb, v, (h, w), 3, p, interpret=True
        )
        e2, g2, pc2 = fused_value_grad_precond_split(
            x_warp, x_vlin, x_const, v, (h, w), 3, p, interpret=True
        )
        assert _rel(e1, e2) < 1e-6
        assert _rel(g1, g2) < 1e-6
        assert _rel(pc1, pc2) < 1e-6

        et1 = fused_total_energy_pack(x_comb, v, (h, w), 3, p, interpret=True)
        et2 = fused_total_energy_split(
            x_warp, x_vlin, x_const, v, (h, w), 3, p, interpret=True
        )
        assert _rel(et1, et2) < 1e-6

        # against the jnp oracle at the linearization point itself
        e_ref, g_ref, pc_ref = energy_value_grad_precond(v_lin, data, MorphParams())
        e3, g3, pc3 = fused_value_grad_precond_split(
            x_warp, x_vlin, x_const, v_lin, (h, w), 3, p, interpret=True
        )
        assert _rel(e_ref, e3) < 1e-5
        assert _rel(g_ref, g3) < 1e-5
        assert _rel(pc_ref, pc3) < 1e-5

    def test_level_solver_split_matches_combined(self):
        """Identical solve trajectory with warp_into_pack on and off."""
        rng = np.random.default_rng(13)
        # w >= 249 so gx > 1 and the packed geometry actually ENGAGES —
        # at the old (64, 130) packed_plane_geometry returned None and this
        # test compared the combined path against itself (round-2 review)
        h, w = 64, 260
        from videomorphing_tpu.pallas.warp import packed_plane_geometry

        assert packed_plane_geometry(MorphParams(), h, w) is not None
        base = rng.random((h + 8, w + 8, 3), dtype=np.float32)
        for _ in range(3):
            base = 0.25 * (
                np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1)
            )
        i0 = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
        i1 = jnp.asarray(base[4 : 4 + h, 2 : 2 + w])
        data = make_level_data(i0, i1)
        v0 = jnp.zeros((h, w, 2), jnp.float32)

        p_comb = MorphParams(backend="pallas", relin_every=4)
        p_split = MorphParams(backend="pallas", relin_every=4, warp_into_pack=True)
        v_c, st_c = make_level_solver(p_comb, 10)(v0, data)
        v_s, st_s = make_level_solver(p_split, 10)(v0, data)
        assert _rel(v_c, v_s) < 1e-5
        assert _rel(st_c.e_final, st_s.e_final) < 1e-6

    def test_geometry_gate(self):
        """Small frames fall back: packed_plane_geometry returns None and
        the solver must still work with warp_into_pack=True."""
        from videomorphing_tpu.pallas.warp import packed_plane_geometry

        p = MorphParams()
        assert packed_plane_geometry(p, 40, 64) is None  # gx == 1
        v, data = _case(40, 64, seed=3)
        ps = MorphParams(backend="pallas", warp_into_pack=True)
        v_f, _st = make_level_solver(ps, 4)(v * 0.1, data)
        assert np.isfinite(np.asarray(v_f)).all()
