"""--set override parsing: boolean spellings and type coercion.

Round-2 review caught a silent trap: json.loads rejects "False"/"no"/"off",
the raw string fell through, and ``bool("False") == True`` — an A/B run
"disabling" a knob silently benchmarked two identical configs. These tests
pin the fixed behavior: common bool spellings parse, everything else for a
bool field is an error, ints reject fractional/junk values.
"""

import pytest

from videomorphing_tpu.cli import _apply_set_overrides
from videomorphing_tpu.config import MorphParams, SynthParams, VideoParams


def _apply(items):
    return _apply_set_overrides(items, MorphParams(), SynthParams(), VideoParams())


def test_bool_spellings_parse():
    mp, _, vp = _apply(["morph.fused_warp=False", "video.propagate=no"])
    assert mp.fused_warp is False
    assert vp.propagate is False
    mp, _, vp = _apply(["morph.fused_warp=true", "video.propagate=ON"])
    assert mp.fused_warp is True
    assert vp.propagate is True


@pytest.mark.parametrize(
    "item",
    [
        "morph.fused_warp=maybe",  # not a boolean spelling
        "morph.iters_fine=3.5",    # fractional for an int field
        "morph.iters_fine=abc",    # junk for an int field
        "morph.lambda_tps=abc",    # junk for a float field
    ],
)
def test_bad_values_rejected(item):
    with pytest.raises(SystemExit):
        _apply([item])


def test_numbers_and_strings_still_work():
    mp, sp, _ = _apply(
        ["morph.iters_fine=40", "morph.lambda_tps=0.02", "synth.sampling=bicubic"]
    )
    assert mp.iters_fine == 40 and isinstance(mp.iters_fine, int)
    assert mp.lambda_tps == pytest.approx(0.02)
    assert sp.sampling == "bicubic"
    # integral float coerces to int (json parses 40.0 as float)
    mp, _, _ = _apply(["morph.iters_fine=40.0"])
    assert mp.iters_fine == 40 and isinstance(mp.iters_fine, int)


def test_unknown_section_and_field_rejected():
    with pytest.raises(SystemExit):
        _apply(["nope.x=1"])
    with pytest.raises(SystemExit):
        _apply(["morph.not_a_field=1"])
